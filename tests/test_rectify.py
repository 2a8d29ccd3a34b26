"""Rectification maps vs the cv2 oracle + settings-block parsing."""

import numpy as np
import pytest

from orbslam2commentedbyxcm_tpu.utils.rectify import (
    StereoRectifier,
    build_undistort_rectify_map,
    distort_normalized,
    remap_bilinear,
    undistort_normalized,
)

cv2 = pytest.importorskip("cv2")


K = np.array([[458.654, 0.0, 367.215], [0.0, 457.296, 248.375], [0, 0, 1.0]])
D = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0])
R = cv2.Rodrigues(np.array([0.01, -0.02, 0.005]))[0]
P = np.array([[435.2, 0, 367.45, 0], [0, 435.2, 252.2, 0], [0, 0, 1, 0.0]])
SIZE = (188, 120)  # small for speed; same math as 752x480


def test_maps_match_cv2():
    mx, my = build_undistort_rectify_map(K, D, R, P, SIZE)
    cx, cy = cv2.initUndistortRectifyMap(K, D, R, P, SIZE, cv2.CV_32FC1)
    assert np.allclose(mx, cx, atol=2e-3)
    assert np.allclose(my, cy, atol=2e-3)


def test_remap_matches_cv2():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (120, 188)).astype(np.float32)
    mx, my = build_undistort_rectify_map(K, D, R, P, SIZE)
    ours = remap_bilinear(img, mx, my)
    ref = cv2.remap(img, mx, my, cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_CONSTANT, borderValue=0.0)
    # identical except at border pixels where cv2 blends with the constant
    interior = (mx >= 1) & (mx < 187) & (my >= 1) & (my < 119)
    assert np.allclose(ours[interior], ref[interior], atol=0.51)


def test_distort_roundtrip():
    rng = np.random.default_rng(1)
    xy = rng.uniform(-0.5, 0.5, (500, 2))
    back = undistort_normalized(distort_normalized(xy, D), D)
    assert np.allclose(back, xy, atol=1e-6)


def test_rectifier_from_settings(tmp_path):
    from orbslam2commentedbyxcm_tpu.utils.config import parse_opencv_yaml

    path = tmp_path / "s.yaml"

    def block(key, arr):
        arr = np.atleast_2d(arr)
        data = ", ".join(str(v) for v in arr.ravel())
        return (f"{key}: !!opencv-matrix\n   rows: {arr.shape[0]}\n"
                f"   cols: {arr.shape[1]}\n   dt: d\n   data: [{data}]\n")

    txt = "%YAML:1.0\nLEFT.width: 188\nLEFT.height: 120\n"
    txt += "RIGHT.width: 188\nRIGHT.height: 120\n"
    for side in ("LEFT", "RIGHT"):
        txt += block(f"{side}.K", K) + block(f"{side}.D", D.reshape(1, 5))
        txt += block(f"{side}.R", R) + block(f"{side}.P", P)
    path.write_text(txt)
    raw = parse_opencv_yaml(str(path))
    assert raw["LEFT.K"].shape == (3, 3)
    assert np.allclose(raw["LEFT.K"], K)
    assert raw["LEFT.P"].shape == (3, 4)
    rect = StereoRectifier.from_settings(raw)
    assert rect is not None and rect.map_lx.shape == (120, 188)

    # absent block -> None (plain mono settings files keep working)
    assert StereoRectifier.from_settings({"Camera.fx": 400.0}) is None


def test_shipped_euroc_yaml_builds_rectifier():
    import os

    from orbslam2commentedbyxcm_tpu.utils.config import load_settings

    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "settings", "EuRoC.yaml")
    cam, cfg, raw = load_settings(path)
    rect = StereoRectifier.from_settings(raw)
    assert rect is not None
    assert rect.map_lx.shape == (480, 752)
    # rectified projection must match Camera.*: P[0,0] == Camera.fx
    assert np.isclose(raw["LEFT.P"][0, 0], cam.fx)
    assert np.isclose(-raw["RIGHT.P"][0, 3], cam.bf)
