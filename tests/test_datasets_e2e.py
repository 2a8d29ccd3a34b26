"""End-to-end dataset path: synthetic sequences materialized to disk in the
three on-disk formats, then run through `examples/run_dataset.py` — the real
CLI, the real loaders, the real Prefetcher — with ATE gates (VERDICT r4
Missing #1; reference workflows /root/reference/README.md:101-173).

The EuRoC fixture renders RAW frames through a distorted, derotated stereo
rig and ships LEFT.*/RIGHT.* K/D/R/P in its settings: the run only works
because the loader rectifies (the reference's stereo_euroc contract,
README.md:207)."""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

from orbslam2commentedbyxcm_tpu.utils import dataset_writers
from orbslam2commentedbyxcm_tpu.utils.camera import Camera
from orbslam2commentedbyxcm_tpu.utils.synth import BoxSequence

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_FRAMES = 90


def _camera(bf=80.0):
    # bf chosen so ThDepth * b (~10.8 m) actually covers the box scene's
    # 6-10 m wall distances — otherwise the stereo/RGB-D close-point
    # keyframe pressure (c1c, src/Tracking.cc:1119-1134) can never fire,
    # exactly like a miscalibrated ThDepth on a real rig
    return Camera(fx=260.0, fy=260.0, cx=160.0, cy=120.0, width=320,
                  height=240, bf=bf, fps=30.0)


def _run_example(args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=1").strip()
    env.setdefault("JAX_TEST_CACHE", "/tmp/orbslam2_tpu_jax_cache")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "run_dataset.py"),
         *args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    return out.stdout


def _ate_cm(stdout: str) -> float:
    m = re.search(r"ATE RMSE: ([0-9.]+) cm", stdout)
    assert m, "no ATE printed:\n" + stdout[-2000:]
    return float(m.group(1))


def _tracked(stdout: str):
    m = re.search(r"tracked (\d+)/(\d+) frames", stdout)
    assert m, stdout[-2000:]
    return int(m.group(1)), int(m.group(2))


def test_tum_rgbd_on_disk(tmp_path):
    seq = BoxSequence(camera=_camera(), n_frames=N_FRAMES, seed=11, turns=0.35)
    settings = dataset_writers.write_tum_rgbd(str(tmp_path), seq, N_FRAMES)
    out = _run_example(
        ["tum", str(tmp_path), settings, "--out-prefix", str(tmp_path) + "/"]
    )
    tracked, total = _tracked(out)
    assert tracked >= total - 2, out[-1500:]
    assert _ate_cm(out) < 8.0, out[-1500:]
    # the trajectory writers produced real files in TUM format
    traj = np.loadtxt(str(tmp_path) + "/CameraTrajectory.txt")
    assert traj.shape[1] == 8 and len(traj) >= tracked - 5


def test_kitti_stereo_on_disk(tmp_path):
    seq = BoxSequence(camera=_camera(), n_frames=N_FRAMES, seed=12,
                      trajectory="line")
    settings = dataset_writers.write_kitti(str(tmp_path), seq, N_FRAMES)
    out = _run_example(["kitti", str(tmp_path), "00", settings])
    tracked, total = _tracked(out)
    assert tracked >= total - 2, out[-1500:]
    # measured 8.1 cm over the ~11 m corridor (0.7% drift, the reference's
    # stereo class); gate at 2x measured
    assert _ate_cm(out) < 16.0, out[-1500:]


def test_euroc_unrectified_stereo_on_disk(tmp_path):
    """Raw DISTORTED + DEROTATED stereo input: only works through the
    rectification path (LEFT.*/RIGHT.* -> StereoRectifier in the loader)."""
    seq = BoxSequence(camera=_camera(), n_frames=N_FRAMES, seed=13, turns=0.3)
    settings = dataset_writers.write_euroc(str(tmp_path), seq, N_FRAMES,
                                           distorted=True)
    out = _run_example(["euroc", str(tmp_path), settings])
    assert "rectification maps built" in out
    tracked, total = _tracked(out)
    assert tracked >= total - 2, out[-1500:]
    # measured 13.8-14.1 cm: the fixture's frames are bilinearly resampled
    # TWICE (ideal render -> distorted raw -> rectified), which blunts the
    # stereo subpixel refinement relative to the clean TUM/KITTI fixtures;
    # gate at ~1.5x measured to catch real rectification regressions
    assert _ate_cm(out) < 20.0, out[-1500:]


def test_euroc_raw_frames_are_genuinely_unrectified(tmp_path):
    """Fixture sanity: the written cam0/cam1 frames must NOT be row-aligned
    until rectified (otherwise the test above proves nothing)."""
    from orbslam2commentedbyxcm_tpu.utils.config import load_settings
    from orbslam2commentedbyxcm_tpu.utils.datasets import EurocDataset
    from orbslam2commentedbyxcm_tpu.utils.rectify import StereoRectifier

    n = 12
    seq = BoxSequence(camera=_camera(), n_frames=n, seed=14, turns=0.1)
    settings = dataset_writers.write_euroc(str(tmp_path), seq, n,
                                           distorted=True)
    cam, cfg, raw = load_settings(settings)
    rect = StereoRectifier.from_settings(raw)
    raw_ds = EurocDataset(str(tmp_path))
    rect_ds = EurocDataset(str(tmp_path), rectifier=rect)
    _, raw_l, _ = raw_ds[4]
    _, rect_l, _ = rect_ds[4]
    ideal = seq.render(4)
    # center crop away border effects
    sl = (slice(60, 180), slice(80, 240))
    raw_err = np.abs(raw_l[sl] - ideal[sl]).mean()
    rect_err = np.abs(rect_l[sl] - ideal[sl]).mean()
    # raw frames are visibly warped; rectified frames recover the ideal view
    assert raw_err > 4.0 * max(rect_err, 1e-6), (raw_err, rect_err)
    assert rect_err < 6.0, rect_err
