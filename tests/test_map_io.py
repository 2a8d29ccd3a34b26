"""Map checkpoint/restore: save a mapped session, reload, relocalize, track."""

import numpy as np

from orbslam2commentedbyxcm_tpu.models.system import System, Sensor
from orbslam2commentedbyxcm_tpu.models.tracking import TrackingConfig, TrackingState
from orbslam2commentedbyxcm_tpu.utils.camera import Camera
from orbslam2commentedbyxcm_tpu.utils.synth import SyntheticSequence
import pytest

pytestmark = pytest.mark.slow  # system-level: excluded from -m quick


def test_save_load_relocalize(tmp_path):
    cam = Camera(fx=250.0, fy=250.0, cx=160.0, cy=120.0, width=320, height=240, bf=20.0)
    seq = SyntheticSequence(camera=cam, n_frames=25, trajectory="sideways")
    cfg = TrackingConfig(n_features=600, max_frames_between_kf=4, kf_tracked_ratio=0.95)

    s1 = System(cam, Sensor.RGBD, config=cfg, enable_loop_closing=False)
    for i in range(25):
        s1.track_rgbd(seq.render(i), seq.depth_map(i), i / 30.0)
    n_pts = s1.map.n_valid_points()
    n_kfs = len(s1.map.good_keyframes())
    assert n_pts > 200 and s1.vocabulary is not None
    path = str(tmp_path / "map.npz")
    s1.save_map(path)

    # fresh system, localization-only against the loaded map
    s2 = System(cam, Sensor.RGBD, config=cfg, enable_loop_closing=False)
    s2.load_map(path)
    assert s2.map.n_valid_points() == n_pts
    assert len(s2.map.good_keyframes()) == n_kfs
    assert s2.get_tracking_state() == TrackingState.LOST
    # covisibility was rebuilt
    assert any(kf.covis for kf in s2.map.good_keyframes())

    s2.activate_localization_mode()
    poses = []
    for i in (10, 11, 12):
        poses.append(s2.track_rgbd(seq.render(i), seq.depth_map(i), 100.0 + i))
    assert poses[-1] is not None, "failed to relocalize against loaded map"
    # pose agrees with ground truth (same map frame since RGB-D = true scale,
    # anchored at frame-0 identity)
    err = np.linalg.norm(poses[-1][:3, 3] - seq.pose(12)[:3, 3])
    assert err < 0.2, f"position error {err:.3f} m after relocalization"
    # map must not have grown in localization mode
    assert s2.map.n_valid_points() == n_pts
