"""End-to-end monocular SLAM on a synthetic sequence with exact ground truth.

This is the integration gate the reference ecosystem gets from TUM/KITTI runs
(SURVEY.md §4): track a rendered sequence, require high tracked-frame coverage
and a low ATE RMSE after Sim3 alignment.
"""

import numpy as np
import pytest

from orbslam2commentedbyxcm_tpu.models.system import System, Sensor
from orbslam2commentedbyxcm_tpu.models.tracking import TrackingConfig
from orbslam2commentedbyxcm_tpu.utils.camera import Camera
from orbslam2commentedbyxcm_tpu.utils.evaluation import ate_rmse, positions_from_tcw, rpe
from orbslam2commentedbyxcm_tpu.utils.synth import SyntheticSequence

pytestmark = pytest.mark.slow  # system-level: excluded from -m quick


def small_camera():
    return Camera(fx=250.0, fy=250.0, cx=160.0, cy=120.0, width=320, height=240, bf=20.0)


@pytest.fixture(scope="module")
def mono_run():
    cam = small_camera()
    seq = SyntheticSequence(camera=cam, n_frames=30, trajectory="sideways")
    cfg = TrackingConfig(n_features=600, max_frames_between_kf=8, kf_tracked_ratio=0.95)
    system = System(cam, Sensor.MONOCULAR, config=cfg, enable_loop_closing=False)
    results = []
    for i in range(seq.n_frames):
        pose = system.track_monocular(seq.render(i), i / 30.0)
        results.append(pose)
    return seq, system, results


def test_mono_tracks_most_frames(mono_run):
    seq, system, results = mono_run
    tracked = [p for p in results if p is not None]
    # monocular init needs baseline; allow up to 10 frames of warm-up
    assert len(tracked) >= seq.n_frames - 10, f"tracked only {len(tracked)}/{seq.n_frames}"


def test_mono_ate(mono_run):
    seq, system, results = mono_run
    idx = [i for i, p in enumerate(results) if p is not None]
    est = np.stack([results[i] for i in idx])
    gt = np.stack([seq.pose(i) for i in idx])
    ate = ate_rmse(positions_from_tcw(est), positions_from_tcw(gt))
    # ~2m trajectory at 320x240 (half-res test camera): scale drift without
    # measured ~3cm at this config (r3); gate tight enough to catch a 2x
    # accuracy regression while keeping seed/CPU headroom
    assert ate < 0.07, f"ATE RMSE {ate:.4f} m"


def test_mono_map_grows(mono_run):
    seq, system, results = mono_run
    assert len(system.map.good_keyframes()) >= 2
    assert system.map.n_valid_points() > 100


def test_mono_trajectory_io(tmp_path, mono_run):
    seq, system, results = mono_run
    tum = tmp_path / "traj_tum.txt"
    kitti = tmp_path / "traj_kitti.txt"
    kf = tmp_path / "kf_tum.txt"
    system.save_trajectory_tum(str(tum))
    system.save_trajectory_kitti(str(kitti))
    system.save_keyframe_trajectory_tum(str(kf))
    rows = np.loadtxt(tum)
    assert rows.shape[1] == 8
    # quaternions are unit
    np.testing.assert_allclose(np.linalg.norm(rows[:, 4:], axis=1), 1.0, atol=1e-5)
    krows = np.loadtxt(kitti)
    assert krows.shape[1] == 12
    assert np.loadtxt(kf).shape[1] == 8


def test_mono_localization_mode(mono_run):
    seq, system, results = mono_run
    n_pts = system.map.n_valid_points()
    n_kfs = len(system.map.good_keyframes())
    system.activate_localization_mode()
    pose = system.track_monocular(seq.render(seq.n_frames - 1), 99.0)
    # map must not grow in localization-only mode
    assert system.map.n_valid_points() == n_pts
    assert len(system.map.good_keyframes()) == n_kfs
    system.deactivate_localization_mode()


def test_auto_reset_when_lost_young(mono_run):
    """Lost with a young map (<=5 KFs) triggers a full system reset
    (reference src/Tracking.cc:518-525)."""
    cam = small_camera()
    seq = SyntheticSequence(camera=cam, n_frames=30, trajectory="sideways")
    cfg = TrackingConfig(n_features=600, max_frames_between_kf=100, kf_tracked_ratio=0.5)
    system = System(cam, Sensor.MONOCULAR, config=cfg, enable_loop_closing=False)
    for i in range(16):
        system.track_monocular(seq.render(i), i / 30.0)
        if len(system.map.good_keyframes()) >= 2:
            break
    assert 0 < len(system.map.good_keyframes()) <= 5
    # featureless frame: tracking must fail and, with a young map, auto-reset
    rng = np.random.default_rng(0)
    blank = np.full((cam.height, cam.width), 128.0, np.float32)
    blank += rng.uniform(-1, 1, blank.shape)  # no corners
    system.track_monocular(blank, 90.0)
    assert len(system.map.good_keyframes()) == 0
    assert system.map.n_valid_points() == 0
