"""Localization-only mode: frozen map, VO fallback, calibration hot-swap.

Reference behavior under test: System::ActivateLocalizationMode stops mapping
(src/System.cc:147-172), Tracking's mbOnlyTracking branch keeps estimating
poses without inserting keyframes (src/Tracking.cc:381-441), temporal VO
points carry the pose through weakly-mapped regions (UpdateLastFrame :893),
and ChangeCalibration hot-swaps intrinsics (src/Tracking.cc:1735).
"""

import numpy as np
import pytest

from orbslam2commentedbyxcm_tpu.models.system import System, Sensor
from orbslam2commentedbyxcm_tpu.models.tracking import TrackingConfig
from orbslam2commentedbyxcm_tpu.utils.camera import Camera
from orbslam2commentedbyxcm_tpu.utils.evaluation import ate_rmse, positions_from_tcw
from orbslam2commentedbyxcm_tpu.utils.synth import SyntheticSequence

pytestmark = pytest.mark.slow  # system-level: excluded from -m quick

N_MAP = 14      # frames used to build the map
N_LOC = 10      # extra frames tracked in localization-only mode


@pytest.fixture(scope="module", autouse=True)
def _fresh_compiler_state():
    import jax

    jax.clear_caches()
    from orbslam2commentedbyxcm_tpu.ops.orb import ORBExtractor

    ORBExtractor._jit_cache.clear()
    yield


def small_camera():
    return Camera(fx=250.0, fy=250.0, cx=160.0, cy=120.0, width=320, height=240,
                  bf=25.0, th_depth=40.0)


@pytest.fixture(scope="module")
def loc_run():
    cam = small_camera()
    seq = SyntheticSequence(camera=cam, n_frames=N_MAP, trajectory="sideways")
    cfg = TrackingConfig(n_features=600, max_frames_between_kf=6)
    system = System(cam, Sensor.RGBD, config=cfg, enable_loop_closing=False)
    for i in range(N_MAP):
        system.track_rgbd(seq.render(i), seq.depth_map(i), i / 30.0)

    system.activate_localization_mode()
    frozen_points = system.map.n_valid_points()
    frozen_kfs = len(system.map.good_keyframes())

    # pose(i) extrapolates beyond n_frames: the camera keeps moving sideways
    # through a region with thinning map coverage
    results = []
    for i in range(N_MAP, N_MAP + N_LOC):
        results.append(system.track_rgbd(seq.render(i), seq.depth_map(i), i / 30.0))
    return seq, system, results, frozen_points, frozen_kfs


def test_map_is_frozen(loc_run):
    _, system, _, frozen_points, frozen_kfs = loc_run
    assert len(system.map.good_keyframes()) == frozen_kfs
    # localization must not create map points (temporal VO points are
    # per-frame only and never enter the map)
    assert system.map.n_valid_points() <= frozen_points


def test_tracks_through_localization_mode(loc_run):
    seq, _, results, _, _ = loc_run
    tracked = [i for i, p in enumerate(results) if p is not None]
    assert len(tracked) >= N_LOC - 2, f"tracked {len(tracked)}/{N_LOC}"
    est = np.stack([results[i] for i in tracked])
    gt = np.stack([seq.pose(N_MAP + i) for i in tracked])
    ate = ate_rmse(positions_from_tcw(est), positions_from_tcw(gt), with_scale=False)
    assert ate < 0.15, f"ATE RMSE {ate:.4f} m in localization mode"


def test_vo_fallback_engages_when_map_coverage_dies(loc_run):
    """Force the VO path: drop all real map matches by clearing the last
    frame's associations, then track one more frame — the pose must survive
    on temporal depth points alone and vo_mode must engage."""
    seq, system, _, _, _ = loc_run
    tr = system.tracking
    lf = tr.last_frame
    assert lf is not None
    lf.map_pt[:] = -1  # no map anchors left: only temporal VO points remain
    i = N_MAP + N_LOC
    pose = system.track_rgbd(seq.render(i), seq.depth_map(i), i / 30.0)
    assert pose is not None, "VO fallback failed to carry the pose"
    assert tr.vo_mode, "vo_mode should engage with zero real map matches"
    err = np.linalg.norm(np.linalg.inv(pose)[:3, 3] - np.linalg.inv(seq.pose(i))[:3, 3])
    assert err < 0.3, f"VO pose error {err:.3f} m"


def test_deactivate_resumes_mapping(loc_run):
    seq, system, _, _, frozen_kfs = loc_run
    system.deactivate_localization_mode()
    assert not system.tracking.vo_mode
    n0 = len(system.map.good_keyframes())
    start = N_MAP + N_LOC + 1
    for i in range(start, start + 8):
        system.track_rgbd(seq.render(i), seq.depth_map(i), i / 30.0)
    assert len(system.map.good_keyframes()) > n0, "mapping did not resume"


def test_change_calibration_swaps_consumers():
    cam = small_camera()
    system = System(cam, Sensor.RGBD, config=TrackingConfig(n_features=200),
                    enable_loop_closing=False)
    cam2 = Camera(fx=260.0, fy=260.0, cx=159.0, cy=121.0, width=320, height=240,
                  bf=26.0, th_depth=40.0)
    system.change_calibration(cam2)
    assert system.tracking.camera is cam2
    assert system.local_mapping.camera is cam2
    assert system.tracking.velocity is None
