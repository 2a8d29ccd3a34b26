"""Transient abortable GBA + interruptible local BA (reference
src/LoopClosing.cc:634/:460-473/:709-815 and LocalMapping mbAbortBA)."""

import numpy as np
import pytest

from orbslam2commentedbyxcm_tpu.models.gba import GlobalBA
from orbslam2commentedbyxcm_tpu.models.system import Sensor, System
from orbslam2commentedbyxcm_tpu.models.tracking import TrackingConfig
from orbslam2commentedbyxcm_tpu.utils.camera import Camera
from orbslam2commentedbyxcm_tpu.utils.synth import BoxSequence

pytestmark = pytest.mark.slow  # system-level: excluded from -m quick


@pytest.fixture(scope="module")
def mapped_system():
    cam = Camera(fx=250.0, fy=250.0, cx=160.0, cy=120.0, width=320, height=240,
                 bf=20.0, th_depth=50.0)
    seq = BoxSequence(camera=cam, n_frames=40, turns=0.4)
    cfg = TrackingConfig(n_features=600, max_frames_between_kf=4,
                         kf_tracked_ratio=0.95, motion_search_radius=20.0)
    system = System(cam, Sensor.RGBD, config=cfg, enable_loop_closing=False)
    for i in range(seq.n_frames):
        system.track_rgbd(seq.render(i), seq.depth_map(i), i / 30.0)
    return system


def _perturb(system, scale=0.02, seed=3):
    rng = np.random.default_rng(seed)
    ref = {}
    for kf in system.map.good_keyframes():
        ref[kf.kf_id] = kf.t_cw.copy()
        if kf.kf_id == system.map.origin_kf_id:
            continue
        t = kf.t_cw.copy()
        t[:3, 3] += rng.normal(0, scale, 3).astype(np.float32)
        kf.set_pose(t)
    return ref


def _pose_err(system, ref):
    errs = [
        np.linalg.norm(kf.t_cw[:3, 3] - ref[kf.kf_id][:3, 3])
        for kf in system.map.good_keyframes() if kf.kf_id in ref
    ]
    return float(np.mean(errs))


def test_gba_runs_on_worker_and_improves(mapped_system):
    system = mapped_system
    ref = _perturb(system, scale=0.02, seed=3)
    before = _pose_err(system, ref)
    gba = GlobalBA(system.map, system.camera, system.map_lock)
    gba.launch(loop_kf_id=0)
    assert gba.running() or gba.n_completed == 1  # ran asynchronously
    gba.wait()
    assert gba.n_completed == 1
    after = _pose_err(system, ref)
    assert after < before * 0.5, f"GBA did not pull poses back: {before:.4f} -> {after:.4f}"


def test_gba_abort_discards_results(mapped_system):
    system = mapped_system
    ref = _perturb(system, scale=0.01, seed=4)
    snapshot = {kf.kf_id: kf.t_cw.copy() for kf in system.map.good_keyframes()}
    gba = GlobalBA(system.map, system.camera, system.map_lock)
    # hold the map lock so write-back cannot land before the abort
    with system.map_lock:
        gba.launch(loop_kf_id=0)
        gba.abort()
    assert gba.n_completed == 0 and gba.n_aborted == 1
    for kf in system.map.good_keyframes():
        np.testing.assert_array_equal(kf.t_cw, snapshot[kf.kf_id])
    # restore for other tests
    for kf in system.map.good_keyframes():
        kf.set_pose(ref[kf.kf_id])


def test_gba_propagates_to_new_keyframes(mapped_system):
    """A keyframe 'created during GBA' (absent from the snapshot) inherits the
    correction through its spanning-tree parent (reference :745-775)."""
    system = mapped_system
    m = system.map
    from orbslam2commentedbyxcm_tpu.models.local_mapping import assemble_ba_problem

    kf_ids = [k.kf_id for k in m.good_keyframes()]
    problem = assemble_ba_problem(m, kf_ids, fixed_ids={m.origin_kf_id})
    gba = GlobalBA(m, system.camera, system.map_lock)

    # fabricate a solved result that shifts every pose by +0.1 in x
    class Res:
        pass

    res = Res()
    poses = problem["poses"].copy()
    shift = np.eye(4, dtype=np.float32)
    shift[0, 3] = 0.1
    for kf_id, s in problem["kf_slot"].items():
        poses[s] = shift @ poses[s]
    res.poses = poses
    res.points = problem["points"]
    res.obs_inliers = problem["omask"]

    # a "new" keyframe parented to the last solved one, absent from kf_slot
    parent = max(kf_ids)
    child = m.keyframes[parent]
    new_kf_pose = child.t_cw.copy()
    fake = type(child).__new__(type(child))
    fake.__dict__.update(child.__dict__)
    fake.kf_id = m.next_kf_id
    fake.parent = parent
    fake.bad = False
    fake.t_cw = new_kf_pose.copy()
    fake.children = set()
    m.keyframes[fake.kf_id] = fake
    m.next_kf_id += 1

    before = {k.kf_id: k.t_cw.copy() for k in m.good_keyframes()}
    gba._propagate(problem, res, m)
    # solved KFs moved by the shift; the new KF inherited it via the parent
    np.testing.assert_allclose(
        m.keyframes[parent].t_cw, shift @ before[parent], atol=1e-5
    )
    np.testing.assert_allclose(
        m.keyframes[fake.kf_id].t_cw, shift @ before[fake.kf_id], atol=1e-4
    )
    del m.keyframes[fake.kf_id]


def test_insert_interrupts_local_ba_flag():
    """AsyncMapping.insert_keyframe sets the wrapped stage's abort flag
    (reference LocalMapping::InsertKeyFrame, src/LocalMapping.cc:117)."""
    import threading

    from orbslam2commentedbyxcm_tpu.models.async_pipeline import AsyncMapping

    class Stub:
        abort_ba = False
        pending_check = None

        def insert_keyframe(self, kf_id):
            pass

    stub = Stub()
    am = AsyncMapping(stub, threading.Lock())
    assert stub.pending_check is not None
    am.insert_keyframe(1)
    assert stub.abort_ba
    am.shutdown()


def test_pending_work_defers_fuse_and_ba(mapped_system):
    """With newer keyframes queued, fuse/BA/culling are skipped (reference
    Run loop gates, src/LocalMapping.cc:63-82)."""
    system = mapped_system
    lm = system.local_mapping
    calls = []
    orig_fuse, orig_ba = lm.fuse_neighbors, lm.local_bundle_adjustment
    lm.fuse_neighbors = lambda kf: calls.append("fuse")
    lm.local_bundle_adjustment = lambda kf: calls.append("ba")
    lm.pending_check = lambda: True
    try:
        kf_id = max(k.kf_id for k in system.map.good_keyframes())
        lm.insert_keyframe(kf_id)
        assert calls == []
        lm.pending_check = lambda: False
        lm.insert_keyframe(kf_id)
        assert calls == ["fuse", "ba"]
    finally:
        lm.fuse_neighbors, lm.local_bundle_adjustment = orig_fuse, orig_ba
        lm.pending_check = None


def test_async_pipeline_loop_closure_overlaps_tracking():
    """Full 3-worker pipeline (tracking / mapping / loop closing + transient
    GBA): the loop closes while tracking keeps processing frames — frames are
    tracked WHILE global BA is in flight (reference thread model,
    src/System.cc:98-111 + the GBA thread :634)."""
    cam = Camera(fx=250.0, fy=250.0, cx=160.0, cy=120.0, width=320, height=240,
                 bf=20.0, th_depth=50.0)
    seq = BoxSequence(camera=cam, n_frames=130, turns=1.3)
    cfg = TrackingConfig(n_features=600, max_frames_between_kf=4,
                         kf_tracked_ratio=0.95, motion_search_radius=20.0)
    system = System(cam, Sensor.RGBD, config=cfg, enable_loop_closing=True,
                    async_mapping=True)
    tracked = 0
    frames_during_gba = 0
    for i in range(seq.n_frames):
        p = system.track_rgbd(seq.render(i), seq.depth_map(i), i / 30.0)
        tracked += p is not None
        lc = system.loop_closing
        if lc is not None and lc.gba is not None and lc.gba.running():
            frames_during_gba += 1
    system.shutdown()
    lc = system.loop_closing
    assert lc is not None and lc.n_loops_closed >= 1, (lc and lc.stats)
    assert tracked >= seq.n_frames - 15
    # the GBA solve overlapped live tracking (0 would mean it ran inline)
    assert frames_during_gba >= 1
    assert lc.gba.n_completed + lc.gba.n_aborted >= 1
