"""Batched map-point attribute updates must match the per-point reference
implementations (MapPoint::UpdateNormalAndDepth / ComputeDistinctiveDescriptors)."""

import numpy as np

from orbslam2commentedbyxcm_tpu.models.frame import KeyFrame
from orbslam2commentedbyxcm_tpu.models.map import Map


def _fake_kf(kf_id, t, n_feat, rng):
    kf = KeyFrame.__new__(KeyFrame)
    kf.kf_id = kf_id
    kf.n_levels = 8
    kf.scale_factor = 1.2
    kf.level = rng.integers(0, 8, n_feat)
    kf.desc = rng.integers(0, 2**32, (n_feat, 8), dtype=np.uint32)
    kf.t_cw = np.eye(4, dtype=np.float32)
    kf.t_cw[:3, 3] = t
    kf.map_pt = np.full(n_feat, -1, np.int64)
    kf.covis = {}
    kf.parent = None
    kf.children = set()
    kf.bad = False
    return kf


def _build_map(rng, n_kf=4, n_pt=60):
    m = Map()
    m._native = None  # exercise the dict-walk CSR path deterministically
    kfs = [_fake_kf(i, rng.normal(0, 1, 3).astype(np.float32), 200, rng) for i in range(n_kf)]
    for kf in kfs:
        m.keyframes[kf.kf_id] = kf
    feat_used = {k.kf_id: 0 for k in kfs}
    for _ in range(n_pt):
        xyz = rng.normal(0, 2, 3).astype(np.float32)
        pid = m.add_point(xyz, rng.integers(0, 2**32, 8, dtype=np.uint32), 0)
        observers = rng.choice(n_kf, size=rng.integers(1, n_kf + 1), replace=False)
        for j, k in enumerate(observers):
            fi = feat_used[int(k)]
            feat_used[int(k)] += 1
            m.add_observation(pid, int(k), fi)
            if j == 0:
                m.pt_ref_kf[pid] = int(k)
    return m


def test_update_points_batch_matches_single(rng):
    m = _build_map(rng)
    pids = m.all_point_ids()
    mb = _build_map(np.random.default_rng(0))

    for pid in pids:
        m.update_point_normal_depth(int(pid))
    mb.update_points_batch(pids)

    np.testing.assert_allclose(mb.pt_normal[pids], m.pt_normal[pids], atol=1e-5)
    np.testing.assert_allclose(mb.pt_dmax[pids], m.pt_dmax[pids], rtol=1e-5)
    np.testing.assert_allclose(mb.pt_dmin[pids], m.pt_dmin[pids], rtol=1e-5)


def test_update_descriptors_batch_matches_single(rng):
    m = _build_map(rng)
    pids = m.all_point_ids()
    mb = _build_map(np.random.default_rng(0))

    for pid in pids:
        m.update_point_descriptor(int(pid))
    mb.update_point_descriptors_batch(pids)

    # median-argmin ties can break differently; both picks must have the same
    # (minimal) median distance, and almost all should be bit-identical
    same = (mb.pt_desc[pids] == m.pt_desc[pids]).all(axis=1)
    assert same.mean() > 0.9
    np.testing.assert_array_equal(mb.pt_desc[pids][same], m.pt_desc[pids][same])


def test_batch_on_native_csr_matches_dict(rng):
    from orbslam2commentedbyxcm_tpu.native import mapgraph_available

    if not mapgraph_available():
        import pytest

        pytest.skip("native mapgraph not built")
    m_native = _build_map(np.random.default_rng(0))
    # rebuild WITH native index
    m2 = Map()
    rng2 = np.random.default_rng(0)
    kfs = [_fake_kf(i, rng2.normal(0, 1, 3).astype(np.float32), 200, rng2) for i in range(4)]
    for kf in kfs:
        m2.keyframes[kf.kf_id] = kf
    feat_used = {k.kf_id: 0 for k in kfs}
    for _ in range(60):
        xyz = rng2.normal(0, 2, 3).astype(np.float32)
        pid = m2.add_point(xyz, rng2.integers(0, 2**32, 8, dtype=np.uint32), 0)
        observers = rng2.choice(4, size=rng2.integers(1, 5), replace=False)
        for j, k in enumerate(observers):
            fi = feat_used[int(k)]
            feat_used[int(k)] += 1
            m2.add_observation(pid, int(k), fi)
            if j == 0:
                m2.pt_ref_kf[pid] = int(k)
    pids = m2.all_point_ids()
    m_native.update_points_batch(pids)
    m2.update_points_batch(pids)
    np.testing.assert_allclose(m2.pt_normal[pids], m_native.pt_normal[pids], atol=1e-5)
    np.testing.assert_allclose(m2.pt_dmax[pids], m_native.pt_dmax[pids], rtol=1e-5)
