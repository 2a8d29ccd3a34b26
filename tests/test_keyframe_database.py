"""KeyFrameDatabase: native C++ inverted file vs pure-Python backend parity.

Semantics under test are the reference's (src/KeyFrameDatabase.cc): inverted
file, shared-word counting, 0.8x-max-common filter, L1 min-score filter, and
covisibility-group accumulation with 0.75x retention.
"""

import numpy as np
import pytest

from orbslam2commentedbyxcm_tpu.models.keyframe_database import KeyFrameDatabase, _PyBackend


def _rand_vec(rng, n_words=500, size=30):
    ids = rng.choice(n_words, size=size, replace=False).astype(np.int32)
    vals = rng.random(size).astype(np.float32)
    vals /= vals.sum()
    return np.sort(ids), vals


class _StubKF:
    def __init__(self, covis):
        self.bad = False
        self._covis = covis

    def best_covisible(self, n):
        return self._covis[:n]


class _StubMap:
    def __init__(self, ids, covis=None):
        self.keyframes = {i: _StubKF((covis or {}).get(i, [])) for i in ids}


@pytest.fixture
def both_dbs():
    try:
        db_native = KeyFrameDatabase(None, use_native=True)
    except RuntimeError:
        pytest.skip("native toolchain unavailable")
    db_py = KeyFrameDatabase(None, use_native=False)
    assert db_native.is_native and not db_py.is_native
    return db_native, db_py


def test_backend_parity_scores_and_queries(both_dbs, rng):
    dbn, dbp = both_dbs
    vecs = {}
    for kf_id in range(40):
        ids, vals = _rand_vec(rng)
        vecs[kf_id] = (ids, vals)
        dbn.add(kf_id, ids, vals)
        dbp.add(kf_id, ids, vals)
    # erase a few from both
    for kf_id in (3, 17, 29):
        dbn.erase(kf_id)
        dbp.erase(kf_id)
    assert len(dbn._b) == len(dbp._b) == 37

    for a, b in [(0, 1), (5, 20), (10, 10), (2, 3)]:
        assert dbn.score(a, b) == pytest.approx(dbp.score(a, b), abs=1e-6)

    qids, qvals = _rand_vec(rng)
    assert dbn.score_vec((qids, qvals), 7) == pytest.approx(
        dbp.score_vec((qids, qvals), 7), abs=1e-6)

    for min_score in (-np.inf, 0.0, 0.05):
        for exclude in (set(), {0, 1, 2}, set(range(30))):
            kn, sn = dbn._b.query(qids, qvals, exclude, min_score)
            kp, sp = dbp._b.query(qids, qvals, exclude, min_score)
            got_n = dict(zip(kn, np.round(sn, 5)))
            got_p = dict(zip(kp, np.round(np.asarray(sp, np.float64), 5)))
            assert got_n == got_p, (min_score, exclude)


def test_detect_candidates_parity(both_dbs, rng):
    dbn, dbp = both_dbs
    ids_all = list(range(25))
    covis = {i: [j for j in (i - 1, i + 1, i + 2) if 0 <= j < 25] for i in ids_all}
    wm = _StubMap(ids_all, covis)
    base_ids, base_vals = _rand_vec(rng, size=40)
    for kf_id in ids_all:
        # correlated vectors: share most words with the base
        ids, vals = _rand_vec(rng, size=40)
        take = rng.random(40) < 0.6
        ids = np.where(take, base_ids, ids).astype(np.int32)
        order = np.argsort(ids)
        dbn.add(kf_id, ids[order], vals[order])
        dbp.add(kf_id, ids[order], vals[order])

    loop_n = dbn.detect_loop_candidates(0, base_ids, base_vals, 0.01, {1, 2}, wm)
    loop_p = dbp.detect_loop_candidates(0, base_ids, base_vals, 0.01, {1, 2}, wm)
    assert sorted(loop_n) == sorted(loop_p)
    assert 0 not in loop_n and 1 not in loop_n and 2 not in loop_n

    rel_n = dbn.detect_relocalization_candidates(base_ids, base_vals, wm)
    rel_p = dbp.detect_relocalization_candidates(base_ids, base_vals, wm)
    assert sorted(rel_n) == sorted(rel_p)
    assert rel_n, "relocalization should return candidates"


def test_clear_and_requery(both_dbs, rng):
    dbn, _ = both_dbs
    ids, vals = _rand_vec(rng)
    dbn.add(0, ids, vals)
    dbn.clear()
    assert len(dbn._b) == 0
    k, s = dbn._b.query(ids, vals, set(), -np.inf)
    assert k == [] and s == []


def test_query_cap_growth(rng):
    """Native query transparently regrows its output buffer past cap."""
    try:
        from orbslam2commentedbyxcm_tpu import native
        idx = native.InvertedIndex()
    except RuntimeError:
        pytest.skip("native toolchain unavailable")
    ids = np.arange(5, dtype=np.int32)
    vals = np.full(5, 0.2, np.float32)
    for kf_id in range(300):
        idx.add(kf_id, ids, vals)
    k, s = idx.query(ids, vals, set(), -np.inf, cap=8)
    assert len(k) == 300
