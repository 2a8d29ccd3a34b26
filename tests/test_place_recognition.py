"""BoW vocabulary, PnP, Sim3 solver and pose-graph optimizer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2commentedbyxcm_tpu.ops import bow, pnp, posegraph, sim3solver
from orbslam2commentedbyxcm_tpu.utils import geometry as geo

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)


def random_desc(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def perturb_desc(rng, desc, n_bits):
    """Flip n_bits random bits in each descriptor."""
    out = desc.copy()
    for i in range(len(out)):
        for b in rng.integers(0, 256, n_bits):
            out[i, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
    return out


def scene_descriptors(view=0, seed=3):
    """Real ORB descriptors from rendered synthetic views."""
    from orbslam2commentedbyxcm_tpu.ops.orb import ORBExtractor
    from orbslam2commentedbyxcm_tpu.utils.synth import SyntheticSequence, default_camera

    cam = default_camera(320, 240)
    seq = SyntheticSequence(camera=cam, n_frames=30, trajectory="sideways", seed=seed)
    ext = ORBExtractor(n_features=400)
    f = ext(seq.render(view))
    d = np.asarray(f.desc)[np.asarray(f.valid)]
    return d


class TestBow:
    def test_train_and_transform(self, rng):
        desc = random_desc(rng, 3000)
        voc = bow.train_vocabulary(desc, k=6, depth=3, kmeans_iters=5)
        assert voc.n_words > 30
        words, groups, weights = bow.transform(voc, desc[:500], np.ones(500, bool))
        assert (words >= 0).all() and (words < voc.n_words).all()

    def test_bow_similarity_discriminates(self, rng):
        """Same-place vs different-place frames on real ORB descriptors.

        (Uniformly random descriptors are the degenerate case for a BoW tree —
        no cluster structure — so this test uses rendered views.)
        """
        train = np.concatenate([scene_descriptors(v) for v in (0, 8, 16, 24)])
        voc = bow.train_vocabulary(train, k=8, depth=3, kmeans_iters=6)

        def vec(d):
            w, g, wt = bow.transform(voc, d, np.ones(len(d), bool))
            return bow.bow_vector(w, wt, voc.n_words)

        d0 = scene_descriptors(2)
        d0b = scene_descriptors(3)            # adjacent view of the same place
        d1 = scene_descriptors(2, seed=11)    # different scene entirely
        s_same = bow.l1_score(*vec(d0), *vec(d0b))
        s_diff = bow.l1_score(*vec(d0), *vec(d1))
        # i.i.d. random-rectangle textures are statistically near-identical
        # across scenes, so the margin here is inherently thin; the real
        # retrieval gate is the loop-closing e2e (distinct box walls).
        assert s_same > 1.1 * s_diff, f"same={s_same:.3f} diff={s_diff:.3f}"

    def test_save_load(self, rng, tmp_path):
        desc = random_desc(rng, 1000)
        voc = bow.train_vocabulary(desc, k=5, depth=2, kmeans_iters=3)
        p = str(tmp_path / "voc.npz")
        voc.save(p)
        voc2 = bow.Vocabulary.load(p)
        w1, _, _ = bow.transform(voc, desc[:100], np.ones(100, bool))
        w2, _, _ = bow.transform(voc2, desc[:100], np.ones(100, bool))
        np.testing.assert_array_equal(w1, w2)


class TestSearchByBow:
    def test_group_gating_matches_and_blocks(self, rng):
        """BoW-node gating: perturbed copies of the same descriptors match
        within their grouping node; pairs in different nodes never match even
        if Hamming-close."""
        from orbslam2commentedbyxcm_tpu.ops import matching

        desc_a = random_desc(rng, 64)
        desc_b = perturb_desc(rng, desc_a, 8)  # ~8-bit noise, well under TH_LOW
        grp_a = (np.arange(64) % 7).astype(np.int32)
        grp_b = grp_a.copy()
        valid = np.ones(64, bool)
        idx, dist, ok = matching.search_by_bow(
            jnp.asarray(desc_a), jnp.asarray(grp_a), jnp.asarray(valid),
            jnp.asarray(desc_b), jnp.asarray(grp_b), jnp.asarray(valid),
        )
        ok = np.asarray(ok)
        idx = np.asarray(idx)
        assert ok.sum() >= 55  # near-duplicate descriptors in same node match
        assert (idx[ok] == np.nonzero(ok)[0]).mean() > 0.9

        # rotate groups of b: identical descriptors now sit in different nodes
        grp_b2 = ((grp_a + 1) % 7).astype(np.int32)
        _, _, ok2 = matching.search_by_bow(
            jnp.asarray(desc_a), jnp.asarray(grp_a), jnp.asarray(valid),
            jnp.asarray(desc_b), jnp.asarray(grp_b2), jnp.asarray(valid),
        )
        # random cross-node descriptors are ~128 bits apart: nothing matches
        assert int(np.asarray(ok2).sum()) == 0

    def test_unassigned_features_never_match(self, rng):
        from orbslam2commentedbyxcm_tpu.ops import matching

        desc = random_desc(rng, 32)
        grp = np.full(32, -1, np.int32)
        valid = np.ones(32, bool)
        _, _, ok = matching.search_by_bow(
            jnp.asarray(desc), jnp.asarray(grp), jnp.asarray(valid),
            jnp.asarray(desc), jnp.asarray(grp), jnp.asarray(valid),
        )
        assert int(np.asarray(ok).sum()) == 0


class TestPnP:
    def make(self, rng, n=100, outliers=0.0, noise=0.5):
        pts = np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 10, n)], -1
        ).astype(np.float32)
        t_gt = np.asarray(geo.se3_exp(jnp.asarray([0.2, -0.1, 0.3, 0.1, -0.2, 0.15])))
        pc = pts @ t_gt[:3, :3].T + t_gt[:3, 3]
        uv = (pc @ K.T)
        uv = uv[:, :2] / uv[:, 2:3] + rng.normal(0, noise, (n, 2))
        n_out = int(outliers * n)
        if n_out:
            idx = rng.choice(n, n_out, replace=False)
            uv[idx] = rng.uniform([0, 0], [640, 480], (n_out, 2))
        return pts, uv.astype(np.float32), t_gt

    def test_pnp_clean(self, rng):
        pts, uv, t_gt = self.make(rng)
        res = pnp.ransac_pnp(
            jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(uv),
            jnp.ones(len(pts), bool), jnp.asarray(K), jnp.ones(len(pts)),
        )
        assert bool(res.success)
        err = np.asarray(geo.se3_log(jnp.asarray(np.asarray(res.t_cw) @ np.linalg.inv(t_gt), dtype=jnp.float32)))
        assert np.linalg.norm(err) < 0.02, np.linalg.norm(err)

    def test_pnp_outliers(self, rng):
        pts, uv, t_gt = self.make(rng, n=150, outliers=0.3)
        res = pnp.ransac_pnp(
            jax.random.PRNGKey(1), jnp.asarray(pts), jnp.asarray(uv),
            jnp.ones(len(pts), bool), jnp.asarray(K), jnp.ones(len(pts)),
        )
        assert bool(res.success)
        assert int(res.n_inliers) > 80
        err = np.asarray(geo.se3_log(jnp.asarray(np.asarray(res.t_cw) @ np.linalg.inv(t_gt), dtype=jnp.float32)))
        assert np.linalg.norm(err) < 0.05, np.linalg.norm(err)

    def test_epnp_clean(self, rng):
        pts, uv, t_gt = self.make(rng)
        res = pnp.ransac_epnp(
            jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(uv),
            jnp.ones(len(pts), bool), jnp.asarray(K), jnp.ones(len(pts)),
        )
        assert bool(res.success)
        err = np.asarray(geo.se3_log(jnp.asarray(np.asarray(res.t_cw) @ np.linalg.inv(t_gt), dtype=jnp.float32)))
        assert np.linalg.norm(err) < 0.02, np.linalg.norm(err)

    def test_epnp_outliers(self, rng):
        pts, uv, t_gt = self.make(rng, n=150, outliers=0.4)
        res = pnp.ransac_epnp(
            jax.random.PRNGKey(1), jnp.asarray(pts), jnp.asarray(uv),
            jnp.ones(len(pts), bool), jnp.asarray(K), jnp.ones(len(pts)),
        )
        assert bool(res.success)
        assert int(res.n_inliers) > 70
        err = np.asarray(geo.se3_log(jnp.asarray(np.asarray(res.t_cw) @ np.linalg.inv(t_gt), dtype=jnp.float32)))
        assert np.linalg.norm(err) < 0.05, np.linalg.norm(err)

    def test_epnp_minimal_6pt_lane(self, rng):
        """A single 6-point EPnP lane (the RANSAC hypothesis shape) recovers
        the pose from noiseless correspondences."""
        pts, uv, t_gt = self.make(rng, n=6, noise=0.0)
        kinv = np.linalg.inv(K)
        uv1 = np.concatenate([uv, np.ones((6, 1), np.float32)], axis=1)
        uvn = (uv1 @ kinv.T)[:, :2]
        r, t, err = pnp._epnp_pose(
            jnp.asarray(pts), jnp.asarray(uvn), jnp.ones(6, jnp.float32)
        )
        assert float(err) < 1e-6, float(err)
        np.testing.assert_allclose(np.asarray(r), t_gt[:3, :3], atol=1e-3)
        np.testing.assert_allclose(np.asarray(t), t_gt[:3, 3], atol=1e-3)

    def test_pnp_degenerate_fails_gracefully(self, rng):
        pts, uv, t_gt = self.make(rng, n=20)
        res = pnp.ransac_pnp(
            jax.random.PRNGKey(2), jnp.asarray(pts), jnp.asarray(uv),
            jnp.zeros(len(pts), bool), jnp.asarray(K), jnp.ones(len(pts)),
        )
        assert not bool(res.success)


class TestSim3:
    def test_horn_exact(self, rng):
        p1 = rng.uniform(-2, 2, (30, 3)).astype(np.float32)
        r_gt = np.asarray(geo.so3_exp(jnp.asarray([0.2, -0.3, 0.5])))
        s_gt, t_gt = 1.3, np.array([0.5, -1.0, 2.0], np.float32)
        p2 = s_gt * p1 @ r_gt.T + t_gt
        r, t, s = sim3solver.horn_sim3(jnp.asarray(p1), jnp.asarray(p2))
        np.testing.assert_allclose(np.asarray(s), s_gt, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(r), r_gt, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-3)

    def test_ransac_sim3(self, rng):
        n = 80
        pts1 = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 8, n)], -1
        ).astype(np.float32)
        r_gt = np.asarray(geo.so3_exp(jnp.asarray([0.05, 0.3, -0.1])))
        s_gt = 1.25
        t_gt = np.array([0.4, 0.1, 0.6], np.float32)
        # pts1 = S12 pts2 -> pts2 = S12^-1 pts1
        pts2 = ((pts1 - t_gt) @ r_gt) / s_gt
        # corrupt 25%
        idx = rng.choice(n, n // 4, replace=False)
        pts2_bad = pts2.copy()
        pts2_bad[idx] += rng.uniform(1, 3, (len(idx), 3))
        res = sim3solver.ransac_sim3(
            jax.random.PRNGKey(0), jnp.asarray(pts1), jnp.asarray(pts2_bad),
            jnp.ones(n, bool), jnp.asarray(K), jnp.ones(n), jnp.ones(n),
        )
        assert bool(res.success)
        s12 = np.asarray(res.s12)
        np.testing.assert_allclose(np.asarray(geo.sim3_scale(jnp.asarray(s12))), s_gt, rtol=0.02)
        np.testing.assert_allclose(s12[:3, 3], t_gt, atol=0.05)

    def test_optimize_sim3_polishes(self, rng):
        n = 60
        pts1 = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 8, n)], -1
        ).astype(np.float32)
        r_gt = np.asarray(geo.so3_exp(jnp.asarray([0.0, 0.2, 0.05])))
        s_gt, t_gt = 1.1, np.array([0.3, 0.0, 0.4], np.float32)
        pts2 = ((pts1 - t_gt) @ r_gt) / s_gt

        def proj(p):
            uvw = p @ K.T
            return (uvw[:, :2] / uvw[:, 2:3]).astype(np.float32)

        uv1 = proj(pts1) + rng.normal(0, 0.3, (n, 2)).astype(np.float32)
        uv2 = proj(pts2) + rng.normal(0, 0.3, (n, 2)).astype(np.float32)
        s0 = np.asarray(geo.sim3_make(
            jnp.asarray(np.asarray(geo.so3_exp(jnp.asarray([0.02, 0.18, 0.03])))),
            jnp.asarray(t_gt + 0.1), 1.05,
        ))
        res = posegraph.optimize_sim3(
            jnp.asarray(s0), jnp.asarray(pts1), jnp.asarray(pts2),
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(n, bool),
            jnp.asarray(K), jnp.ones(n), jnp.ones(n),
        )
        s12 = np.asarray(res.s12)
        assert int(res.n_inliers) > 0.9 * n
        np.testing.assert_allclose(np.asarray(geo.sim3_scale(jnp.asarray(s12))), s_gt, rtol=0.01)
        np.testing.assert_allclose(s12[:3, 3], t_gt, atol=0.03)


class TestPoseGraph:
    def test_loop_closure_corrects_drift(self, rng):
        """Chain of 20 sim3 poses with accumulated drift; one loop edge back to
        the start snaps the loop shut (the OptimizeEssentialGraph scenario)."""
        k = 20
        # GT: poses around a circle, scale 1
        gt = []
        for i in range(k):
            a = 2 * np.pi * i / k
            r = np.asarray(geo.so3_exp(jnp.asarray([0.0, a, 0.0], dtype=jnp.float32)))
            c = np.array([np.sin(a) * 3, 0.0, 3 - np.cos(a) * 3], np.float32)
            t_cw = np.eye(4, dtype=np.float32)
            t_cw[:3, :3] = r.T
            t_cw[:3, 3] = -r.T @ c
            gt.append(t_cw)
        gt = np.stack(gt)
        # odometry = GT relative with small noise + scale drift
        est = [gt[0]]
        for i in range(1, k):
            rel = gt[i] @ np.linalg.inv(gt[i - 1])
            noise = np.asarray(geo.sim3_exp(jnp.asarray(
                np.concatenate([rng.normal(0, 0.01, 6), [0.01]]).astype(np.float32))))
            est.append(np.asarray(noise @ rel @ est[i - 1], dtype=np.float32))
        est = np.stack(est)

        edge_i, edge_j, meas = [], [], []
        for i in range(1, k):
            edge_i.append(i - 1)
            edge_j.append(i)
            meas.append(est[i] @ np.linalg.inv(est[i - 1]))  # odometry edges
        # loop edge with the TRUE relative transform (scale 1)
        edge_i.append(k - 1)
        edge_j.append(0)
        meas.append(gt[0] @ np.linalg.inv(gt[k - 1]))

        fixed = np.zeros(k, bool)
        fixed[0] = True
        res = posegraph.optimize_pose_graph(
            jnp.asarray(est), jnp.asarray(fixed),
            jnp.asarray(np.array(edge_i, np.int32)), jnp.asarray(np.array(edge_j, np.int32)),
            jnp.asarray(np.stack(meas).astype(np.float32)),
            jnp.ones(len(edge_i), bool), n_iters=30,
        )
        out = np.asarray(res.poses)
        # drift before vs after at the loop end
        def err_at(poses, i):
            d = poses[i] @ np.linalg.inv(gt[i])
            return np.linalg.norm(np.asarray(geo.sim3_log(jnp.asarray(d, dtype=jnp.float32))))

        before = err_at(est, k - 1)
        after = err_at(out, k - 1)
        assert after < 0.3 * before, f"before {before:.4f} after {after:.4f}"
        # scales pulled back toward 1
        scales = np.asarray(geo.sim3_scale(jnp.asarray(out)))
        assert np.abs(np.log(scales)).max() < 0.08


class TestScoringVariants:
    """All six DBoW2 scorings (ScoringObject.cpp) vs dense-vector oracles."""

    def _dense(self, ids, vals, n=600):
        d = np.zeros(n)
        d[np.asarray(ids)] = np.asarray(vals, np.float64)
        return d

    def test_against_dense_oracle(self, rng):
        for norm in ("l1", "l2"):
            w1 = rng.choice(600, 40, replace=False).astype(np.int32)
            w2 = np.concatenate([w1[:20], rng.choice(600, 25, replace=False).astype(np.int32)])
            ids1, vals1 = bow.bow_vector(w1, rng.random(40).astype(np.float32), 600, norm=norm)
            ids2, vals2 = bow.bow_vector(w2, rng.random(45).astype(np.float32), 600, norm=norm)
            a, b = self._dense(ids1, vals1), self._dense(ids2, vals2)

            if norm == "l1":
                ref_l1 = 1.0 - 0.5 * np.abs(a - b).sum()
                assert bow.score(ids1, vals1, ids2, vals2, "l1") == pytest.approx(ref_l1, abs=1e-6)
                c = (a != 0) & (b != 0)
                ref_chi = 2.0 * (a[c] * b[c] / (a[c] + b[c])).sum()
                assert bow.score(ids1, vals1, ids2, vals2, "chi_square") == pytest.approx(ref_chi, abs=1e-6)
                ref_bh = np.sqrt(a[c] * b[c]).sum()
                assert bow.score(ids1, vals1, ids2, vals2, "bhattacharyya") == pytest.approx(ref_bh, abs=1e-6)
                log_eps = np.log(np.finfo(np.float64).eps)
                v_only = (a != 0) & (b == 0)
                ref_kl = (a[c] * np.log(a[c] / b[c])).sum() + (a[v_only] * (np.log(a[v_only]) - log_eps)).sum()
                assert bow.score(ids1, vals1, ids2, vals2, "kl") == pytest.approx(ref_kl, abs=1e-6)
            else:
                dot = float((a * b).sum())
                ref_l2 = 1.0 - np.sqrt(1.0 - min(dot, 1.0))
                assert bow.score(ids1, vals1, ids2, vals2, "l2") == pytest.approx(ref_l2, abs=1e-6)
                assert bow.score(ids1, vals1, ids2, vals2, "dot_product") == pytest.approx(dot, abs=1e-6)

    def test_l1_matches_legacy_function(self, rng):
        w1 = rng.choice(300, 30, replace=False).astype(np.int32)
        w2 = rng.choice(300, 30, replace=False).astype(np.int32)
        ids1, vals1 = bow.bow_vector(w1, rng.random(30).astype(np.float32), 300)
        ids2, vals2 = bow.bow_vector(w2, rng.random(30).astype(np.float32), 300)
        assert bow.score(ids1, vals1, ids2, vals2, "l1") == pytest.approx(
            bow.l1_score(ids1, vals1, ids2, vals2), abs=1e-6)

    def test_identical_vectors_score_one(self, rng):
        w = rng.choice(300, 30, replace=False).astype(np.int32)
        ids, vals = bow.bow_vector(w, rng.random(30).astype(np.float32), 300)
        assert bow.score(ids, vals, ids, vals, "l1") == pytest.approx(1.0, abs=1e-6)
        idsl2, valsl2 = bow.bow_vector(w, rng.random(30).astype(np.float32), 300, norm="l2")
        assert bow.score(idsl2, valsl2, idsl2, valsl2, "l2") == pytest.approx(1.0, abs=1e-3)


class TestBootstrapVocabulary:
    def test_loads_and_discriminates(self):
        voc = bow.bootstrap_vocabulary()
        assert voc.n_words > 5000  # packaged k=10 depth=4 vocabulary (~10k words)

        def vec(d):
            w, g, wt = bow.transform(voc, d, np.ones(len(d), bool))
            return bow.bow_vector(w, wt, voc.n_words)

        d0 = scene_descriptors(2)
        d0b = scene_descriptors(3)
        d1 = scene_descriptors(2, seed=11)
        s_same = bow.l1_score(*vec(d0), *vec(d0b))
        s_diff = bow.l1_score(*vec(d0), *vec(d1))
        assert s_same > 1.1 * s_diff, f"same={s_same:.3f} diff={s_diff:.3f}"

    def test_system_accepts_bootstrap_keyword(self):
        from orbslam2commentedbyxcm_tpu.models.system import Sensor, System
        from orbslam2commentedbyxcm_tpu.utils.synth import default_camera

        system = System(default_camera(320, 240), Sensor.MONOCULAR, vocabulary="bootstrap")
        assert system.vocabulary is not None and system.loop_closing is not None
        assert system.keyframe_db is not None
