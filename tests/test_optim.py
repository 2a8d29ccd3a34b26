import jax.numpy as jnp
import numpy as np

from orbslam2commentedbyxcm_tpu.ops import optim
from orbslam2commentedbyxcm_tpu.utils import geometry as geo

FX, FY, CX, CY, BF = 500.0, 500.0, 320.0, 240.0, 40.0


def project(t_cw, pts, stereo=False):
    pc = pts @ np.asarray(t_cw)[:3, :3].T + np.asarray(t_cw)[:3, 3]
    u = FX * pc[:, 0] / pc[:, 2] + CX
    v = FY * pc[:, 1] / pc[:, 2] + CY
    if stereo:
        ur = u - BF / pc[:, 2]
        return np.stack([u, v, ur], -1)
    return np.stack([u, v, np.full_like(u, -1.0)], -1)


def make_problem(rng, n=150, stereo=False, noise=0.5):
    pts = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 10, n)], -1
    ).astype(np.float32)
    t_gt = np.asarray(geo.se3_exp(jnp.asarray([0.1, -0.05, 0.2, 0.03, -0.1, 0.05])))
    obs = project(t_gt, pts, stereo).astype(np.float32)
    obs[:, :2] += rng.normal(0, noise, (n, 2))
    if stereo:
        obs[:, 2] += rng.normal(0, noise, n)
    return pts, t_gt, obs


def pose_err(t_est, t_gt):
    d = np.asarray(geo.se3_log(jnp.asarray(t_est @ np.linalg.inv(t_gt), dtype=jnp.float32)))
    return np.linalg.norm(d)


def test_pose_optimization_mono(rng):
    pts, t_gt, obs = make_problem(rng)
    t0 = np.asarray(geo.se3_exp(jnp.asarray([0.3, 0.1, -0.1, 0.1, 0.05, -0.08]))) @ t_gt
    res = optim.pose_optimization(
        jnp.asarray(t0), jnp.asarray(pts), jnp.asarray(obs),
        jnp.ones(len(pts), bool), jnp.ones(len(pts)), FX, FY, CX, CY, BF,
    )
    assert pose_err(np.asarray(res.t_cw), t_gt) < 0.01
    assert int(res.n_inliers) > 0.9 * len(pts)


def test_pose_optimization_stereo(rng):
    pts, t_gt, obs = make_problem(rng, stereo=True)
    t0 = np.asarray(geo.se3_exp(jnp.asarray([-0.2, 0.15, 0.1, -0.05, 0.1, 0.02]))) @ t_gt
    res = optim.pose_optimization(
        jnp.asarray(t0), jnp.asarray(pts), jnp.asarray(obs),
        jnp.ones(len(pts), bool), jnp.ones(len(pts)), FX, FY, CX, CY, BF,
    )
    assert pose_err(np.asarray(res.t_cw), t_gt) < 0.005


def test_pose_optimization_rejects_outliers(rng):
    pts, t_gt, obs = make_problem(rng, n=200)
    n_out = 60
    idx = rng.choice(200, n_out, replace=False)
    obs[idx, :2] = rng.uniform([0, 0], [640, 480], (n_out, 2))
    t0 = np.asarray(geo.se3_exp(jnp.asarray([0.1, 0.05, -0.05, 0.02, -0.03, 0.04]))) @ t_gt
    res = optim.pose_optimization(
        jnp.asarray(t0), jnp.asarray(pts), jnp.asarray(obs),
        jnp.ones(len(pts), bool), jnp.ones(len(pts)), FX, FY, CX, CY, BF,
    )
    assert pose_err(np.asarray(res.t_cw), t_gt) < 0.02
    inl = np.asarray(res.inliers)
    assert inl[idx].sum() <= 3          # outliers identified
    assert inl.sum() > 120


def make_ba_problem(rng, n_poses=6, n_pts=120, stereo=False, noise=0.5):
    pts = np.stack(
        [rng.uniform(-4, 4, n_pts), rng.uniform(-3, 3, n_pts), rng.uniform(5, 12, n_pts)], -1
    ).astype(np.float32)
    poses = []
    for k in range(n_poses):
        xi = np.array([0.25 * k, 0.02 * k, 0.01 * k, 0.0, 0.03 * k, 0.0], np.float32)
        poses.append(np.asarray(geo.se3_exp(jnp.asarray(xi))))
    poses = np.stack(poses)
    obs_pose, obs_point, obs_uvr = [], [], []
    for k in range(n_poses):
        o = project(poses[k], pts, stereo)
        o[:, :2] += rng.normal(0, noise, (n_pts, 2))
        if stereo:
            o[:, 2] += rng.normal(0, noise, n_pts)
        obs_pose.append(np.full(n_pts, k))
        obs_point.append(np.arange(n_pts))
        obs_uvr.append(o)
    return (
        poses,
        pts,
        np.concatenate(obs_pose).astype(np.int32),
        np.concatenate(obs_point).astype(np.int32),
        np.concatenate(obs_uvr).astype(np.float32),
    )


def test_local_ba_converges(rng):
    poses, pts, op, opt_, ouv = make_ba_problem(rng)
    k, p = len(poses), len(pts)
    # perturb everything except the two fixed poses
    poses_0 = poses.copy()
    for i in range(2, k):
        xi = rng.normal(0, 0.03, 6).astype(np.float32)
        poses_0[i] = np.asarray(geo.se3_exp(jnp.asarray(xi))) @ poses[i]
    pts_0 = pts + rng.normal(0, 0.1, pts.shape).astype(np.float32)
    fixed = np.zeros(k, bool)
    fixed[:2] = True
    res = optim.bundle_adjustment(
        jnp.asarray(poses_0), jnp.asarray(fixed), jnp.asarray(pts_0),
        jnp.ones(p, bool), jnp.asarray(op), jnp.asarray(opt_), jnp.asarray(ouv),
        jnp.ones(len(op), bool), jnp.ones(len(op)), FX, FY, CX, CY, BF,
    )
    out_poses = np.asarray(res.poses)
    # 0.5px noise puts the ML estimate ~0.012 from GT; noise-free recovery is
    # exact (checked during development), so 0.02 is the statistical floor.
    for i in range(k):
        assert pose_err(out_poses[i], poses[i]) < 0.02, f"pose {i}"
    err = np.linalg.norm(np.asarray(res.points) - pts, axis=-1)
    assert np.median(err) < 0.08
    assert np.asarray(res.obs_inliers).mean() > 0.95


def test_global_ba_stereo_with_outliers(rng):
    poses, pts, op, opt_, ouv = make_ba_problem(rng, n_poses=5, n_pts=100, stereo=True)
    e = len(op)
    n_out = e // 10
    idx = rng.choice(e, n_out, replace=False)
    ouv[idx, :2] = rng.uniform([0, 0], [640, 480], (n_out, 2))
    k, p = len(poses), len(pts)
    poses_0 = poses.copy()
    for i in range(1, k):
        poses_0[i] = np.asarray(
            geo.se3_exp(jnp.asarray(rng.normal(0, 0.02, 6).astype(np.float32)))
        ) @ poses[i]
    pts_0 = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    fixed = np.zeros(k, bool)
    fixed[0] = True
    res = optim.bundle_adjustment(
        jnp.asarray(poses_0), jnp.asarray(fixed), jnp.asarray(pts_0),
        jnp.ones(p, bool), jnp.asarray(op), jnp.asarray(opt_), jnp.asarray(ouv),
        jnp.ones(e, bool), jnp.ones(e), FX, FY, CX, CY, BF,
        schedule=((5, True), (10, True)),
    )
    out_poses = np.asarray(res.poses)
    # With a single gauge anchor the absolute error drifts along the chain
    # (oracle run shows the same), so check *relative* poses instead.
    for i in range(1, k):
        rel_est = out_poses[i] @ np.linalg.inv(out_poses[i - 1])
        rel_gt = poses[i] @ np.linalg.inv(poses[i - 1])
        assert pose_err(rel_est, rel_gt) < 0.03, f"rel pose {i}: {pose_err(rel_est, rel_gt)}"
    inl = np.asarray(res.obs_inliers)
    assert inl[idx].mean() < 0.1          # outlier edges rejected
    assert inl[~np.isin(np.arange(e), idx)].mean() > 0.9  # true inliers kept


def test_pose_optimization_algorithm_variants(rng):
    """Gauss-Newton and Dogleg (g2o's other two solver algorithms) reach the
    same optimum as Levenberg on a well-conditioned motion-only problem."""
    pts, t_gt, obs = make_problem(rng, n=200, noise=0.3)
    t0 = np.asarray(geo.se3_exp(jnp.asarray([0.25, -0.1, 0.15, 0.08, -0.06, 0.1]))) @ t_gt
    results = {}
    for alg in ("lm", "gn", "dogleg"):
        res = optim.pose_optimization(
            jnp.asarray(t0), jnp.asarray(pts), jnp.asarray(obs),
            jnp.ones(len(pts), bool), jnp.ones(len(pts)), FX, FY, CX, CY, BF,
            algorithm=alg,
        )
        results[alg] = np.asarray(res.t_cw)
        assert pose_err(results[alg], t_gt) < 0.01, alg
        assert int(res.n_inliers) > 0.9 * len(pts), alg
    assert pose_err(results["gn"], results["lm"]) < 2e-3
    assert pose_err(results["dogleg"], results["lm"]) < 2e-3


def test_pose_optimization_dogleg_with_outliers(rng):
    pts, t_gt, obs = make_problem(rng, n=200)
    n_out = 50
    obs = obs.copy()
    obs[:n_out, :2] += rng.uniform(30, 80, (n_out, 2))
    t0 = np.asarray(geo.se3_exp(jnp.asarray([0.15, 0.1, -0.05, 0.05, 0.02, -0.04]))) @ t_gt
    res = optim.pose_optimization(
        jnp.asarray(t0), jnp.asarray(pts), jnp.asarray(obs),
        jnp.ones(len(pts), bool), jnp.ones(len(pts)), FX, FY, CX, CY, BF,
        algorithm="dogleg",
    )
    assert pose_err(np.asarray(res.t_cw), t_gt) < 0.02
    inl = np.asarray(res.inliers)
    assert inl[n_out:].mean() > 0.9 and inl[:n_out].mean() < 0.2


def test_ba_active_init_readmits_excluded_edges(rng):
    """Phased interruptible BA parity (r3 review fix): an edge excluded from
    the ACTIVE set via active_init must be re-admitted by the final relabel
    when its chi2 at the solution is small — relabeling considers the full
    obs_mask, exactly like the single-call schedule."""
    poses, pts, op, opt_, ouv = make_ba_problem(rng, noise=0.3)
    k, p = len(poses), len(pts)
    fixed = np.zeros(k, bool)
    fixed[:2] = True
    active0 = np.ones(len(op), bool)
    active0[:40] = False  # 40 perfectly good edges excluded from phase 1
    res = optim.bundle_adjustment(
        jnp.asarray(poses), jnp.asarray(fixed), jnp.asarray(pts),
        jnp.ones(p, bool), jnp.asarray(op), jnp.asarray(opt_), jnp.asarray(ouv),
        jnp.ones(len(op), bool), jnp.ones(len(op)), FX, FY, CX, CY, BF,
        schedule=((5, True),), active_init=jnp.asarray(active0),
    )
    inl = np.asarray(res.obs_inliers)
    # the excluded-but-good edges come back as inliers
    assert inl[:40].mean() > 0.9
    assert inl.mean() > 0.95
