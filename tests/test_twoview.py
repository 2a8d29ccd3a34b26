import jax
import jax.numpy as jnp
import numpy as np

from orbslam2commentedbyxcm_tpu.ops import twoview
from orbslam2commentedbyxcm_tpu.utils import geometry as geo

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)


def make_scene(rng, n=200, translation=(0.5, 0.05, 0.1), rotvec=(0.02, -0.1, 0.03), planar=False):
    """Random 3D scene viewed from two cameras; returns pixel correspondences."""
    if planar:
        pts = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), np.full(n, 4.0)], axis=-1
        )
    else:
        pts = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3.0, 8.0, n)],
            axis=-1,
        ).astype(np.float32)
    r = np.asarray(geo.so3_exp(jnp.asarray(np.array(rotvec, np.float32))))
    t = np.array(translation, np.float32)

    def project(p):
        uvw = p @ K.T
        return uvw[:, :2] / uvw[:, 2:3]

    uv1 = project(pts)
    pts2 = pts @ r.T + t
    uv2 = project(pts2)
    vis = (pts[:, 2] > 0.1) & (pts2[:, 2] > 0.1)
    inb = (
        (uv1 > 0).all(-1) & (uv1 < [640, 480]).all(-1) & (uv2 > 0).all(-1) & (uv2 < [640, 480]).all(-1)
    )
    return pts, uv1.astype(np.float32), uv2.astype(np.float32), (vis & inb), r, t


def run_init(uv1, uv2, mask, noise_px=0.5, seed=0, outlier_frac=0.0):
    rng = np.random.default_rng(seed + 100)
    uv1 = uv1 + rng.normal(0, noise_px, uv1.shape)
    uv2 = uv2 + rng.normal(0, noise_px, uv2.shape)
    n_out = int(outlier_frac * len(uv1))
    if n_out:
        idx = rng.choice(len(uv1), n_out, replace=False)
        uv2[idx] = rng.uniform([0, 0], [640, 480], size=(n_out, 2))
    return twoview.initialize_two_view(
        jax.random.PRNGKey(seed),
        jnp.asarray(uv1, jnp.float32),
        jnp.asarray(uv2, jnp.float32),
        jnp.asarray(mask),
        jnp.asarray(K),
    )


def check_pose(res, r_gt, t_gt, tol_rot=0.02, tol_dir=0.05):
    r_est = np.asarray(res.t21[:3, :3])
    t_est = np.asarray(res.t21[:3, 3])
    dr = np.asarray(geo.so3_log(jnp.asarray(r_est @ r_gt.T)))
    assert np.linalg.norm(dr) < tol_rot, f"rotation error {np.linalg.norm(dr)}"
    # translation up to scale
    t_dir = t_est / np.linalg.norm(t_est)
    t_gt_dir = t_gt / np.linalg.norm(t_gt)
    assert np.linalg.norm(t_dir - t_gt_dir) < tol_dir, f"translation dir {t_dir} vs {t_gt_dir}"


def test_init_general_scene(rng):
    pts, uv1, uv2, mask, r, t = make_scene(rng)
    res = run_init(uv1, uv2, mask)
    assert bool(res.success), f"init failed, inliers={int(res.n_inliers)}"
    assert not bool(res.used_homography)
    check_pose(res, r, t)
    # triangulated structure should match GT up to scale
    tri = np.asarray(res.points)
    ok = np.asarray(res.is_triangulated)
    scale = np.median(tri[ok][:, 2] / pts[ok][:, 2])
    err = np.linalg.norm(tri[ok] / scale - pts[ok], axis=-1)
    # expected depth sigma from 0.5px noise at f=500, depth 3-8m is ~0.07m
    assert np.median(err) < 0.12, f"median structure error {np.median(err)}"


def test_init_planar_scene_uses_homography(rng):
    pts, uv1, uv2, mask, r, t = make_scene(rng, planar=True, translation=(0.6, 0.0, 0.05))
    res = run_init(uv1, uv2, mask)
    assert bool(res.success), f"init failed, inliers={int(res.n_inliers)}"
    assert bool(res.used_homography)
    check_pose(res, r, t, tol_rot=0.03, tol_dir=0.1)


def test_init_with_outliers(rng):
    pts, uv1, uv2, mask, r, t = make_scene(rng, n=300)
    res = run_init(uv1, uv2, mask, outlier_frac=0.25)
    assert bool(res.success)
    check_pose(res, r, t, tol_rot=0.03, tol_dir=0.1)


def test_init_rejects_pure_rotation(rng):
    # No parallax -> must not claim success
    pts, uv1, uv2, mask, r, t = make_scene(rng, translation=(0.0, 0.0, 0.0), rotvec=(0.0, 0.15, 0.0))
    res = run_init(uv1, uv2, mask)
    assert not bool(res.success)


def test_triangulate_exact(rng):
    pts, uv1, uv2, mask, r, t = make_scene(rng, n=50)
    kinv = np.linalg.inv(K)

    def norm(uv):
        x = np.concatenate([uv, np.ones((len(uv), 1))], -1) @ kinv.T
        return (x[:, :2] / x[:, 2:3]).astype(np.float32)

    p1 = jnp.asarray(np.concatenate([np.eye(3), np.zeros((3, 1))], 1), jnp.float32)
    p2 = jnp.asarray(np.concatenate([r, t[:, None]], 1), jnp.float32)
    tri = np.asarray(twoview.triangulate(p1, p2, jnp.asarray(norm(uv1)), jnp.asarray(norm(uv2))))
    np.testing.assert_allclose(tri, pts, atol=5e-2)
