import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2commentedbyxcm_tpu.utils import geometry as geo
from orbslam2commentedbyxcm_tpu.utils.camera import Camera


def random_rotations(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(geo.quat_to_rot(jnp.asarray(q, dtype=jnp.float32)))


def sample_rotvec(rng, n, max_angle=3.0):
    # log∘exp is identity only inside the |phi| < pi injectivity ball.
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return (d * rng.uniform(0.0, max_angle, size=(n, 1))).astype(np.float32)


def test_so3_exp_log_roundtrip(rng):
    phi = sample_rotvec(rng, 64)
    r = geo.so3_exp(jnp.asarray(phi))
    # valid rotation matrices
    eye = jnp.eye(3)
    np.testing.assert_allclose(np.asarray(r @ jnp.swapaxes(r, -1, -2)), np.tile(eye, (64, 1, 1)), atol=1e-5)
    phi2 = np.asarray(geo.so3_log(r))
    np.testing.assert_allclose(phi2, phi, atol=2e-4)


def test_so3_small_angle(rng):
    phi = (rng.normal(size=(16, 3)) * 1e-6).astype(np.float32)
    r = geo.so3_exp(jnp.asarray(phi))
    np.testing.assert_allclose(np.asarray(geo.so3_log(r)), phi, atol=1e-7)


def test_se3_exp_log_roundtrip(rng):
    xi = np.concatenate(
        [rng.uniform(-1.5, 1.5, size=(32, 3)).astype(np.float32), sample_rotvec(rng, 32, 2.8)],
        axis=-1,
    )
    t = geo.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(geo.se3_log(t))
    np.testing.assert_allclose(xi2, xi, atol=3e-4)


def test_se3_inverse_compose(rng):
    xi = rng.uniform(-1.0, 1.0, size=(8, 6)).astype(np.float32)
    t = geo.se3_exp(jnp.asarray(xi))
    ti = geo.se3_inverse(t)
    np.testing.assert_allclose(np.asarray(t @ ti), np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)


def test_quat_roundtrip(rng):
    r = random_rotations(rng, 128)
    q = geo.rot_to_quat(jnp.asarray(r))
    r2 = np.asarray(geo.quat_to_rot(q))
    np.testing.assert_allclose(r2, r, atol=1e-5)


def test_quat_near_pi():
    # Rotation by ~pi around x — the degenerate case for naive trace method.
    phi = jnp.array([[np.pi - 1e-4, 0.0, 0.0]], dtype=jnp.float32)
    r = geo.so3_exp(phi)
    phi2 = np.asarray(geo.so3_log(r))
    np.testing.assert_allclose(phi2, np.asarray(phi), atol=1e-3)


def test_sim3_exp_properties(rng):
    xi = rng.uniform(-0.5, 0.5, size=(16, 7)).astype(np.float32)
    m = geo.sim3_exp(jnp.asarray(xi))
    s = np.asarray(geo.sim3_scale(m))
    np.testing.assert_allclose(s, np.exp(xi[:, 6]), rtol=1e-4)
    r = np.asarray(geo.sim3_rot(m))
    np.testing.assert_allclose(r @ np.swapaxes(r, -1, -2), np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    # sigma=0, phi=0 reduces to translation
    xi0 = np.zeros((1, 7), dtype=np.float32)
    xi0[0, :3] = [1.0, 2.0, 3.0]
    m0 = np.asarray(geo.sim3_exp(jnp.asarray(xi0)))
    np.testing.assert_allclose(m0[0, :3, 3], [1, 2, 3], atol=1e-5)
    np.testing.assert_allclose(m0[0, :3, :3], np.eye(3), atol=1e-5)


def test_sim3_inverse(rng):
    xi = rng.uniform(-0.5, 0.5, size=(8, 7)).astype(np.float32)
    m = geo.sim3_exp(jnp.asarray(xi))
    mi = geo.sim3_inverse(m)
    np.testing.assert_allclose(np.asarray(m @ mi), np.tile(np.eye(4), (8, 1, 1)), atol=1e-4)


def test_sim3_exp_matches_matrix_exponential(rng):
    """Pin sim3_exp to expm of the 4x4 generator — the closed-form W
    coefficients are easy to get wrong in a way log/exp roundtrips hide."""
    import scipy.linalg as sla

    for scale in (1.0, 0.1, 0.01, 1e-4):
        xi = (rng.normal(0, scale, size=(20, 7))).astype(np.float32)
        ours = np.asarray(geo.sim3_exp(jnp.asarray(xi)))
        for i in range(20):
            a = np.zeros((4, 4))
            a[:3, :3] = np.asarray(geo.hat(jnp.asarray(xi[i, 3:6]))) + xi[i, 6] * np.eye(3)
            a[:3, 3] = xi[i, :3]
            np.testing.assert_allclose(ours[i], sla.expm(a), atol=5e-5)


def test_sim3_pure_scale():
    xi = jnp.array([[0, 0, 0, 0, 0, 0, np.log(2.0)]], dtype=jnp.float32)
    m = np.asarray(geo.sim3_exp(xi))
    np.testing.assert_allclose(m[0, :3, :3], 2.0 * np.eye(3), atol=1e-5)


def test_camera_undistort_roundtrip():
    cam = Camera(fx=517.3, fy=516.5, cx=318.6, cy=255.3, k1=0.26, k2=-0.95, p1=-0.005, p2=0.003, k3=1.16)
    rng = np.random.default_rng(1)
    # ground-truth undistorted pixels, distort them, then undo
    xy = rng.uniform(-0.4, 0.4, size=(256, 2)).astype(np.float32)
    dist = np.asarray(cam.distort_normalized(jnp.asarray(xy)))
    uv_dist = np.stack([cam.fx * dist[:, 0] + cam.cx, cam.fy * dist[:, 1] + cam.cy], axis=-1)
    uv_und = np.asarray(cam.undistort_points(jnp.asarray(uv_dist), iters=12))
    uv_expected = np.stack([cam.fx * xy[:, 0] + cam.cx, cam.fy * xy[:, 1] + cam.cy], axis=-1)
    np.testing.assert_allclose(uv_und, uv_expected, atol=0.05)


def test_camera_undistort_matches_opencv():
    cv2 = pytest.importorskip("cv2")
    cam = Camera(fx=517.3, fy=516.5, cx=318.6, cy=255.3, k1=0.26, k2=-0.95, p1=-0.005, p2=0.003, k3=1.16)
    rng = np.random.default_rng(2)
    uv = rng.uniform([50, 50], [590, 430], size=(200, 2)).astype(np.float32)
    ours = np.asarray(cam.undistort_points(jnp.asarray(uv), iters=12))
    dist = np.array([cam.k1, cam.k2, cam.p1, cam.p2, cam.k3], dtype=np.float32)
    theirs = cv2.undistortPoints(uv.reshape(-1, 1, 2), cam.K, dist, P=cam.K).reshape(-1, 2)
    np.testing.assert_allclose(ours, theirs, atol=0.1)


def test_camera_project_backproject():
    cam = Camera(fx=500, fy=500, cx=320, cy=240, bf=40.0)
    pts = jnp.array([[0.5, -0.2, 2.0], [1.0, 1.0, 5.0]], dtype=jnp.float32)
    uv = cam.project(pts)
    back = np.asarray(cam.backproject(uv, pts[:, 2]))
    np.testing.assert_allclose(back, np.asarray(pts), atol=1e-4)
    uvr = np.asarray(cam.project_stereo(pts))
    assert uvr.shape == (2, 3)
    np.testing.assert_allclose(uvr[:, 2], uvr[:, 0] - 40.0 / np.asarray(pts)[:, 2], atol=1e-4)


def test_jit_and_vmap_compose():
    f = jax.jit(lambda xi: geo.se3_log(geo.se3_exp(xi)))
    xi = jnp.ones((4, 6), dtype=jnp.float32) * 0.1
    np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(xi), atol=1e-5)
