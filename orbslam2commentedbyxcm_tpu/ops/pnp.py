"""Batched RANSAC PnP: camera pose from 3D-2D correspondences.

Fills the role of the reference PnPsolver (src/PnPsolver.cc — EPnP inside an
adaptive RANSAC loop, used by Tracking::Relocalization). TPU-first design:
instead of EPnP's control-point machinery in a sequential hypothesis loop,
every RANSAC hypothesis is a lane of a vmapped 6-point DLT:

    each hypothesis solves P = [R|t] from 6 correspondences by SVD null
    space (12 unknowns, 12 equations), re-orthogonalizes R by Procrustes,
    fixes scale/sign by cheirality, and is scored on all correspondences
    with the scale-aware chi2 gate (reference CheckInliers, :381).

The winner is refined by least squares on its consensus set (same spirit as
reference Refine, :326); final polishing happens in ops/optim
.pose_optimization at the call site.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2commentedbyxcm_tpu.utils.geometry import rt_to_se3


def _dlt_pose(pts3d: jnp.ndarray, uvn: jnp.ndarray, row_weight: jnp.ndarray | None = None):
    """[R|t] from >= 6 points via DLT in normalized camera coords.

    pts3d (m, 3), uvn (m, 2) -> (3, 3), (3,). `row_weight` (m,) weights whole
    equation rows (0 removes a correspondence) — weighting must happen at the
    row level because the DLT rows are bilinear in (pts3d, uvn).
    """
    x, y, z = pts3d[..., 0], pts3d[..., 1], pts3d[..., 2]
    u, v = uvn[..., 0], uvn[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r1 = jnp.stack([x, y, z, one, zero, zero, zero, zero, -u * x, -u * y, -u * z, -u], axis=-1)
    r2 = jnp.stack([zero, zero, zero, zero, x, y, z, one, -v * x, -v * y, -v * z, -v], axis=-1)
    if row_weight is not None:
        r1 = r1 * row_weight[..., None]
        r2 = r2 * row_weight[..., None]
    a = jnp.concatenate([r1, r2], axis=-2)
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    p = vt[..., -1, :].reshape(3, 4)
    m = p[:, :3]
    # Procrustes: nearest rotation to m (up to scale), det +1
    u_, s_, vt_ = jnp.linalg.svd(m)
    d = jnp.linalg.det(u_ @ vt_)
    fix = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(d)
    r = u_ @ fix @ vt_
    scale = jnp.sum(s_ * jnp.array([1.0, 1.0, d])) / 3.0
    t = p[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    # cheirality: majority of points must be in front
    pc_z = pts3d @ r[2] + t[2]
    flip = jnp.sum(jnp.sign(pc_z)) < 0
    r = jnp.where(flip, -r, r)
    t = jnp.where(flip, -t, t)
    # re-fix determinant after flip (-R has det -1)
    u2, _, vt2 = jnp.linalg.svd(r)
    d2 = jnp.linalg.det(u2 @ vt2)
    r = u2 @ jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(d2) @ vt2
    return r, t


class PnPResult(NamedTuple):
    t_cw: jnp.ndarray      # (4, 4)
    inliers: jnp.ndarray   # (N,) bool
    n_inliers: jnp.ndarray
    success: jnp.ndarray


@functools.partial(
    jax.jit, static_argnames=("n_hypotheses", "chi2_th", "min_inliers")
)
def ransac_pnp(
    key: jax.Array,
    pts3d: jnp.ndarray,      # (N, 3) world points
    uv: jnp.ndarray,         # (N, 2) pixel observations
    mask: jnp.ndarray,       # (N,) valid correspondences
    k_mat: jnp.ndarray,      # (3, 3)
    sigma2: jnp.ndarray,     # (N,) per-obs sigma^2 (px^2, scale-aware)
    n_hypotheses: int = 256,
    chi2_th: float = 5.991,
    min_inliers: int = 10,
) -> PnPResult:
    n = pts3d.shape[0]
    kinv = jnp.linalg.inv(k_mat)
    uv1 = jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)
    uvn = (uv1 @ kinv.T)[..., :2]

    probs = mask.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    samples = jax.random.choice(key, n, shape=(n_hypotheses, 6), p=probs)

    def solve_one(idx):
        return _dlt_pose(pts3d[idx], uvn[idx])

    rs, ts = jax.vmap(solve_one)(samples)

    def score_one(r, t):
        pc = pts3d @ r.T + t
        z = jnp.where(pc[..., 2] < 1e-6, 1e-6, pc[..., 2])
        u_px = k_mat[0, 0] * pc[..., 0] / z + k_mat[0, 2]
        v_px = k_mat[1, 1] * pc[..., 1] / z + k_mat[1, 2]
        e2 = (u_px - uv[..., 0]) ** 2 + (v_px - uv[..., 1]) ** 2
        ok = (e2 / sigma2 < chi2_th) & (pc[..., 2] > 0) & mask
        return jnp.sum(ok), ok

    counts, inl = jax.vmap(score_one)(rs, ts)
    best = jnp.argmax(counts)
    best_inl = inl[best]

    # consensus refinement: weighted DLT on all inliers, then rescore (x2)
    def refine(carry, _):
        inliers, r, t = carry
        r2, t2 = _dlt_pose(pts3d, uvn, row_weight=inliers.astype(jnp.float32))
        cnt2, inl2 = score_one(r2, t2)
        better = cnt2 >= jnp.sum(inliers)
        r = jnp.where(better, r2, r)
        t = jnp.where(better, t2, t)
        inliers = jnp.where(better, inl2, inliers)
        return (inliers, r, t), None

    (best_inl, r_fin, t_fin), _ = jax.lax.scan(
        refine, (best_inl, rs[best], ts[best]), None, length=2
    )
    n_inl = jnp.sum(best_inl)
    return PnPResult(
        t_cw=rt_to_se3(r_fin, t_fin),
        inliers=best_inl,
        n_inliers=n_inl,
        success=n_inl >= min_inliers,
    )
