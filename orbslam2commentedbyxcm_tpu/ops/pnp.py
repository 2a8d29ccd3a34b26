"""Batched RANSAC PnP: camera pose from 3D-2D correspondences.

Fills the role of the reference PnPsolver (src/PnPsolver.cc — EPnP inside an
adaptive RANSAC loop, used by Tracking::Relocalization). Two solvers, both
TPU-first (every RANSAC hypothesis is a vmapped lane; no sequential
hypothesis loop):

  * `ransac_epnp` — full EPnP (reference compute_pose, src/PnPsolver.cc:644):
    PCA control points (:775), barycentric coordinates (:797), null space of
    the 12x12 M^T M (:818), the three beta-approximation cases
    (find_betas_approx_1/2/3, :860-948) each polished by Gauss–Newton on the
    six control-point distance constraints (gauss_newton, :1035), Horn
    alignment for [R|t] (estimate_R_and_t, :1115), best case by reprojection
    error. The winner is re-solved on its consensus set (reference Refine,
    :326) and rescored with the scale-aware chi2 gate (CheckInliers, :381).

  * `ransac_pnp` — a 6-point DLT alternative: SVD null space of the 12-unknown
    projection system, Procrustes re-orthogonalization, cheirality sign fix.
    Cheaper per hypothesis; used when correspondence count is high.

Final polishing happens in ops/optim.pose_optimization at the call site.
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


# ---------------------------------------------------------------------------
# EPnP (Lepetit et al.) — reference PnPsolver::compute_pose parity
# ---------------------------------------------------------------------------

# the 6 control-point pairs of the distance constraints (ref compute_rho :1013)
_PAIRS_A = jnp.array([0, 0, 0, 1, 1, 2], jnp.int32)
_PAIRS_B = jnp.array([1, 2, 3, 2, 3, 3], jnp.int32)


def _beta_products(betas: jnp.ndarray) -> jnp.ndarray:
    """[b1..b4] -> the 10 quadratic monomials in the reference's L_6x10 column
    order [B11 B12 B22 B13 B23 B33 B14 B24 B34 B44] (compute_L_6x10 :986)."""
    b1, b2, b3, b4 = betas[0], betas[1], betas[2], betas[3]
    return jnp.stack([
        b1 * b1, b1 * b2, b2 * b2, b1 * b3, b2 * b3,
        b3 * b3, b1 * b4, b2 * b4, b3 * b4, b4 * b4,
    ])


def _lstsq_nrm(a: jnp.ndarray, b: jnp.ndarray, reg: float = 1e-9) -> jnp.ndarray:
    """Small least-squares via regularized normal equations (qr_solve :1268
    stand-in; shapes here are <= 6x5 so normal equations are exact enough)."""
    ata = a.T @ a + reg * jnp.eye(a.shape[1], dtype=a.dtype)
    return jnp.linalg.solve(ata, a.T @ b)


def _gauss_newton_betas(l_6x10: jnp.ndarray, rho: jnp.ndarray, betas: jnp.ndarray,
                        iters: int = 5) -> jnp.ndarray:
    """Refine betas on the 6 distance constraints (ref gauss_newton :1035)."""

    def resid(b):
        return l_6x10 @ _beta_products(b) - rho

    def step(b, _):
        j = jax.jacfwd(resid)(b)            # (6, 4)
        db = _lstsq_nrm(j, -resid(b))
        return b + db, None

    betas, _ = jax.lax.scan(step, betas, None, length=iters)
    return betas


def _horn_rt(pw: jnp.ndarray, pc: jnp.ndarray, w: jnp.ndarray):
    """Weighted absolute orientation, no scale: pc ~= R pw + t
    (ref estimate_R_and_t :1115)."""
    ws = jnp.maximum(jnp.sum(w), 1e-9)
    cw = jnp.sum(w[:, None] * pw, axis=0) / ws
    cc = jnp.sum(w[:, None] * pc, axis=0) / ws
    h = ((pc - cc) * w[:, None]).T @ (pw - cw)   # (3, 3)
    u, _, vt = jnp.linalg.svd(h)
    d = jnp.linalg.det(u @ vt)
    r = u @ jnp.diag(jnp.array([1.0, 1.0, 1.0], h.dtype)).at[2, 2].set(d) @ vt
    t = cc - r @ cw
    return r, t


def _epnp_pose(pts3d: jnp.ndarray, uvn: jnp.ndarray, w: jnp.ndarray):
    """EPnP on weighted correspondences in normalized camera coords.

    pts3d (m, 3), uvn (m, 2), w (m,) row weights (0 drops a correspondence).
    Returns (r, t, err) with err = weighted mean squared reprojection error in
    normalized coords (ref reprojection_error :1097). All shapes static, so
    this vmaps across RANSAC hypotheses.
    """
    ws = jnp.maximum(jnp.sum(w), 1e-9)

    # control points: centroid + PCA axes (ref choose_control_points :775)
    c0 = jnp.sum(w[:, None] * pts3d, axis=0) / ws
    a0 = pts3d - c0
    cov = (a0 * w[:, None]).T @ a0 / ws
    evals, evecs = jnp.linalg.eigh(cov)          # ascending
    sig = jnp.sqrt(jnp.maximum(evals, 1e-12))
    cws = jnp.concatenate([c0[None, :], c0[None, :] + (evecs * sig[None, :]).T], axis=0)

    # barycentric coordinates (ref compute_barycentric_coordinates :797)
    cc_m = (cws[1:] - cws[0]).T                  # (3, 3) columns = c1-c0 ...
    cc_inv = jnp.linalg.inv(cc_m + 1e-12 * jnp.eye(3, dtype=cc_m.dtype))
    a123 = (pts3d - cws[0]) @ cc_inv.T           # (m, 3)
    alphas = jnp.concatenate([1.0 - jnp.sum(a123, -1, keepdims=True), a123], -1)

    # M^T M null space (ref fill_M :818 + SVD of MtM :698-704); normalized
    # coords make fu=fv=1, uc=vc=0
    u_, v_ = uvn[:, 0], uvn[:, 1]
    one = jnp.ones_like(u_)
    zero = jnp.zeros_like(u_)
    row_u = (alphas[:, :, None] * jnp.stack([one, zero, -u_], -1)[:, None, :]).reshape(-1, 12)
    row_v = (alphas[:, :, None] * jnp.stack([zero, one, -v_], -1)[:, None, :]).reshape(-1, 12)
    m_mat = jnp.concatenate([row_u * w[:, None], row_v * w[:, None]], axis=0)
    # SVD of M rather than eigh(M^T M): same null space (ref :698-704) but
    # avoids squaring the condition number, which matters in float32
    _, _, m_vt = jnp.linalg.svd(m_mat, full_matrices=True)
    v4 = m_vt[::-1][:4].T                        # 4 smallest: betas order b1..b4

    # distance constraints (ref compute_L_6x10 :986 / compute_rho :1013)
    vks = v4.T.reshape(4, 4, 3)                  # (beta k, control point, xyz)
    dv = vks[:, _PAIRS_A, :] - vks[:, _PAIRS_B, :]   # (4, 6, 3)
    dot = jnp.einsum("kpx,lpx->pkl", dv, dv)     # (6, 4, 4)
    l_6x10 = jnp.stack([
        dot[:, 0, 0], 2 * dot[:, 0, 1], dot[:, 1, 1], 2 * dot[:, 0, 2],
        2 * dot[:, 1, 2], dot[:, 2, 2], 2 * dot[:, 0, 3], 2 * dot[:, 1, 3],
        2 * dot[:, 2, 3], dot[:, 3, 3],
    ], axis=1)
    dcw = cws[_PAIRS_A] - cws[_PAIRS_B]
    rho = jnp.sum(dcw * dcw, axis=-1)            # (6,)

    # beta initializations, cases N=1/2/3 (ref find_betas_approx_1/2/3)
    b4 = _lstsq_nrm(l_6x10[:, jnp.array([0, 1, 3, 6])], rho)
    s1 = jnp.sign(b4[0]) + (b4[0] == 0)
    beta1 = jnp.sqrt(jnp.abs(b4[0]))
    betas_c1 = jnp.stack([beta1, s1 * b4[1] / jnp.maximum(beta1, 1e-9),
                          s1 * b4[2] / jnp.maximum(beta1, 1e-9),
                          s1 * b4[3] / jnp.maximum(beta1, 1e-9)])
    b3 = _lstsq_nrm(l_6x10[:, jnp.array([0, 1, 2])], rho)
    bb1 = jnp.sqrt(jnp.abs(b3[0]))
    bb2 = jnp.sqrt(jnp.abs(b3[2])) * jnp.where(b3[0] * b3[2] > 0, 1.0, 0.0)
    betas_c2 = jnp.stack([bb1, jnp.sign(b3[1]) * bb2, jnp.zeros(()), jnp.zeros(())])
    b5 = _lstsq_nrm(l_6x10[:, jnp.array([0, 1, 2, 3, 4])], rho)
    cb1 = jnp.sqrt(jnp.abs(b5[0]))
    cb2 = jnp.sqrt(jnp.abs(b5[2])) * jnp.where(b5[0] * b5[2] > 0, 1.0, 0.0)
    cb2 = jnp.sign(b5[1]) * cb2
    betas_c3 = jnp.stack([cb1, cb2, b5[3] / jnp.maximum(cb1, 1e-9), jnp.zeros(())])

    def pose_from_betas(betas):
        betas = _gauss_newton_betas(l_6x10, rho, betas)
        x = v4 @ betas                           # (12,)
        ccs = x.reshape(4, 3)
        pcs = alphas @ ccs                       # (m, 3)
        # cheirality: weighted majority of depths positive (ref solve_for_sign)
        flip = jnp.sum(w * jnp.sign(pcs[:, 2])) < 0
        pcs = jnp.where(flip, -pcs, pcs)
        r, t = _horn_rt(pts3d, pcs, w)
        pc = pts3d @ r.T + t
        z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
        e2 = jnp.sum((pc[:, :2] / z[:, None] - uvn) ** 2, axis=-1)
        err = jnp.sum(w * e2) / ws
        err = jnp.where(jnp.isfinite(err), err, jnp.inf)
        return r, t, err

    rs, ts, errs = jax.vmap(pose_from_betas)(
        jnp.stack([betas_c1, betas_c2, betas_c3])
    )
    best = jnp.argmin(errs)
    return rs[best], ts[best], errs[best]


@functools.partial(
    jax.jit, static_argnames=("n_hypotheses", "chi2_th", "min_inliers")
)
def ransac_epnp(
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
    """EPnP inside batched RANSAC: every hypothesis is a 6-point EPnP lane,
    scored on all correspondences with the scale-aware chi2 gate; the winner
    is re-solved by EPnP on its full consensus set (reference Refine :326)
    twice.

    The reference samples 4 points per iteration (SetRansacParameters :141);
    at that minimal size EPnP's beta cases have spurious basins (the 12x8
    system leaves a rank-4 kernel) even in double precision, which the
    reference tolerates by running up to 300 sequential adaptive iterations.
    Here hypotheses are free in parallel, so each lane uses 6 points —
    the kernel collapses to rank 1 and case-1 Gauss-Newton is well-posed."""
    n = pts3d.shape[0]
    kinv = jnp.linalg.inv(k_mat)
    uv1 = jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)
    uvn = (uv1 @ kinv.T)[..., :2]

    probs = mask.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    samples = jax.random.choice(key, n, shape=(n_hypotheses, 6), p=probs)

    def solve_one(idx):
        r, t, _ = _epnp_pose(pts3d[idx], uvn[idx], jnp.ones(6, jnp.float32))
        return r, t

    rs, ts = jax.vmap(solve_one)(samples)

    def score_one(r, t):
        pc = pts3d @ r.T + t
        z = jnp.where(pc[..., 2] < 1e-6, 1e-6, pc[..., 2])
        u_px = k_mat[0, 0] * pc[..., 0] / z + k_mat[0, 2]
        v_px = k_mat[1, 1] * pc[..., 1] / z + k_mat[1, 2]
        e2 = (u_px - uv[..., 0]) ** 2 + (v_px - uv[..., 1]) ** 2
        ok = (e2 / sigma2 < chi2_th) & (pc[..., 2] > 0) & mask
        ok = ok & jnp.all(jnp.isfinite(r)) & jnp.all(jnp.isfinite(t))
        return jnp.sum(ok), ok

    counts, inl = jax.vmap(score_one)(rs, ts)
    best = jnp.argmax(counts)
    best_inl = inl[best]

    def refine(carry, _):
        inliers, r, t = carry
        r2, t2, _ = _epnp_pose(pts3d, uvn, inliers.astype(jnp.float32))
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
