"""Sim3 estimation: Horn closed-form absolute orientation in batched RANSAC.

Replaces the reference Sim3Solver (src/Sim3Solver.cc): ComputeSim3 (:298-438)
implements Horn's quaternion method from 3-point sets; iterate (:188-275)
wraps it in RANSAC with a bidirectional reprojection inlier check. Here every
RANSAC hypothesis (a 3-point minimal sample) is a vmap lane; the quaternion
comes from the eigenvector of the 4x4 N matrix computed with one batched
jnp.linalg.eigh.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2commentedbyxcm_tpu.utils.geometry import quat_to_rot, sim3_make


def horn_sim3(p1: jnp.ndarray, p2: jnp.ndarray, fix_scale: bool = False):
    """Closed-form similarity p2 ~ s R p1 + t from paired points (..., m, 3).

    Horn 1987 via the quaternion eigen-decomposition (reference ComputeSim3).
    """
    c1 = jnp.mean(p1, axis=-2, keepdims=True)
    c2 = jnp.mean(p2, axis=-2, keepdims=True)
    q1 = p1 - c1
    q2 = p2 - c2
    # N-matrix convention: m = sum_m a_i b_j yields R mapping a -> b;
    # here a = q1, b = q2 so the result maps p1 -> p2.
    m = jnp.einsum("...mi,...mj->...ij", q1, q2)
    sxx, sxy, sxz = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    syx, syy, syz = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    szx, szy, szz = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    n = jnp.stack(
        [
            jnp.stack([sxx + syy + szz, syz - szy, szx - sxz, sxy - syx], axis=-1),
            jnp.stack([syz - szy, sxx - syy - szz, sxy + syx, szx + sxz], axis=-1),
            jnp.stack([szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy], axis=-1),
            jnp.stack([sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz], axis=-1),
        ],
        axis=-2,
    )
    w, v = jnp.linalg.eigh(n)
    q = v[..., :, -1]  # largest eigenvalue -> quaternion (w, x, y, z)
    r = quat_to_rot(q)
    if fix_scale:
        s = jnp.ones(p1.shape[:-2])
    else:
        # Horn symmetric scale: s = sqrt(sum|q2|^2 / sum|q1|^2)
        s = jnp.sqrt(
            jnp.sum(q2 * q2, axis=(-1, -2)) / jnp.maximum(jnp.sum(q1 * q1, axis=(-1, -2)), 1e-12)
        )
    t = c2[..., 0, :] - s[..., None] * jnp.einsum("...ij,...j->...i", r, c1[..., 0, :])
    return r, t, s


class Sim3Result(NamedTuple):
    s12: jnp.ndarray       # (4, 4) [sR t; 0 1] mapping frame-2 coords -> frame-1
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray
    success: jnp.ndarray


@functools.partial(
    jax.jit, static_argnames=("fix_scale", "n_hypotheses", "chi2_th", "min_inliers")
)
def ransac_sim3(
    key: jax.Array,
    pts1_cam: jnp.ndarray,   # (N, 3) matched points in KF1 camera frame
    pts2_cam: jnp.ndarray,   # (N, 3) same points in KF2 camera frame
    mask: jnp.ndarray,
    k_mat: jnp.ndarray,
    sigma2_1: jnp.ndarray,   # (N,) px^2 per match in image 1
    sigma2_2: jnp.ndarray,
    fix_scale: bool = False,
    n_hypotheses: int = 128,
    chi2_th: float = 9.21,   # reference: th = 9.210 * sigma^2 (2 dof, 99%)
    min_inliers: int = 20,
) -> Sim3Result:
    """Relative Sim3 between two keyframes from mutually matched map points
    (reference Sim3Solver::iterate). Returns S12 with p1 = S12 * p2."""
    n = pts1_cam.shape[0]
    probs = mask.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    samples = jax.random.choice(key, n, shape=(n_hypotheses, 3), p=probs)

    # hypotheses map 2 -> 1
    r_all, t_all, s_all = horn_sim3(pts2_cam[samples], pts1_cam[samples], fix_scale)

    fx, fy, cx, cy = k_mat[0, 0], k_mat[1, 1], k_mat[0, 2], k_mat[1, 2]

    def project(p):
        z = jnp.where(p[..., 2] < 1e-6, 1e-6, p[..., 2])
        return jnp.stack([fx * p[..., 0] / z + cx, fy * p[..., 1] / z + cy], axis=-1)

    uv1_obs = project(pts1_cam)
    uv2_obs = project(pts2_cam)

    def score(r, t, s):
        # bidirectional: project p2 through S12 into image 1, p1 through S21 into image 2
        p2_in_1 = s * (pts2_cam @ r.T) + t
        e1 = jnp.sum((project(p2_in_1) - uv1_obs) ** 2, axis=-1)
        p1_in_2 = ((pts1_cam - t) @ r) / s  # S12^-1 p1 = R^T (p1 - t) / s
        e2 = jnp.sum((project(p1_in_2) - uv2_obs) ** 2, axis=-1)
        ok = (e1 < chi2_th * sigma2_1) & (e2 < chi2_th * sigma2_2) & mask
        return jnp.sum(ok), ok

    counts, inls = jax.vmap(score)(r_all, t_all, s_all)
    best = jnp.argmax(counts)

    # refine with Horn on the consensus set (weighted by inlier mask)
    def refine(carry, _):
        inliers, r, t, s = carry
        w = inliers.astype(jnp.float32)
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        c2 = jnp.sum(pts2_cam * w[:, None], axis=0) / wsum
        c1 = jnp.sum(pts1_cam * w[:, None], axis=0) / wsum
        # Weighted Horn: subtract weighted centroids, weight the correlation
        q2 = (pts2_cam - c2) * w[:, None]
        q1 = (pts1_cam - c1) * w[:, None]
        # weighted N matrix mapping 2 -> 1 (a = q2, b = q1)
        m = q2.T @ (pts1_cam - c1)
        sxx, sxy, sxz = m[0, 0], m[0, 1], m[0, 2]
        syx, syy, syz = m[1, 0], m[1, 1], m[1, 2]
        szx, szy, szz = m[2, 0], m[2, 1], m[2, 2]
        nmat = jnp.array(
            [
                [sxx + syy + szz, syz - szy, szx - sxz, sxy - syx],
                [syz - szy, sxx - syy - szz, sxy + syx, szx + sxz],
                [szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy],
                [sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz],
            ]
        )
        _, v = jnp.linalg.eigh(nmat)
        r2 = quat_to_rot(v[:, -1])
        if fix_scale:
            s2 = 1.0
        else:
            num = jnp.sum(((pts1_cam - c1) * w[:, None]) ** 2)
            den = jnp.maximum(jnp.sum(((pts2_cam - c2) * w[:, None]) ** 2), 1e-12)
            s2 = jnp.sqrt(num / den)
        t2 = c1 - s2 * (r2 @ c2)
        cnt2, inl2 = score(r2, t2, s2)
        better = cnt2 >= jnp.sum(inliers)
        r = jnp.where(better, r2, r)
        t = jnp.where(better, t2, t)
        s = jnp.where(better, s2, s)
        inliers = jnp.where(better, inl2, inliers)
        return (inliers, r, t, s), None

    (inliers, r_f, t_f, s_f), _ = jax.lax.scan(
        refine, (inls[best], r_all[best], t_all[best], s_all[best]), None, length=2
    )
    n_inl = jnp.sum(inliers)
    return Sim3Result(
        s12=sim3_make(r_f, t_f, s_f),
        inliers=inliers,
        n_inliers=n_inl,
        success=n_inl >= min_inliers,
    )


# ---------------------------------------------------------------------------
# Sim3-guided mutual match growing (ORBmatcher::SearchBySim3)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_levels",))
def search_by_sim3(
    s12: jnp.ndarray,        # (4, 4) Sim3 mapping cam2 coords -> cam1 coords
    pts1: jnp.ndarray,       # (M, 3) map points of KF1 features, in cam1 frame
    pdesc1: jnp.ndarray,     # (M, 8) point descriptors
    dmax1: jnp.ndarray,      # (M,) scale-invariance max distance
    uv1: jnp.ndarray,        # (M, 2) KF1 feature pixels (candidate targets)
    fdesc1: jnp.ndarray,     # (M, 8) KF1 feature descriptors
    lvl1: jnp.ndarray,       # (M,) KF1 feature octaves
    mask1: jnp.ndarray,      # (M,) row has a valid point
    already1: jnp.ndarray,   # (M,) feature already matched (skip as source)
    pts2, pdesc2, dmax2, uv2, fdesc2, lvl2, mask2, already2,  # same for KF2
    k_mat: jnp.ndarray,
    width: float, height: float,
    log_scale: float,
    n_levels: int,
    th: float = 7.5,         # search radius factor (reference LoopClosing.cc:344)
    max_dist: float = 100.0,  # TH_HIGH (reference :1492)
):
    """Mutual Sim3-guided projection matching between two keyframes' map
    points (ORBmatcher::SearchBySim3, src/ORBmatcher.cc:1361): project KF1's
    points into KF2 through S21 and KF2's into KF1 through S12, window-search
    by Hamming at the predicted scale, and keep pairs on which both
    directions agree. Candidate targets here are the point-carrying feature
    rows (the reference searches all features, but agreement requires the
    matched feature to carry a point, so non-carrying targets can never form
    a pair). Returns (match1 (M,) index into KF2 rows, agree1 (M,) bool)."""
    fx, fy, cx, cy = k_mat[0, 0], k_mat[1, 1], k_mat[0, 2], k_mat[1, 2]
    s21 = jnp.linalg.inv(s12)

    def direction(s_ba, pts_a, pdesc_a, dmax_a, mask_a, already_a,
                  uv_b, fdesc_b, lvl_b, already_b):
        """Project A's points into B's image; best feature of B per point."""
        q = pts_a @ s_ba[:3, :3].T + s_ba[:3, 3]   # (M, 3) in cam B (Sim3)
        z = q[:, 2]
        z_ok = z > 1e-6
        zs = jnp.where(z_ok, z, 1.0)
        u = fx * q[:, 0] / zs + cx
        v = fy * q[:, 1] / zs + cy
        in_img = (u >= 0) & (u < width) & (v >= 0) & (v < height)
        dist = jnp.linalg.norm(q, axis=-1)
        dmin_a = dmax_a / jnp.exp(log_scale * (n_levels - 1))
        band = (dist >= dmin_a) & (dist <= dmax_a)
        pred = jnp.clip(
            jnp.ceil(
                jnp.log(jnp.maximum(dmax_a / jnp.maximum(dist, 1e-9), 1e-9))
                / log_scale
            ),
            0, n_levels - 1,
        ).astype(jnp.int32)
        radius = th * jnp.exp(pred.astype(jnp.float32) * log_scale)
        visible = mask_a & (~already_a) & z_ok & in_img & band

        duv = jnp.maximum(
            jnp.abs(u[:, None] - uv_b[None, :, 0]),
            jnp.abs(v[:, None] - uv_b[None, :, 1]),
        )
        # reference level gate: octave in [pred-1, pred] (:1480-1482)
        lvl_ok = (lvl_b[None, :] >= pred[:, None] - 1) & (
            lvl_b[None, :] <= pred[:, None]
        )
        cand = (
            visible[:, None] & (duv <= radius[:, None]) & lvl_ok
            & (~already_b)[None, :]
        )
        from orbslam2commentedbyxcm_tpu.ops import matching

        d = matching.hamming_matrix(pdesc_a, fdesc_b)
        d = jnp.where(cand, d, matching.BIG)
        best = jnp.argmin(d, axis=1).astype(jnp.int32)
        ok = jnp.min(d, axis=1) <= max_dist
        return best, ok

    match1, ok1 = direction(s21, pts1, pdesc1, dmax1, mask1, already1,
                            uv2, fdesc2, lvl2, already2)
    match2, ok2 = direction(s12, pts2, pdesc2, dmax2, mask2, already2,
                            uv1, fdesc1, lvl1, already1)
    agree = ok1 & ok2[match1] & (match2[match1] == jnp.arange(match1.shape[0]))
    return match1, agree
