"""Relocalization: BoW candidate retrieval + batched RANSAC PnP recovery.

Reference flow (Tracking::Relocalization, src/Tracking.cc:1511-1684):
DetectRelocalizationCandidates -> per-candidate SearchByBoW (>=15 matches) ->
EPnP RANSAC -> PoseOptimization -> widened projection search -> accept at
>= 50 inliers. Here candidate matching is one masked Hamming matmul per
candidate and the PnP RANSAC evaluates 256 hypotheses as one batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2commentedbyxcm_tpu.ops import bow, matching, optim, pnp
from orbslam2commentedbyxcm_tpu.utils.bucketing import bucket, pad_mask, pad_rows


class Relocalizer:
    def __init__(self, world_map, camera, keyframe_db=None, vocabulary=None,
                 min_inliers: int = 50):
        self.map = world_map
        self.camera = camera
        self.db = keyframe_db
        self.voc = vocabulary
        # hard acceptance gate (reference src/Tracking.cc:1666: nGood >= 50)
        self.min_inliers = min_inliers
        self._key = jax.random.PRNGKey(7)

    def relocalize(self, frame, tracking) -> bool:
        if self.db is None or self.voc is None:
            return False
        words, groups, weights = bow.transform(self.voc, frame.desc, frame.valid)
        ids, vals = bow.bow_vector(words, weights, self.voc.n_words)
        candidates = self.db.detect_relocalization_candidates(ids, vals, self.map)
        if not candidates:
            return False

        cam = self.camera
        for kf_id in candidates[:5]:
            kf = self.map.keyframes.get(kf_id)
            if kf is None or kf.bad:
                continue
            # match frame features against the candidate's map points; when the
            # KF carries BoW grouping nodes, gate candidates by node equality
            # (SearchByBoW, src/ORBmatcher.cc:228 — the reference reloc path)
            pids = np.unique(kf.map_pt[kf.map_pt >= 0])
            pids = pids[self.map.pt_valid[pids]]
            if len(pids) < 15:
                continue
            bp = bucket(len(pids), 256)
            pt_desc = pad_rows(self.map.pt_desc[pids], bp)
            if kf.bow_feat_nodes is not None:
                # grouping node of each point = node of its observing feature
                sel = np.array([self.map.obs[int(p)].get(kf_id, -1) for p in pids])
                pt_grp = np.where(sel >= 0, kf.bow_feat_nodes[np.maximum(sel, 0)], -1)
                idx, dist, ok = matching.search_by_bow(
                    jnp.asarray(frame.desc), jnp.asarray(groups.astype(np.int32)),
                    jnp.asarray(frame.valid),
                    jnp.asarray(pt_desc),
                    jnp.asarray(pad_rows(pt_grp.astype(np.int32), bp, -1)),
                    jnp.asarray(pad_mask(len(pids), bp)),
                    mutual=False,
                )
            else:
                d = matching.hamming_matrix(jnp.asarray(frame.desc), jnp.asarray(pt_desc))
                idx, dist, ok = matching.match_nn(
                    d, jnp.asarray(frame.valid), jnp.asarray(pad_mask(len(pids), bp)), None,
                    max_dist=matching.TH_LOW, ratio=0.75,
                )
            ok = np.asarray(ok)
            if ok.sum() < 15:
                continue
            idx = np.asarray(idx)
            pts3d = np.zeros((frame.capacity, 3), np.float32)
            pts3d[ok] = self.map.pt_xyz[pids[idx[ok]]]

            self._key, sub = jax.random.split(self._key)
            res = pnp.ransac_epnp(
                sub, jnp.asarray(pts3d), jnp.asarray(frame.uv_und),
                jnp.asarray(ok), jnp.asarray(cam.K), jnp.asarray(frame.sigma2()),
            )
            if not bool(res.success):
                continue
            frame.set_pose(np.asarray(res.t_cw))
            frame.map_pt = np.where(
                ok & np.asarray(res.inliers), pids[idx], -1
            )
            # per-point source angle (observing feature in the candidate KF)
            # for the orientation histogram of the widened projection search
            # (reference SearchByProjection KF variant, src/ORBmatcher.cc:1792)
            sel_obs = np.array([self.map.obs[int(p)].get(kf_id, -1) for p in pids])
            pt_angle = np.where(
                sel_obs >= 0, kf.angle[np.maximum(sel_obs, 0)], 0.0
            ).astype(np.float32)

            # widen -> reoptimize -> narrow cascade with the hard >=50 gate
            # (reference src/Tracking.cc:1628-1666)
            n, _ = tracking._match_and_optimize(
                frame, pids, frame.t_cw, radius=10.0, keep_existing=True,
                pt_angle=pt_angle,
            )
            if self.min_inliers * 0.6 <= n < self.min_inliers:
                # narrower window, stricter Hamming (th=3, ORBdist=64)
                n, _ = tracking._match_and_optimize(
                    frame, pids, frame.t_cw, radius=3.0, max_dist=64.0,
                    keep_existing=True, pt_angle=pt_angle,
                )
            if n >= self.min_inliers:
                tracking.ref_kf_id = kf_id
                tracking.velocity = None
                return True
        return False
