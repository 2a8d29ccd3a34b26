"""Frame and KeyFrame containers.

Host-side equivalents of the reference's Frame (src/Frame.cc) and KeyFrame
(src/KeyFrame.cc). Heavy compute (extraction, undistortion, matching, BA) runs
on device via the ops/ modules; these classes hold the per-frame numpy
bookkeeping the pipeline mutates: feature arrays, map-point associations,
covisibility links, spanning tree.

Deliberate departures from the reference:
  * no per-frame 64x48 grid (GetFeaturesInArea) — window queries are dense
    masks inside the device matcher (ops/matching.window_mask);
  * no per-object mutexes — the pipeline is an explicit sequential/async
    dataflow, not shared-memory threads.
"""

from __future__ import annotations

import numpy as np

from orbslam2commentedbyxcm_tpu.utils.camera import Camera

# Per-level scale constants (reference ORBextractor scale pyramid).
def level_sigma2(n_levels: int = 8, scale: float = 1.2) -> np.ndarray:
    return (scale ** (2.0 * np.arange(n_levels))).astype(np.float32)


class Frame:
    """One processed image: fixed-capacity feature arrays + pose + map links."""

    _next_id = 0

    def __init__(self, feats, camera: Camera, timestamp: float, scale_factor: float = 1.2, n_levels: int = 8):
        self.id = Frame._next_id
        Frame._next_id += 1
        self.timestamp = timestamp
        self.camera = camera
        self.n_levels = n_levels
        self.scale_factor = scale_factor

        # device -> host snapshots (numpy)
        self.uv = np.asarray(feats.uv)
        self.angle = np.asarray(feats.angle)
        self.level = np.asarray(feats.level)
        self.desc = np.asarray(feats.desc)
        self.valid = np.asarray(feats.valid)
        self.response = np.asarray(feats.response)
        self.n = int(self.valid.sum())
        cap = len(self.uv)

        self.uv_und = self.uv.copy()  # filled by pipeline if distortion present
        self.u_right = np.full(cap, -1.0, np.float32)  # stereo only
        self.depth = np.full(cap, -1.0, np.float32)    # stereo / RGB-D only

        self.t_cw = np.eye(4, dtype=np.float32)
        self.map_pt = np.full(cap, -1, np.int64)  # feature slot -> map point id
        self.is_outlier = np.zeros(cap, bool)

    @property
    def capacity(self) -> int:
        return len(self.uv)

    def set_pose(self, t_cw: np.ndarray):
        self.t_cw = np.asarray(t_cw, np.float32)

    @property
    def center(self) -> np.ndarray:
        """Camera center in world coords (Ow)."""
        r = self.t_cw[:3, :3]
        return -r.T @ self.t_cw[:3, 3]

    def sigma2(self) -> np.ndarray:
        return level_sigma2(self.n_levels, self.scale_factor)[self.level]

    def inv_sigma2(self) -> np.ndarray:
        return (1.0 / self.sigma2()).astype(np.float32)

    def stereo_obs(self) -> np.ndarray:
        """(N, 3) observations (u, v, u_right) with -1 in col 2 for mono feats."""
        return np.concatenate([self.uv_und, self.u_right[:, None]], axis=1).astype(np.float32)

    def compact_to(self, cap: int, priority_mask: np.ndarray) -> np.ndarray:
        """Shrink the frame's feature arrays to `cap` slots, keeping all
        `priority_mask` features first and filling the rest by descending
        FAST response. Returns old->new index mapping (-1 = dropped).

        Used after monocular initialization with the doubled init feature
        budget (reference mpIniORBextractor, src/Tracking.cc:121-126): the
        two init frames become keyframes, and keyframe array shapes must
        stay uniform for the batched device programs, so the surviving
        (matched-first) features are repacked into the standard capacity."""
        pri = priority_mask & self.valid
        rest = self.valid & ~pri
        rest_idx = np.nonzero(rest)[0]
        order_rest = rest_idx[np.argsort(-self.response[rest_idx])]
        sel = np.concatenate([np.nonzero(pri)[0], order_rest])[:cap]
        old_to_new = np.full(self.capacity, -1, np.int64)
        old_to_new[sel] = np.arange(len(sel))
        for name in ("uv", "uv_und", "angle", "level", "desc", "valid",
                     "response", "u_right", "depth", "map_pt", "is_outlier"):
            arr = getattr(self, name)
            out = np.zeros((cap,) + arr.shape[1:], arr.dtype)
            if name in ("u_right", "depth"):
                out[:] = -1.0
            elif name == "map_pt":
                out[:] = -1
            out[: len(sel)] = arr[sel]
            setattr(self, name, out)
        self.n = int(self.valid.sum())
        self._device_cache = None
        return old_to_new

    def device_arrays(self) -> dict:
        """The frame's feature arrays as device (jnp) arrays, uploaded once.

        Every tracking stage consumes the same per-frame arrays; without this
        cache each stage re-uploads ~1000-row copies of uv/desc/level/valid/
        obs/inv_sigma2 (2-3 stages x every frame). Built lazily AFTER the
        pipeline finalized uv_und (undistortion) and u_right/depth (stereo or
        RGB-D attach), which all happen before tracking touches the frame."""
        cache = getattr(self, "_device_cache", None)
        if cache is None:
            import jax.numpy as jnp

            cache = {
                "uv_und": jnp.asarray(self.uv_und),
                "desc": jnp.asarray(self.desc),
                "level": jnp.asarray(self.level),
                "valid": jnp.asarray(self.valid),
                "angle": jnp.asarray(self.angle),
                "obs": jnp.asarray(self.stereo_obs()),
                "inv_sigma2": jnp.asarray(self.inv_sigma2()),
            }
            self._device_cache = cache
        return cache


class KeyFrame:
    """Persistent frame snapshot (reference include/KeyFrame.h).

    Features are frozen; pose and map-point links mutate under loop correction
    and BA. Covisibility weights and the spanning tree live here, maintained
    by Map.update_connections.
    """

    def __init__(self, frame: Frame, kf_id: int):
        self.kf_id = kf_id
        self.frame_id = frame.id
        self.timestamp = frame.timestamp
        self.camera = frame.camera
        self.n_levels = frame.n_levels
        self.scale_factor = frame.scale_factor

        self.uv = frame.uv
        self.uv_und = frame.uv_und
        self.angle = frame.angle
        self.level = frame.level
        self.desc = frame.desc
        self.valid = frame.valid
        self.u_right = frame.u_right
        self.depth = frame.depth

        self.t_cw = frame.t_cw.copy()
        self.map_pt = frame.map_pt.copy()

        # graph structure
        self.covis: dict[int, int] = {}     # kf_id -> shared-point weight
        self.parent: int | None = None      # spanning-tree parent kf_id
        self.children: set[int] = set()
        self.loop_edges: set[int] = set()
        self.bad = False
        self.not_erase = False              # loop-closing protection
        self.t_child_parent = None          # mTcp stored on deletion

        # BoW (filled by place recognition)
        self.bow_vec = None
        self.bow_feat_nodes = None

        # GBA staging (reference mTcwGBA)
        self.t_cw_gba = None
        self.ba_global_for_kf = -1

    @property
    def center(self) -> np.ndarray:
        r = self.t_cw[:3, :3]
        return -r.T @ self.t_cw[:3, 3]

    def set_pose(self, t_cw: np.ndarray):
        self.t_cw = np.asarray(t_cw, np.float32)

    def inv_sigma2(self) -> np.ndarray:
        cached = getattr(self, "_inv_sigma2", None)
        if cached is None:
            cached = (
                1.0 / level_sigma2(self.n_levels, self.scale_factor)[self.level]
            ).astype(np.float32)
            self._inv_sigma2 = cached  # features are immutable on a KeyFrame
        return cached

    def best_covisible(self, n: int | None = None) -> list[int]:
        """Covisible keyframe ids ordered by weight (GetBestCovisibilityKeyFrames)."""
        items = sorted(self.covis.items(), key=lambda kv: -kv[1])
        ids = [k for k, _ in items]
        return ids if n is None else ids[:n]

    def stereo_obs(self) -> np.ndarray:
        """(N, 3) observations (u, v, u_right) with -1 in col 2 for mono feats."""
        return np.concatenate([self.uv_und, self.u_right[:, None]], axis=1).astype(np.float32)
