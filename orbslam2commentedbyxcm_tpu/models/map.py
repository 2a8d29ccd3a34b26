"""The global map: struct-of-arrays landmark store + keyframe graph.

Functional re-design of the reference's Map / MapPoint / KeyFrame covisibility
machinery (src/Map.cc, src/MapPoint.cc, src/KeyFrame.cc:324-...): landmarks
live in flat numpy arrays (device-transferable as one pytree), observations in
an explicit (point -> {kf: feat_idx}) index, and the covisibility graph /
spanning tree are maintained incrementally per keyframe. No mutexes — the
pipeline owns mutation order.
"""

from __future__ import annotations

import numpy as np

from orbslam2commentedbyxcm_tpu.models.frame import KeyFrame


class Map:
    def __init__(self, point_capacity: int = 1 << 14):
        cap = point_capacity
        self.pt_xyz = np.zeros((cap, 3), np.float32)
        self.pt_desc = np.zeros((cap, 8), np.uint32)
        self.pt_normal = np.zeros((cap, 3), np.float32)
        self.pt_dmin = np.zeros(cap, np.float32)
        self.pt_dmax = np.zeros(cap, np.float32)
        self.pt_valid = np.zeros(cap, bool)
        self.pt_ref_kf = np.full(cap, -1, np.int64)
        self.pt_first_kf = np.full(cap, -1, np.int64)
        self.pt_visible = np.zeros(cap, np.int32)   # tracking visibility counter
        self.pt_found = np.zeros(cap, np.int32)     # tracking found counter
        self.pt_replaced_by = np.full(cap, -1, np.int64)
        self.n_points = 0
        # bumped on every mutation of the packed point attributes (xyz, desc,
        # normal, dmin/dmax, valid) — Tracking keys its device-side local-map
        # pack cache on this, so unchanged local maps upload ZERO point bytes
        # per frame. Writers that mutate pt_* arrays directly (BA write-back,
        # loop correction, GBA propagation) must bump it themselves.
        self.pt_version = 0

        self.obs: dict[int, dict[int, int]] = {}    # pid -> {kf_id: feat_idx}
        # native C++ observation/covisibility index mirrors self.obs and
        # accelerates the O(points x observers) recounts (native/mapgraph.cpp)
        try:
            from orbslam2commentedbyxcm_tpu.native import MapGraph

            self._native = MapGraph()
        except Exception:
            self._native = None
        self.keyframes: dict[int, KeyFrame] = {}
        self.erase_hooks: list = []                  # called with kf_id on deletion
        self.next_kf_id = 0
        self.origin_kf_id = 0                        # GBA root (mvpKeyFrameOrigins)
        self.big_change_idx = 0

    # -- capacity ---------------------------------------------------------

    def _ensure_capacity(self, n_new: int):
        cap = len(self.pt_valid)
        if self.n_points + n_new <= cap:
            return
        new_cap = cap
        while new_cap < self.n_points + n_new:
            new_cap *= 2
        for name in (
            "pt_xyz", "pt_desc", "pt_normal", "pt_dmin", "pt_dmax", "pt_valid",
            "pt_ref_kf", "pt_first_kf", "pt_visible", "pt_found", "pt_replaced_by",
        ):
            arr = getattr(self, name)
            grown = np.zeros((new_cap,) + arr.shape[1:], arr.dtype)
            if name in ("pt_ref_kf", "pt_first_kf", "pt_replaced_by"):
                grown[:] = -1
            grown[: cap] = arr
            setattr(self, name, grown)

    # -- keyframes --------------------------------------------------------

    def add_keyframe(self, frame) -> KeyFrame:
        kf = KeyFrame(frame, self.next_kf_id)
        self.keyframes[kf.kf_id] = kf
        self.next_kf_id += 1
        return kf

    def good_keyframes(self) -> list[KeyFrame]:
        return [kf for kf in self.keyframes.values() if not kf.bad]

    # -- map points -------------------------------------------------------

    def add_point(self, xyz, desc, ref_kf_id: int, normal=None, dmin=0.0, dmax=1e9) -> int:
        self._ensure_capacity(1)
        pid = self.n_points
        self.n_points += 1
        self.pt_xyz[pid] = xyz
        self.pt_desc[pid] = desc
        self.pt_normal[pid] = normal if normal is not None else (0, 0, 1)
        self.pt_dmin[pid] = dmin
        self.pt_dmax[pid] = dmax
        self.pt_valid[pid] = True
        self.pt_ref_kf[pid] = ref_kf_id
        self.pt_first_kf[pid] = ref_kf_id
        self.obs[pid] = {}
        self.pt_version += 1
        return pid

    def add_observation(self, pid: int, kf_id: int, feat_idx: int):
        self.obs[pid][kf_id] = feat_idx
        self.keyframes[kf_id].map_pt[feat_idx] = pid
        if self._native is not None:
            self._native.add_observation(pid, kf_id, feat_idx)

    def erase_observation(self, pid: int, kf_id: int):
        o = self.obs.get(pid)
        if o is None or kf_id not in o:
            return
        idx = o.pop(kf_id)
        if self._native is not None:
            self._native.erase_observation(pid, kf_id)
        kf = self.keyframes.get(kf_id)
        if kf is not None and kf.map_pt[idx] == pid:
            kf.map_pt[idx] = -1
        if self.pt_ref_kf[pid] == kf_id and o:
            self.pt_ref_kf[pid] = next(iter(o))
        # reference: mono point dies below 2 observations (src/MapPoint.cc:153-183)
        if len(o) <= 1:
            self.erase_point(pid)

    def erase_point(self, pid: int):
        if not self.pt_valid[pid]:
            return
        self.pt_valid[pid] = False
        self.pt_version += 1
        if self._native is not None:
            self._native.erase_point(pid)
        for kf_id, idx in list(self.obs.get(pid, {}).items()):
            kf = self.keyframes.get(kf_id)
            if kf is not None and kf.map_pt[idx] == pid:
                kf.map_pt[idx] = -1
        self.obs.pop(pid, None)

    def replace_point(self, old_pid: int, new_pid: int):
        """MapPoint::Replace — merge old into new for loop fusion."""
        if old_pid == new_pid or not self.pt_valid[old_pid]:
            return
        for kf_id, idx in list(self.obs.get(old_pid, {}).items()):
            kf = self.keyframes.get(kf_id)
            if kf_id not in self.obs.get(new_pid, {}):
                self.obs[new_pid][kf_id] = idx
                if self._native is not None:
                    self._native.add_observation(new_pid, kf_id, idx)
                if kf is not None:
                    kf.map_pt[idx] = new_pid
            else:
                if kf is not None and kf.map_pt[idx] == old_pid:
                    kf.map_pt[idx] = -1
        self.pt_found[new_pid] += self.pt_found[old_pid]
        self.pt_visible[new_pid] += self.pt_visible[old_pid]
        self.pt_valid[old_pid] = False
        self.pt_version += 1
        self.pt_replaced_by[old_pid] = new_pid
        self.obs.pop(old_pid, None)
        if self._native is not None:
            self._native.erase_point(old_pid)
        self.update_point_descriptor(new_pid)

    def resolve_replaced(self, pid: int) -> int:
        """Follow the Replace chain (reference CheckReplacedInLastFrame)."""
        seen = 0
        while pid >= 0 and not self.pt_valid[pid]:
            nxt = self.pt_replaced_by[pid]
            if nxt < 0 or seen > 32:
                return -1
            pid = int(nxt)
            seen += 1
        return pid

    def resolve_replaced_batch(self, pids: np.ndarray) -> np.ndarray:
        """Vectorized resolve_replaced over an int array (negative entries
        pass through); follows Replace chains until valid or dead."""
        cur = np.asarray(pids, np.int64).copy()
        for _ in range(32):
            stale = (cur >= 0) & ~self.pt_valid[np.maximum(cur, 0)]
            if not stale.any():
                break
            cur[stale] = self.pt_replaced_by[cur[stale]]
        cur[(cur >= 0) & ~self.pt_valid[np.maximum(cur, 0)]] = -1
        return cur

    def n_observations(self, pid: int) -> int:
        return len(self.obs.get(pid, {}))

    # -- derived point attributes ----------------------------------------

    def update_point_descriptor(self, pid: int):
        """Distinctive descriptor = min-median-Hamming over observations
        (MapPoint::ComputeDistinctiveDescriptors, src/MapPoint.cc:295)."""
        o = self.obs.get(pid)
        if not o:
            return
        descs = np.stack([
            self.keyframes[k].desc[i] for k, i in o.items() if k in self.keyframes
        ])
        self.pt_version += 1
        if len(descs) == 1:
            self.pt_desc[pid] = descs[0]
            return
        bits = np.unpackbits(descs.view(np.uint8), axis=1)
        d = (bits[:, None, :] != bits[None, :, :]).sum(-1)
        med = np.median(d, axis=1)
        self.pt_desc[pid] = descs[np.argmin(med)]

    def update_point_normal_depth(self, pid: int):
        """Mean viewing direction + scale-invariance band
        (MapPoint::UpdateNormalAndDepth, src/MapPoint.cc:386)."""
        o = self.obs.get(pid)
        if not o:
            return
        xyz = self.pt_xyz[pid]
        normals = []
        for kf_id in o:
            kf = self.keyframes.get(kf_id)
            if kf is None:
                continue
            v = xyz - kf.center
            n = np.linalg.norm(v)
            if n > 1e-9:
                normals.append(v / n)
        if not normals:
            return
        self.pt_version += 1
        self.pt_normal[pid] = np.mean(normals, axis=0)
        ref_id = int(self.pt_ref_kf[pid])
        ref = self.keyframes.get(ref_id)
        if ref is None or ref_id not in o:
            return
        dist = np.linalg.norm(xyz - ref.center)
        lvl = int(ref.level[o[ref_id]])
        sf = ref.scale_factor
        self.pt_dmax[pid] = dist * (sf ** lvl)
        self.pt_dmin[pid] = self.pt_dmax[pid] / (sf ** (ref.n_levels - 1))

    def _observer_csr(self, pids: np.ndarray):
        """(pid_idx, kf_id, feat_idx) rows for all observations of `pids` —
        native CSR export when available, dict walk otherwise."""
        if self._native is not None:
            kf_arr, ft_arr, seg = self._native.export_point_observers(pids)
            total = int(seg[len(pids)])
            counts = np.diff(seg[: len(pids) + 1])
            pid_idx = np.repeat(np.arange(len(pids)), counts)
            return pid_idx, kf_arr[:total], ft_arr[:total].astype(np.int64)
        rows = [
            (i, k, f)
            for i, p in enumerate(pids)
            for k, f in self.obs.get(int(p), {}).items()
        ]
        if not rows:
            return (np.zeros(0, np.int64),) * 3
        a = np.asarray(rows, np.int64)
        return a[:, 0], a[:, 1], a[:, 2]

    def update_points_batch(self, pids):
        """Vectorized MapPoint::UpdateNormalAndDepth over many points — one
        CSR pass instead of a Python loop per point (the reference calls it
        per point from every pipeline stage; here stages batch their touched
        points and pay one numpy pass)."""
        pids = np.unique(np.asarray(pids, np.int64))
        pids = pids[self.pt_valid[pids]] if len(pids) else pids
        if len(pids) == 0:
            return
        pid_idx, kf_arr, ft_arr = self._observer_csr(pids)
        if len(pid_idx) == 0:
            return
        self.pt_version += 1
        kf_ids = np.unique(kf_arr)
        live = np.array([int(k) in self.keyframes for k in kf_ids])
        centers = np.stack([
            self.keyframes[int(k)].center if ok else np.zeros(3, np.float32)
            for k, ok in zip(kf_ids, live)
        ])
        rows = np.searchsorted(kf_ids, kf_arr)
        good = live[rows]

        xyz = self.pt_xyz[pids]
        v = xyz[pid_idx] - centers[rows]
        nv = np.linalg.norm(v, axis=1)
        ok = good & (nv > 1e-9)
        vn = np.where(ok[:, None], v / np.maximum(nv, 1e-9)[:, None], 0.0)
        nsum = np.zeros((len(pids), 3))
        np.add.at(nsum, pid_idx, vn)
        cnt = np.zeros(len(pids))
        np.add.at(cnt, pid_idx, ok.astype(np.float64))
        has = cnt > 0
        self.pt_normal[pids[has]] = (
            nsum[has] / cnt[has, None]
        ).astype(np.float32)

        # scale band from the reference keyframe's observing feature level
        ref = self.pt_ref_kf[pids]
        sel = np.nonzero((kf_arr == ref[pid_idx]) & good)[0]
        if len(sel) == 0:
            return
        lv = np.fromiter(
            (self.keyframes[int(kf_arr[s])].level[ft_arr[s]] for s in sel),
            np.int64, count=len(sel),
        )
        any_kf = self.keyframes[int(kf_ids[live][0])]
        sf, n_levels = any_kf.scale_factor, any_kf.n_levels
        tgt = pid_idx[sel]
        dist = np.linalg.norm(xyz[tgt] - centers[rows[sel]], axis=1)
        dmax = dist * sf ** lv
        self.pt_dmax[pids[tgt]] = dmax.astype(np.float32)
        self.pt_dmin[pids[tgt]] = (dmax / sf ** (n_levels - 1)).astype(np.float32)

    def update_point_descriptors_batch(self, pids):
        """Vectorized ComputeDistinctiveDescriptors: gather all observation
        descriptors in one pass per observing keyframe, then process points
        grouped by observation count (pairwise Hamming via unpacked bits)."""
        pids = np.unique(np.asarray(pids, np.int64))
        pids = pids[self.pt_valid[pids]] if len(pids) else pids
        if len(pids) == 0:
            return
        pid_idx, kf_arr, ft_arr = self._observer_csr(pids)
        if len(pid_idx) == 0:
            return
        self.pt_version += 1
        live = np.fromiter((int(k) in self.keyframes for k in kf_arr),
                           bool, count=len(kf_arr))
        pid_idx, kf_arr, ft_arr = pid_idx[live], kf_arr[live], ft_arr[live]
        descs = np.zeros((len(pid_idx), 8), np.uint32)
        for k in np.unique(kf_arr):
            sel = kf_arr == k
            descs[sel] = self.keyframes[int(k)].desc[ft_arr[sel]]
        counts = np.bincount(pid_idx, minlength=len(pids))
        order = np.argsort(pid_idx, kind="stable")
        descs = descs[order]
        starts = np.zeros(len(pids) + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        for c in np.unique(counts):
            if c == 0:
                continue
            which = np.nonzero(counts == c)[0]
            if c == 1:
                self.pt_desc[pids[which]] = descs[starts[which]]
                continue
            idx = starts[which][:, None] + np.arange(c)[None, :]
            d = descs[idx]                                    # (n, c, 8)
            bits = np.unpackbits(
                d.view(np.uint8), axis=-1
            ).reshape(len(which), c, 256)
            ham = (bits[:, :, None, :] != bits[:, None, :, :]).sum(-1)
            med = np.median(ham, axis=2)                      # (n, c)
            best = np.argmin(med, axis=1)
            self.pt_desc[pids[which]] = d[np.arange(len(which)), best]

    def predict_scale(self, pid_dist: np.ndarray, dmax: np.ndarray, scale_factor: float, n_levels: int) -> np.ndarray:
        """Vectorized MapPoint::PredictScale (src/MapPoint.cc:469)."""
        ratio = dmax / np.maximum(pid_dist, 1e-9)
        lvl = np.ceil(np.log(np.maximum(ratio, 1e-9)) / np.log(scale_factor))
        return np.clip(lvl, 0, n_levels - 1).astype(np.int32)

    # -- covisibility graph / spanning tree ------------------------------

    def update_connections(self, kf: KeyFrame, min_weight: int = 15):
        """Rebuild kf's covisibility edges from shared map points and update the
        spanning tree (KeyFrame::UpdateConnections, src/KeyFrame.cc:324)."""
        if self._native is not None:
            other, w = self._native.covisibility(kf.kf_id)
            counter = dict(zip(other.tolist(), w.tolist()))
        else:
            counter = {}
            for pid in kf.map_pt[kf.map_pt >= 0]:
                for other_id in self.obs.get(int(pid), {}):
                    if other_id != kf.kf_id:
                        counter[other_id] = counter.get(other_id, 0) + 1
        counter = {k: v for k, v in counter.items() if k in self.keyframes}
        if not counter:
            return
        best_id, best_w = max(counter.items(), key=lambda kv: kv[1])
        new_covis = {k: w for k, w in counter.items() if w >= min_weight}
        if not new_covis:
            new_covis = {best_id: best_w}  # always keep the strongest link

        # remove stale reciprocal edges
        for other_id in set(kf.covis) - set(new_covis):
            other = self.keyframes.get(other_id)
            if other is not None:
                other.covis.pop(kf.kf_id, None)
        kf.covis = new_covis
        for other_id, w in new_covis.items():
            other = self.keyframes.get(other_id)
            if other is not None:
                other.covis[kf.kf_id] = w

        # spanning tree: first connection parents to strongest covisible
        if kf.parent is None and kf.kf_id != self.origin_kf_id:
            kf.parent = best_id
            self.keyframes[best_id].children.add(kf.kf_id)

    def erase_keyframe(self, kf_id: int):
        """KeyFrame::SetBadFlag — re-parent children over covisibility
        (src/KeyFrame.cc:492)."""
        kf = self.keyframes.get(kf_id)
        if kf is None or kf.kf_id == self.origin_kf_id or kf.not_erase:
            return
        for other_id in list(kf.covis):
            other = self.keyframes.get(other_id)
            if other is not None:
                other.covis.pop(kf_id, None)
        for pid in kf.map_pt[kf.map_pt >= 0]:
            self.erase_observation(int(pid), kf_id)

        # re-parent children: candidate parents = kf's parent + already-reparented
        candidates = {kf.parent} if kf.parent is not None else set()
        children = set(kf.children)
        while children:
            best = None  # (weight, child, parent)
            for c in children:
                ckf = self.keyframes.get(c)
                if ckf is None:
                    continue
                for cand in candidates:
                    w = ckf.covis.get(cand)
                    if w is not None and (best is None or w > best[0]):
                        best = (w, c, cand)
            if best is None:
                break
            _, c, p = best
            ckf = self.keyframes[c]
            ckf.parent = p
            self.keyframes[p].children.add(c)
            candidates.add(c)
            children.remove(c)
        # orphans attach to the deleted node's parent
        for c in children:
            ckf = self.keyframes.get(c)
            if ckf is not None and kf.parent is not None:
                ckf.parent = kf.parent
                self.keyframes[kf.parent].children.add(c)
        if kf.parent is not None:
            parent = self.keyframes.get(kf.parent)
            if parent is not None:
                parent.children.discard(kf_id)
            kf.t_child_parent = kf.t_cw @ np.linalg.inv(self.keyframes[kf.parent].t_cw)
        kf.bad = True
        for hook in self.erase_hooks:
            hook(kf_id)

    # -- queries ----------------------------------------------------------

    def points_seen_by(self, kf_ids) -> np.ndarray:
        kf_ids = list(kf_ids)
        if self._native is not None:
            pids = self._native.points_seen_by(kf_ids)
            return pids[self.pt_valid[pids]]
        pids = set()
        for kf_id in kf_ids:
            kf = self.keyframes.get(kf_id)
            if kf is None:
                continue
            pids.update(int(p) for p in kf.map_pt[kf.map_pt >= 0])
        return np.fromiter((p for p in pids if self.pt_valid[p]), np.int64) if pids else np.zeros(0, np.int64)

    def pack_points(self, pids: np.ndarray, cap: int):
        """Pack point attributes for `pids` into fixed-capacity arrays for the
        device projection matcher: (xyz, desc, normal, dmin, dmax, mask)."""
        xyz = np.zeros((cap, 3), np.float32)
        desc = np.zeros((cap, 8), np.uint32)
        normal = np.zeros((cap, 3), np.float32)
        dmin = np.zeros(cap, np.float32)
        dmax = np.full(cap, 1e9, np.float32)
        mask = np.zeros(cap, bool)
        n = min(len(pids), cap)
        pids = pids[:n]
        xyz[:n] = self.pt_xyz[pids]
        desc[:n] = self.pt_desc[pids]
        normal[:n] = self.pt_normal[pids]
        dmin[:n] = self.pt_dmin[pids]
        dmax[:n] = self.pt_dmax[pids]
        mask[:n] = True
        return xyz, desc, normal, dmin, dmax, mask

    def n_valid_points(self) -> int:
        return int(self.pt_valid[: self.n_points].sum())

    def all_point_ids(self) -> np.ndarray:
        return np.nonzero(self.pt_valid[: self.n_points])[0]
