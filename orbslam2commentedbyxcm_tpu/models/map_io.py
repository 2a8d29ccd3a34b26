"""Map checkpoint / restore.

The reference left SaveMap/LoadMap as a commented-out TODO
(include/System.h:104-106); here the map is mostly flat arrays, so a
checkpoint is one compressed npz: landmark store, per-keyframe feature
arrays + poses + graph structure, the observation index, the trajectory, and
the vocabulary. Restoring rebuilds the native index and the BoW database, so
a reloaded System can continue tracking / relocalize immediately
(localization-only sessions against a prebuilt map).
"""

from __future__ import annotations

import numpy as np

from orbslam2commentedbyxcm_tpu.models.frame import KeyFrame
from orbslam2commentedbyxcm_tpu.models.map import Map


def save_map(world_map: Map, path: str, vocabulary=None, trajectory=None):
    m = world_map
    n = m.n_points
    kfs = sorted((kf for kf in m.keyframes.values()), key=lambda k: k.kf_id)
    data = {
        "pt_xyz": m.pt_xyz[:n], "pt_desc": m.pt_desc[:n],
        "pt_normal": m.pt_normal[:n], "pt_dmin": m.pt_dmin[:n],
        "pt_dmax": m.pt_dmax[:n], "pt_valid": m.pt_valid[:n],
        "pt_ref_kf": m.pt_ref_kf[:n], "pt_first_kf": m.pt_first_kf[:n],
        "pt_visible": m.pt_visible[:n], "pt_found": m.pt_found[:n],
        "pt_replaced_by": m.pt_replaced_by[:n],
        "origin_kf_id": m.origin_kf_id, "next_kf_id": m.next_kf_id,
        "kf_ids": np.array([kf.kf_id for kf in kfs], np.int64),
        "kf_bad": np.array([kf.bad for kf in kfs], bool),
        "kf_timestamps": np.array([kf.timestamp for kf in kfs]),
        "kf_poses": np.stack([kf.t_cw for kf in kfs]) if kfs else np.zeros((0, 4, 4), np.float32),
        "kf_parent": np.array([(-1 if kf.parent is None else kf.parent) for kf in kfs], np.int64),
    }
    # per-keyframe feature arrays (equal capacity -> stackable)
    if kfs:
        for name in ("uv", "uv_und", "angle", "level", "desc", "valid", "u_right", "depth", "map_pt"):
            data[f"kf_{name}"] = np.stack([getattr(kf, name) for kf in kfs])
        data["kf_tcp"] = np.stack([
            kf.t_child_parent if kf.t_child_parent is not None else np.eye(4, dtype=np.float32)
            for kf in kfs
        ])
        data["kf_has_tcp"] = np.array([kf.t_child_parent is not None for kf in kfs], bool)
        data["kf_loop_edges"] = np.array(
            [",".join(map(str, sorted(kf.loop_edges))) for kf in kfs], object
        )
    # observation index as flat triples
    obs_pid, obs_kf, obs_feat = [], [], []
    for pid, o in m.obs.items():
        for kf_id, feat in o.items():
            obs_pid.append(pid)
            obs_kf.append(kf_id)
            obs_feat.append(feat)
    data["obs_pid"] = np.asarray(obs_pid, np.int64)
    data["obs_kf"] = np.asarray(obs_kf, np.int64)
    data["obs_feat"] = np.asarray(obs_feat, np.int32)
    if trajectory is not None:
        data["traj_ts"] = np.array([t[0] for t in trajectory])
        data["traj_ref"] = np.array([t[1] for t in trajectory], np.int64)
        data["traj_rel"] = (
            np.stack([t[2] for t in trajectory]) if trajectory else np.zeros((0, 4, 4), np.float32)
        )
    if vocabulary is not None:
        for f in ("node_desc", "node_children", "node_parent", "node_level",
                  "word_id", "word_weight", "word_node"):
            data[f"voc_{f}"] = getattr(vocabulary, f)
        data["voc_k"] = vocabulary.k
        data["voc_depth"] = vocabulary.depth
    np.savez_compressed(path, **{k: v for k, v in data.items()})


def load_map(path: str, scale_factor: float = 1.2, n_levels: int = 8):
    """-> (Map, vocabulary | None, trajectory). Keyframes are reconstructed
    with their frozen feature arrays and graph; covisibility is recomputed."""
    z = np.load(path, allow_pickle=True)
    m = Map()
    n = len(z["pt_xyz"])
    m._ensure_capacity(n)
    m.n_points = n
    for name in ("pt_xyz", "pt_desc", "pt_normal", "pt_dmin", "pt_dmax", "pt_valid",
                 "pt_ref_kf", "pt_first_kf", "pt_visible", "pt_found", "pt_replaced_by"):
        getattr(m, name)[:n] = z[name]
    m.origin_kf_id = int(z["origin_kf_id"])
    m.next_kf_id = int(z["next_kf_id"])

    kf_ids = z["kf_ids"]
    for i, kf_id in enumerate(kf_ids):
        kf = KeyFrame.__new__(KeyFrame)
        kf.kf_id = int(kf_id)
        kf.frame_id = -1
        kf.timestamp = float(z["kf_timestamps"][i])
        kf.camera = None
        kf.n_levels = n_levels
        kf.scale_factor = scale_factor
        for name in ("uv", "uv_und", "angle", "level", "desc", "valid", "u_right", "depth", "map_pt"):
            setattr(kf, name, z[f"kf_{name}"][i].copy())
        kf.t_cw = z["kf_poses"][i].copy()
        p = int(z["kf_parent"][i])
        kf.parent = None if p < 0 else p
        kf.children = set()
        le = str(z["kf_loop_edges"][i])
        kf.loop_edges = set(int(x) for x in le.split(",") if x)
        kf.bad = bool(z["kf_bad"][i])
        kf.not_erase = False
        kf.t_child_parent = z["kf_tcp"][i].copy() if z["kf_has_tcp"][i] else None
        kf.covis = {}
        kf.bow_vec = None
        kf.bow_feat_nodes = None
        kf.t_cw_gba = None
        kf.ba_global_for_kf = -1
        m.keyframes[kf.kf_id] = kf
    for kf in m.keyframes.values():
        if kf.parent is not None and kf.parent in m.keyframes:
            m.keyframes[kf.parent].children.add(kf.kf_id)

    # observations (+ native mirror)
    m.obs = {}
    for pid, kf_id, feat in zip(z["obs_pid"], z["obs_kf"], z["obs_feat"]):
        m.obs.setdefault(int(pid), {})[int(kf_id)] = int(feat)
        if m._native is not None:
            m._native.add_observation(int(pid), int(kf_id), int(feat))
    # covisibility recomputed from observations
    for kf in m.keyframes.values():
        if not kf.bad:
            m.update_connections(kf)

    vocabulary = None
    if "voc_k" in z:
        from orbslam2commentedbyxcm_tpu.ops.bow import Vocabulary

        vocabulary = Vocabulary(
            k=int(z["voc_k"]), depth=int(z["voc_depth"]),
            node_desc=z["voc_node_desc"], node_children=z["voc_node_children"],
            node_parent=z["voc_node_parent"], node_level=z["voc_node_level"],
            word_id=z["voc_word_id"], word_weight=z["voc_word_weight"],
            word_node=z["voc_word_node"],
        )
    trajectory = []
    if "traj_ts" in z:
        trajectory = [
            (float(ts), int(ref), rel)
            for ts, ref, rel in zip(z["traj_ts"], z["traj_ref"], z["traj_rel"])
        ]
    return m, vocabulary, trajectory
