"""Offline vocabulary tools: train/save/load, plus a DBoW2-text importer.

The reference ships a pre-trained ORBvoc.txt (~1M nodes, loaded at startup,
src/System.cc:65-75 / TemplatedVocabulary::loadFromTextFile :1338). This
framework trains vocabularies for its own descriptors (ops/bow.train_vocabulary)
and stores them as .npz; `import_dbow2_text` can also convert a DBoW2 text
vocabulary into the packed format for users migrating with their own artifacts
(tree topology + weights are format-compatible; descriptor semantics are not,
so a converted ORBvoc quantizes but is suboptimal for our pattern).

CLI:
  python -m orbslam2commentedbyxcm_tpu.utils.vocab_tools train OUT.npz IMG_DIR...
  python -m orbslam2commentedbyxcm_tpu.utils.vocab_tools convert ORBvoc.txt OUT.npz
"""

from __future__ import annotations

import os
import sys

import numpy as np

from orbslam2commentedbyxcm_tpu.ops import bow


def train_from_images(image_paths, n_features=1000, k=10, depth=4, **kw) -> bow.Vocabulary:
    import cv2

    from orbslam2commentedbyxcm_tpu.ops.orb import ORBExtractor

    ext = ORBExtractor(n_features=n_features)
    descs = []
    for p in image_paths:
        img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        if img is None:
            continue
        f = ext(img.astype(np.float32))
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    if not descs:
        raise ValueError("no descriptors extracted")
    return bow.train_vocabulary(np.concatenate(descs), k=k, depth=depth, **kw)


def import_dbow2_text(path: str) -> bow.Vocabulary:
    """Convert a DBoW2 text vocabulary (ORBvoc.txt format) to packed arrays.

    Format (TemplatedVocabulary::loadFromTextFile): header `k L s1 s2`, then
    one line per node: parent_id is_leaf d0..d31 weight.
    """
    with open(path) as f:
        header = f.readline().split()
        k, depth = int(header[0]), int(header[1])
        parents, leaves, descs, weights = [], [], [], []
        for line in f:
            vals = line.split()
            if len(vals) < 35:
                continue
            parents.append(int(vals[0]))
            leaves.append(int(vals[1]) != 0)
            descs.append([int(v) for v in vals[2:34]])
            weights.append(float(vals[34]))

    n = len(parents) + 1  # +1 root
    node_desc = np.zeros((n, 8), np.uint32)
    node_parent = np.full(n, -1, np.int32)
    children: list[list[int]] = [[] for _ in range(n)]
    node_level = np.zeros(n, np.int32)
    w = np.zeros(n, np.float32)
    for i in range(1, n):
        p = parents[i - 1] if parents[i - 1] >= 0 else 0
        node_parent[i] = p
        children[p].append(i)
        node_desc[i] = np.packbits(
            np.unpackbits(np.array(descs[i - 1], np.uint8))
        ).view(np.uint32)
        w[i] = weights[i - 1]
    # levels by BFS
    frontier = [0]
    while frontier:
        nxt = []
        for nid in frontier:
            for c in children[nid]:
                node_level[c] = node_level[nid] + 1
                nxt.append(c)
        frontier = nxt
    children_arr = np.full((n, k), -1, np.int32)
    for nid, ch in enumerate(children):
        children_arr[nid, : min(len(ch), k)] = ch[:k]
    leaf_ids = np.array(
        [i for i in range(1, n) if leaves[i - 1] or not children[i]], np.int32
    )
    word_id = np.full(n, -1, np.int32)
    word_id[leaf_ids] = np.arange(len(leaf_ids), dtype=np.int32)
    return bow.Vocabulary(
        k=k, depth=depth, node_desc=node_desc, node_children=children_arr,
        node_parent=node_parent, node_level=node_level, word_id=word_id,
        word_weight=w[leaf_ids].astype(np.float32), word_node=leaf_ids,
    )


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    cmd = argv[0]
    if cmd == "train":
        out = argv[1]
        paths = []
        for d in argv[2:]:
            if os.path.isdir(d):
                paths.extend(
                    os.path.join(d, f) for f in sorted(os.listdir(d))
                    if f.lower().endswith((".png", ".jpg", ".jpeg", ".pgm"))
                )
            else:
                paths.append(d)
        voc = train_from_images(paths)
        voc.save(out)
        print(f"trained vocabulary: {voc.n_words} words -> {out}")
    elif cmd == "convert":
        voc = import_dbow2_text(argv[1])
        voc.save(argv[2])
        print(f"converted: {voc.n_words} words -> {argv[2]}")
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
