"""DBoW2 text-vocabulary import: native C++ parser vs Python fallback.

Exercises the ORBvoc.txt format of TemplatedVocabulary::loadFromTextFile
(reference Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1338): header
`k L scoring weighting`, then `parent is_leaf d0..d31 weight` per node.
"""

import numpy as np
import pytest

from orbslam2commentedbyxcm_tpu.utils import vocab_tools


def _write_synthetic_voc(path, k=3, depth=2, seed=0):
    """Full k-ary tree in BFS order; leaves at the last level. Returns the
    number of non-root nodes."""
    rng = np.random.default_rng(seed)
    lines = [f"{k} {depth} 0 0"]
    # BFS ids: root=0; level l has k^l nodes
    level_start = [0, 1]
    for l in range(1, depth + 1):
        level_start.append(level_start[-1] + k**l)
    n_nodes = level_start[-1]
    for nid in range(1, n_nodes):
        # parent of node nid (BFS complete k-ary tree)
        lvl = next(l for l in range(1, depth + 1) if level_start[l] <= nid < level_start[l + 1])
        off = nid - level_start[lvl]
        parent = 0 if lvl == 1 else level_start[lvl - 1] + off // k
        is_leaf = 1 if lvl == depth else 0
        d = rng.integers(0, 256, 32)
        w = float(rng.uniform(0, 1e-3)) if is_leaf else 0.0
        lines.append(
            f"{parent} {is_leaf} " + " ".join(str(int(x)) for x in d) + f" {w:.6e}"
        )
    path.write_text("\n".join(lines) + "\n")
    return n_nodes - 1


def test_import_native_matches_python_fallback(tmp_path, monkeypatch):
    voc_file = tmp_path / "voc.txt"
    n = _write_synthetic_voc(voc_file, k=3, depth=3, seed=1)

    from orbslam2commentedbyxcm_tpu import native

    k, depth, parents, leaves, desc, weights = native.parse_dbow2_text(str(voc_file))
    k2, d2, p2, l2, de2, w2 = vocab_tools._parse_dbow2_text_py(str(voc_file))
    assert (k, depth) == (k2, d2)
    np.testing.assert_array_equal(parents, p2)
    np.testing.assert_array_equal(leaves, l2)
    np.testing.assert_array_equal(desc, de2.reshape(-1, 32))
    np.testing.assert_allclose(weights, w2, rtol=1e-6)
    assert len(parents) == n


def test_import_builds_consistent_vocabulary(tmp_path):
    voc_file = tmp_path / "voc.txt"
    _write_synthetic_voc(voc_file, k=3, depth=2, seed=2)
    voc = vocab_tools.import_dbow2_text(str(voc_file))
    assert voc.k == 3 and voc.depth == 2
    assert voc.n_words == 9  # 3^2 leaves
    # every leaf's parent chain reaches the root within `depth` hops
    for leaf in np.asarray(voc.word_node):
        nid, hops = int(leaf), 0
        while nid != 0:
            nid = int(voc.node_parent[nid])
            hops += 1
            assert hops <= voc.depth + 1
    # levels consistent with parents
    lv = np.asarray(voc.node_level)
    par = np.asarray(voc.node_parent)
    assert lv[0] == 0
    np.testing.assert_array_equal(lv[1:], lv[np.maximum(par[1:], 0)] + 1)
    # children table round-trips parents
    ch = np.asarray(voc.node_children)
    for nid in range(len(par)):
        for c in ch[nid]:
            if c >= 0:
                assert par[c] == nid

    # transform quantizes arbitrary descriptors into valid words
    from orbslam2commentedbyxcm_tpu.ops import bow

    rng = np.random.default_rng(0)
    desc = rng.integers(0, 2**32, (16, 8), dtype=np.uint32)
    words, groups, weights = bow.transform(voc, desc, np.ones(16, bool))
    w = np.asarray(words)
    assert ((0 <= w) & (w < voc.n_words)).all()


def test_import_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.txt"
    bad.write_text("this is not a vocabulary\n1 2 3\n")
    with pytest.raises((ValueError, RuntimeError)):
        vocab_tools.import_dbow2_text(str(bad))
