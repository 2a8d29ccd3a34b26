"""Regenerate the packaged bootstrap vocabulary (assets/bootstrap_vocab.npz).

Corpus: descriptors from varied synthetic scenes (plane sequences + box
orbits/corridors/sways over many texture seeds at 640x480) — the same
generator family the framework's tests/benchmarks use, so the tree is
matched to the extractor's BRIEF-pattern descriptor distribution. Default
k=10, depth=5 -> up to ~100k words (the reference's ORBvoc is k=10, L=6 ->
1M words, trained on real imagery at far larger corpus scale; grow the
corpus + depth the same way for a production tree; a real ORBvoc.txt can
also be imported directly via utils/vocab_tools.py).

Also reports the place-recognition separation ratio (same-place vs
different-place BoW similarity) so vocabulary quality is tracked per build.

Usage: python benchmarks/train_bootstrap_vocab.py [OUT.npz] [--depth D]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from orbslam2commentedbyxcm_tpu.ops import bow  # noqa: E402
from orbslam2commentedbyxcm_tpu.ops.orb import ORBExtractor  # noqa: E402
from orbslam2commentedbyxcm_tpu.utils.synth import (  # noqa: E402
    BoxSequence,
    SyntheticSequence,
    default_camera,
)


def gather_corpus(n_plane=20, n_box=16, verbose=True):
    cam = default_camera()
    ext = ORBExtractor(n_features=1200)
    descs = []

    def grab(img):
        f = ext(img.astype(np.float32))
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])

    for seed in range(n_plane):
        traj = ("sideways", "forward", "arc", "outback")[seed % 4]
        seq = SyntheticSequence(camera=cam, n_frames=5, seed=seed, trajectory=traj)
        for i in range(5):
            grab(seq.render(i))
        if verbose:
            print(f"plane scene {seed}: {sum(len(d) for d in descs)} descs", flush=True)

    for seed in range(100, 100 + n_box):
        traj = ("orbit", "line", "sway")[seed % 3]
        seq = BoxSequence(camera=cam, n_frames=12, seed=seed, turns=1.0,
                          trajectory=traj)
        for i in range(0, 12, 2):
            grab(seq.render(i))
        if verbose:
            print(f"box scene {seed}: {sum(len(d) for d in descs)} descs", flush=True)
    return np.concatenate(descs)


def separation_ratio(voc, n_scenes=6):
    """Same-place vs different-place BoW-score ratio over held-out box scenes."""
    cam = default_camera()
    ext = ORBExtractor(n_features=1000)
    vecs = []
    for seed in range(500, 500 + n_scenes):
        seq = BoxSequence(camera=cam, n_frames=40, seed=seed, turns=1.0)
        pair = []
        for i in (0, 2):  # nearby views of the same place
            f = ext(seq.render(i).astype(np.float32))
            words, _, weights = bow.transform(voc, f.desc, f.valid)
            pair.append(bow.bow_vector(words, weights, voc.n_words))
        vecs.append(pair)
    same, diff = [], []
    for a in range(n_scenes):
        same.append(float(bow.score(*vecs[a][0], *vecs[a][1])))
        for b in range(a + 1, n_scenes):
            diff.append(float(bow.score(*vecs[a][0], *vecs[b][0])))
    return float(np.mean(same) / max(np.mean(diff), 1e-9)), float(np.mean(same)), float(np.mean(diff))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "orbslam2commentedbyxcm_tpu", "assets", "bootstrap_vocab.npz",
    ))
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--max-train", type=int, default=400_000)
    args = ap.parse_args()

    alld = gather_corpus()
    print("total descriptors:", len(alld), flush=True)
    voc = bow.train_vocabulary(alld, k=args.k, depth=args.depth,
                               kmeans_iters=8, max_train=args.max_train)
    voc.save(args.out)
    print(f"trained {voc.n_words} words, {len(voc.node_desc)} nodes -> "
          f"{args.out} ({os.path.getsize(args.out)} bytes)", flush=True)
    ratio, same, diff = separation_ratio(voc)
    print(f"separation ratio {ratio:.2f} (same {same:.4f} / diff {diff:.4f})",
          flush=True)


if __name__ == "__main__":
    main()
