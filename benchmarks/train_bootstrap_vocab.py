"""Regenerate the packaged bootstrap vocabulary (assets/bootstrap_vocab.npz).

Corpus: descriptors from varied synthetic scenes (plane sequences + box
orbits over many texture seeds) — the same generator family the framework's
tests/benchmarks use, so the tree is matched to the extractor's BRIEF-pattern
descriptor distribution. k=10, depth=4 -> ~10k words (the reference's
ORBvoc is k=10, L=6 -> 1M words, trained on real imagery at far larger
corpus scale; grow the corpus + depth the same way for a production tree).

Usage: python benchmarks/train_bootstrap_vocab.py [OUT.npz]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from orbslam2commentedbyxcm_tpu.ops import bow  # noqa: E402
from orbslam2commentedbyxcm_tpu.ops.orb import ORBExtractor  # noqa: E402
from orbslam2commentedbyxcm_tpu.utils.camera import Camera  # noqa: E402
from orbslam2commentedbyxcm_tpu.utils.synth import (  # noqa: E402
    BoxSequence,
    SyntheticSequence,
)


def main(out_path: str):
    cam = Camera(fx=250.0, fy=250.0, cx=160.0, cy=120.0, width=320, height=240,
                 bf=20.0, th_depth=40.0)
    ext = ORBExtractor(n_features=800)
    descs = []

    for seed in range(14):
        seq = SyntheticSequence(camera=cam, n_frames=4, seed=seed,
                                trajectory=("sideways" if seed % 2 else "forward"))
        for i in range(4):
            f = ext(seq.render(i))
            descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
        print(f"plane scene {seed}: {sum(len(d) for d in descs)} descs", flush=True)

    for seed in range(100, 108):
        seq = BoxSequence(camera=cam, n_frames=10, seed=seed, turns=1.0)
        for i in range(0, 10, 2):
            f = ext(seq.render(i))
            descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
        print(f"box scene {seed}: {sum(len(d) for d in descs)} descs", flush=True)

    alld = np.concatenate(descs)
    print("total descriptors:", len(alld), flush=True)
    voc = bow.train_vocabulary(alld, k=10, depth=4, kmeans_iters=8)
    voc.save(out_path)
    print(f"trained {voc.n_words} words, {len(voc.node_desc)} nodes -> "
          f"{out_path} ({os.path.getsize(out_path)} bytes)")


if __name__ == "__main__":
    default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "orbslam2commentedbyxcm_tpu", "assets", "bootstrap_vocab.npz",
    )
    main(sys.argv[1] if len(sys.argv) > 1 else default)
