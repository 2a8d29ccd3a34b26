"""Place recognition at scale: candidate quality + query latency on a
1000-keyframe database (VERDICT r3 Missing #4).

The reference ships a ~1M-word ORBvoc (k=10, L=6, src/System.cc:65-75); this
framework ships a 72k-word depth-5 bootstrap artifact. The gauntlet maps top
out near ~100 keyframes, so this benchmark stresses the inverted index and
the 0.8x-max-common / min-score filters at the scale where discrimination
actually matters:

  * 4 distinct synthetic worlds (different wall textures), 250 database
    views each along an orbit -> 1000 database entries;
  * 200 query views rendered at poses BETWEEN database poses, perturbed
    with the gauntlet's exposure gain/brightness augmentation;
  * ground truth relevance = database views of the SAME world within 0.2
    orbit radians (≈ same heading, nearby position).

Reports recall@1/@5 (a relevant view among the top-k by L1 score), candidate
precision of the prefiltered query set, and median query latency against the
native inverted file.

Usage: python benchmarks/place_recognition.py [--cpu] [--views N] [--res WxH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--views", type=int, default=250, help="db views per world")
    ap.add_argument("--worlds", type=int, default=4)
    ap.add_argument("--queries", type=int, default=50, help="queries per world")
    ap.add_argument("--res", default="320x240")
    ap.add_argument("--n-features", type=int, default=600)
    args = ap.parse_args()

    import jax

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_BENCH_CACHE", "/tmp/orbslam2_tpu_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from orbslam2commentedbyxcm_tpu.models.keyframe_database import KeyFrameDatabase
    from orbslam2commentedbyxcm_tpu.ops import bow
    from orbslam2commentedbyxcm_tpu.ops.orb import ORBExtractor
    from orbslam2commentedbyxcm_tpu.utils.camera import Camera
    from orbslam2commentedbyxcm_tpu.utils.synth import BoxSequence

    w, h = (int(x) for x in args.res.split("x"))
    cam = Camera(fx=250.0 * w / 320, fy=250.0 * w / 320, cx=w / 2, cy=h / 2,
                 width=w, height=h, bf=20.0)
    voc = bow.bootstrap_vocabulary()
    ext = ORBExtractor(n_features=args.n_features)
    db = KeyFrameDatabase(voc)

    def vec_of(img):
        feats = ext(np.asarray(img, np.float32))
        desc = np.asarray(feats.desc)
        valid = np.asarray(feats.valid)
        words, _, weights = bow.transform(voc, desc, valid)
        return bow.bow_vector(words, weights, voc.n_words)

    # -- build the database -------------------------------------------------
    worlds = []
    t_build = time.perf_counter()
    for wd in range(args.worlds):
        seq = BoxSequence(camera=cam, n_frames=args.views, turns=1.0,
                          half_size=8.0, radius=2.0, seed=wd * 101 + 1)
        worlds.append(seq)
        for i in range(args.views):
            ids, vals = vec_of(seq.render(i))
            db.add(wd * 100000 + i, ids, vals)
    t_build = time.perf_counter() - t_build
    n_db = args.worlds * args.views

    # -- queries -------------------------------------------------------------
    rng = np.random.default_rng(3)
    rec1 = rec5 = 0
    precisions, latencies, cand_sizes = [], [], []
    n_q = 0
    th = 0.2  # orbit radians ~ relevance window
    for wd, seq in enumerate(worlds):
        # mid-pose queries with gauntlet-style exposure perturbation
        qidx = np.linspace(2, args.views - 3, args.queries).astype(int)
        for qi in qidx:
            img = seq.render_pose(
                0.5 * (seq.pose(int(qi)) + seq.pose(int(qi) + 1)))
            gain = 1.0 + 0.25 * float(rng.uniform(-1, 1))
            img = np.clip(img * gain + 8.0 * float(rng.uniform(-1, 1)), 0, 255)
            ids, vals = vec_of(img)
            t0 = time.perf_counter()
            kfs, scores = db._b.query(ids, vals, set(), -np.inf)
            latencies.append(time.perf_counter() - t0)
            n_q += 1
            if not kfs:
                continue
            theta_q = 2 * np.pi * (qi + 0.5) / max(args.views - 1, 1)

            def relevant(kf_id):
                if kf_id // 100000 != wd:
                    return False
                theta_d = 2 * np.pi * (kf_id % 100000) / max(args.views - 1, 1)
                d = abs(theta_q - theta_d)
                return min(d, 2 * np.pi - d) < th

            order = np.argsort(-np.asarray(scores))
            top = [kfs[i] for i in order]
            rec1 += relevant(top[0])
            rec5 += any(relevant(k) for k in top[:5])
            rel = sum(relevant(k) for k in kfs)
            precisions.append(rel / len(kfs))
            cand_sizes.append(len(kfs))

    out = {
        "metric": "place_recognition_at_scale",
        "db_keyframes": n_db,
        "vocabulary_words": int(voc.n_words),
        "queries": n_q,
        "recall_at_1": round(rec1 / max(n_q, 1), 3),
        "recall_at_5": round(rec5 / max(n_q, 1), 3),
        "candidate_precision_median": round(float(np.median(precisions)), 3) if precisions else None,
        "candidate_set_median": int(np.median(cand_sizes)) if cand_sizes else 0,
        "query_latency_ms_median": round(1e3 * float(np.median(latencies)), 3),
        "db_build_s": round(t_build, 1),
        "native_index": db.is_native,
        "res": args.res,
        "n_features": args.n_features,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
