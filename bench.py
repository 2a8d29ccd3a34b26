"""Benchmark: frontend tracking throughput on one chip.

Measures the flagship per-frame path (ORB pyramid extraction at 640x480 with a
1000-feature budget -> projection-gated MXU Hamming matching against a 2048-
point local map -> 4x10-iteration LM pose optimization) as one fused jitted
program — the same composition as the reference's per-frame hot loops 1-3
(SURVEY.md §3.2: ORBextractor::operator(), SearchByProjection,
PoseOptimization).

Baseline: the reference publishes no numbers (BASELINE.md); its README claims
real-time (= 30 fps camera rate) at this exact config on an i7 CPU
(/root/reference/README.md:65, src/Tracking.cc:129-137). vs_baseline is
therefore frames/s / 30.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    import __graft_entry__ as graft

    fn, args = graft.entry()
    step = jax.jit(fn)
    args = [jax.device_put(a) for a in args]

    # compile + warmup
    out = step(*args)
    jax.block_until_ready(out)

    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = step(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n_iters / dt

    baseline_fps = 30.0  # reference "real-time on i7" claim; see module docstring
    print(
        json.dumps(
            {
                "metric": "frontend_tracking_fps_640x480_1000feat",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
