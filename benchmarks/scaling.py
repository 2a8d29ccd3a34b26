"""Distributed-BA scaling efficiency on an N-virtual-device CPU mesh.

Measures the BASELINE.md target "≥70% scaling efficiency at 2+ hosts" for the
landmark-sharded Schur BA (`parallel/dist_ba.py`), strong-scaling a fixed
global-BA problem over meshes of 1/2/4/8 devices. Real multi-chip hardware is
not available in this environment, so the mesh is
`--xla_force_host_platform_device_count=N` virtual CPU devices — each shard
executes on its own host thread, so the measured parallel efficiency reflects
the program's actual computation/communication split (psum of one K*6 vector
per CG iteration for the matrix-free path).

Prints one JSON line per (path, n_devices):
  {"metric": "dist_ba_<path>_d<N>", "value": ms, "unit": "ms/solve",
   "efficiency_vs_1dev": eff}

Usage: python benchmarks/scaling.py [--poses 48] [--points 4096] [--obs-per-point 4]
"""

import argparse
import functools
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def build_problem(k, p, obs_per_point, seed=0):
    """Synthetic global-BA problem: a forward trajectory observing a cloud."""
    rng = np.random.default_rng(seed)
    poses = np.tile(np.eye(4, dtype=np.float32), (k, 1, 1))
    poses[:, 0, 3] = 0.15 * np.arange(k)
    pts = np.stack(
        [
            rng.uniform(-3, 0.15 * k + 3, p),
            rng.uniform(-3, 3, p),
            rng.uniform(4, 9, p),
        ],
        -1,
    ).astype(np.float32)
    fx = fy = 250.0
    cx, cy, bf = 160.0, 120.0, -1.0
    e = p * obs_per_point
    obs_point = np.repeat(np.arange(p), obs_per_point).astype(np.int32)
    obs_pose = rng.integers(0, k, e).astype(np.int32)
    pc = (
        np.einsum("eij,ej->ei", poses[obs_pose][:, :3, :3], pts[obs_point])
        + poses[obs_pose][:, :3, 3]
    )
    uv = np.stack(
        [
            fx * pc[:, 0] / pc[:, 2] + cx + rng.normal(0, 0.5, e),
            fy * pc[:, 1] / pc[:, 2] + cy + rng.normal(0, 0.5, e),
            -np.ones(e),
        ],
        -1,
    ).astype(np.float32)
    mask = pc[:, 2] > 0.5
    fixed = np.zeros(k, bool)
    fixed[0] = True
    # perturb initial state so LM does real work
    poses_init = poses.copy()
    poses_init[1:, :3, 3] += rng.normal(0, 0.03, (k - 1, 3)).astype(np.float32)
    pts_init = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    return (
        poses_init,
        fixed,
        pts_init,
        np.ones(p, bool),
        obs_pose,
        obs_point,
        uv,
        mask,
        np.ones(e, np.float32),
        (fx, fy, cx, cy, bf),
    )


def _force_cpu():
    # the hosted "axon" TPU plugin ignores the JAX_PLATFORMS env var; force
    # the virtual-device CPU platform via the config API as well
    import jax

    jax.config.update("jax_platforms", "cpu")


def run(n_devices_list=(1, 2, 4, 8), k=48, p=4096, obs_per_point=4, reps=3):
    _force_cpu()
    import jax
    import jax.numpy as jnp

    from orbslam2commentedbyxcm_tpu.parallel import dist_ba

    (
        poses0, fixed, pts, pv, op, opt_, uv, mask, sig, intr
    ) = build_problem(k, p, obs_per_point)
    results = {}
    base_cost = None
    for path in ("cg", "dense"):
        t1 = None
        for nd in n_devices_list:
            if nd > len(jax.devices()):
                continue
            mesh = dist_ba.make_mesh(nd)
            sharded = dist_ba.shard_ba_problem(pts, pv, op, opt_, uv, mask, sig, nd)
            sharded = [jnp.asarray(a) for a in sharded]
            pts_sh, pv_sh, gidx, op_sh, opt_sh, ouv_sh, om_sh, osig_sh = sharded
            fn = (
                dist_ba.distributed_bundle_adjustment_cg
                if path == "cg"
                else dist_ba.distributed_bundle_adjustment
            )
            args = (
                mesh, jnp.asarray(poses0), jnp.asarray(fixed),
                pts_sh, pv_sh, op_sh, opt_sh, ouv_sh, om_sh, osig_sh, *intr,
            )
            kw = {"n_iters": 6}
            if path == "cg":
                kw["n_cg"] = 15
            out = fn(*args, **kw)
            jax.block_until_ready(out)
            cost = float(out[2] if isinstance(out, tuple) else out[-1])
            best = np.inf
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(*args, **kw))
                best = min(best, time.perf_counter() - t0)
            ms = best * 1000.0
            if t1 is None:
                t1 = ms
                base_cost = cost
            eff = t1 / (nd * ms)
            rec = {
                "metric": f"dist_ba_{path}_d{nd}",
                "value": round(ms, 2),
                "unit": "ms/solve",
                "efficiency_vs_1dev": round(eff, 3),
                "final_cost": round(cost, 2),
            }
            results[(path, nd)] = rec
            print(json.dumps(rec), flush=True)
            # solution parity across shard counts
            if base_cost and abs(cost - base_cost) > 0.05 * abs(base_cost):
                print(json.dumps({"warning": f"cost drift at d{nd}: {cost} vs {base_cost}"}))
    return results


def run_frontend_dp(n_devices=8):
    """Data-parallel frontend: one frame per device under shard_map.

    The mapping/loop threads of the reference process one keyframe at a time;
    this framework's batch axis (SURVEY §2.3 "dp over frames") lets N chips
    extract N frames concurrently — the throughput mode for multi-session
    mapping / offline map building. This host has too few cores for
    virtual-device *timing* to mean anything (XLA:CPU already multi-threads a
    single device across all cores), so this check verifies the two things
    that determine real-hardware scaling instead:

      1. the compiled sharded program contains ZERO cross-device collectives
         (inspected from the optimized HLO) — per-frame work is fully
         independent, so throughput on a real slice scales linearly with
         chips by construction;
      2. per-device outputs are bit-identical to the unsharded program.
    """
    _force_cpu()
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    from orbslam2commentedbyxcm_tpu.ops.orb import ORBExtractor
    from orbslam2commentedbyxcm_tpu.parallel import dist_ba

    h, w = 240, 320
    ext = ORBExtractor(n_features=300, n_levels=4, use_pallas=False)
    rng = np.random.default_rng(0)
    nd = min(n_devices, len(jax.devices()))
    mesh = dist_ba.make_mesh(nd)
    imgs = rng.uniform(0, 255, (nd, h, w)).astype(np.float32)

    def one(imgs_shard):
        f = ext._extract(imgs_shard[0], shape=(h, w))
        return f.desc[None], f.uv[None]

    fn = jax.jit(
        shard_map(
            one, mesh=mesh, in_specs=(P(mesh.axis_names[0]),),
            out_specs=(P(mesh.axis_names[0]),) * 2, check_vma=False,
        )
    )
    compiled = fn.lower(jnp.asarray(imgs)).compile()
    hlo = compiled.as_text()
    collectives = [
        op for op in (
            "all-reduce", "all-gather", "all-to-all", "collective-permute",
            "reduce-scatter",
        ) if op in hlo
    ]
    desc_dp, uv_dp = fn(jnp.asarray(imgs))
    # parity vs the unsharded per-frame program
    f0 = jax.jit(functools.partial(ext._extract, shape=(h, w)))(jnp.asarray(imgs[0]))
    exact = bool(
        np.array_equal(np.asarray(desc_dp[0]), np.asarray(f0.desc))
        and np.array_equal(np.asarray(uv_dp[0]), np.asarray(f0.uv))
    )
    print(
        json.dumps(
            {
                "metric": f"frontend_dp_d{nd}",
                "value": nd,
                "unit": "frames/step",
                "collectives_in_hlo": collectives,
                "matches_unsharded": exact,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=48)
    ap.add_argument("--points", type=int, default=4096)
    ap.add_argument("--obs-per-point", type=int, default=4)
    ap.add_argument(
        "--bench", choices=("dist_ba", "frontend_dp", "all"), default="all"
    )
    args = ap.parse_args()
    if args.bench in ("dist_ba", "all"):
        run(k=args.poses, p=args.points, obs_per_point=args.obs_per_point)
    if args.bench in ("frontend_dp", "all"):
        run_frontend_dp()
