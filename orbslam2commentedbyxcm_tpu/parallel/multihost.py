"""Multi-host process groups and hybrid DCN x ICI device meshes.

The reference is a single-process C++ system whose only parallelism is
std::thread (SURVEY.md §2.3); it has no distributed backend to port. This
module is the TPU-native scaling layer the survey calls for instead:

  * `initialize()` brings up the JAX multi-host process group
    (`jax.distributed.initialize`) from explicit args or the standard env
    vars — after it, `jax.devices()` spans every host's chips.
  * `make_hybrid_mesh()` lays the global device list out as a
    ('dcn', 'ici') mesh: the fast dimension enumerates chips that share a
    slice (ICI-connected), the slow dimension crosses hosts/slices (DCN).

`parallel/dist_ba` reduces its Schur camera system with a psum over EVERY
mesh axis, so on a hybrid mesh XLA emits a hierarchical reduction: the
per-landmark Schur contributions combine over ICI inside each slice first,
and only the reduced (K*6)-sized camera terms cross DCN — the
bandwidth-optimal layout for distributed global bundle adjustment
(BASELINE.json configs[4]: partitioned keyframe blocks, >=70% scaling
efficiency at 2+ hosts).

Single-host use is unchanged: `make_hybrid_mesh()` degrades to a flat
('ici',) mesh over the local devices.
"""

from __future__ import annotations

import os

import numpy as np


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Bring up the multi-host process group. Returns True if distributed
    mode is active (now or already), False for plain single-process JAX.

    Arguments default to the standard launcher env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); on cloud
    TPU pods `jax.distributed.initialize()` also autodetects everything, so
    explicit values are only needed for hand-rolled launches.
    """
    import jax

    if getattr(jax.distributed, "is_initialized", None) and jax.distributed.is_initialized():
        return True
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if coordinator_address is None and num_processes is None:
        return False  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_hybrid_mesh(devices=None, dcn_axis: str = "dcn", ici_axis: str = "ici"):
    """Global ('dcn', 'ici') mesh: ici enumerates same-process (same-slice,
    ICI-connected) chips, dcn crosses processes. Falls back to a flat
    ('ici',) mesh when everything lives in one process."""
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    n_proc = getattr(jax, "process_count", lambda: 1)()
    if n_proc <= 1:
        return Mesh(np.array(devices), (ici_axis,))
    per_proc = len(devices) // n_proc
    # sort by (process, local id) so rows of the mesh are single-process
    devs = sorted(devices, key=lambda d: (d.process_index, d.id))
    arr = np.array(devs).reshape(n_proc, per_proc)
    return Mesh(arr, (dcn_axis, ici_axis))


def make_mesh_2d(n_dcn: int, n_ici: int, devices=None):
    """Explicit (n_dcn, n_ici) mesh over the given/global devices — used by
    tests to exercise the hybrid code path on virtual CPU devices."""
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    if len(devices) < n_dcn * n_ici:
        raise ValueError(f"need {n_dcn * n_ici} devices, have {len(devices)}")
    arr = np.array(devices[: n_dcn * n_ici]).reshape(n_dcn, n_ici)
    return Mesh(arr, ("dcn", "ici"))
