"""Multi-host initialization (DCN) — the >1-host growth path.

The single-host mesh code in parallel/mesh.py is host-count agnostic: after
`jax.distributed.initialize`, `jax.devices()` spans all hosts and the same
`make_mesh` call builds a global mesh whose collectives ride ICI within a slice
and DCN across slices. The reference has no multi-host story at all
(SURVEY.md section 2.3 — torch DataParallel only).

Call `ensure_initialized()` once at entry when launching under a multi-host
runtime (GKE/JobSet set the coordinator env vars automatically on Cloud TPU).
"""

from __future__ import annotations

import os

import jax

_initialized = False


def ensure_initialized() -> bool:
    """Initialize jax.distributed from standard env vars when present.

    Returns True if running (or now initialized) in multi-host mode. No-ops on
    single host (no COORDINATOR_ADDRESS/cloud TPU env detected).
    """
    global _initialized
    if _initialized:
        return True
    coord = os.environ.get("COORDINATOR_ADDRESS") or os.environ.get("JAX_COORDINATOR_ADDRESS")
    n_proc = os.environ.get("NUM_PROCESSES") or os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("PROCESS_ID") or os.environ.get("JAX_PROCESS_ID")
    if coord and n_proc and pid is not None:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(n_proc),
            process_id=int(pid),
        )
        _initialized = True
        return True
    if os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0:
        jax.distributed.initialize()  # Cloud TPU auto-detection
        _initialized = True
        return True
    return False


def local_batch_slice(global_batch: int) -> slice:
    """The [start, stop) slice of the global batch this process should load.

    Raises when the global batch does not divide evenly — silently dropping
    the remainder would desync hosts at array-assembly time."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n} processes"
        )
    per = global_batch // n
    start = jax.process_index() * per
    return slice(start, start + per)
