"""Multi-process (multi-host) initialization: jax.distributed over DCN.

The reference is single-browser-tab; its only cross-context transport is
Worker postMessage (worker.ts:55-57). The TPU-native scaling story extends
past one host: each host process runs the same program, jax.distributed
wires them into one logical device set, and the existing mesh axes
(sp/px/vz, parallel/mesh.py) span all hosts — intra-host collectives ride
ICI, cross-host ones DCN. Single-process behavior is unchanged: calling
initialize_multihost() with num_processes == 1 (the default when no
environment is detected) is a no-op.

Typical use on a multi-host TPU pod slice (or a CPU test rig):

    from volxel_tpu.parallel import initialize_multihost, make_mesh
    initialize_multihost()          # no-op on a single host
    mesh = make_mesh(sp=2, px=2, vz=2)   # spans every host's devices

jax.distributed.initialize auto-detects coordinator/process_id on Cloud
TPU metadata; elsewhere pass them explicitly or via the standard
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars.
"""

from __future__ import annotations

import os

_initialized = False


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed if this looks like a multi-process run.

    Returns True when distributed mode was (or already is) active, False
    for the single-process no-op path. Safe to call multiple times.
    """
    global _initialized
    if _initialized:
        return True

    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None

    on_cloud_tpu = os.path.exists("/var/run/tpu") or bool(
        os.environ.get("TPU_WORKER_HOSTNAMES")
    )
    if coordinator_address is None and not on_cloud_tpu:
        return False  # single process: nothing to do
    if num_processes == 1:
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def process_info() -> dict:
    """Process/device topology summary for logs and benchmark records."""
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
        "distributed": _initialized,
    }
