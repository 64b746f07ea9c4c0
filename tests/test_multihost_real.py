"""REAL 2-process jax.distributed smoke test (VERDICT r2 item 9).

Spawns two fresh CPU-backend python processes on localhost, each calling
initialize_multihost with an explicit coordinator, asserts
process_count()==2 on both, and runs one cross-process psum so the DCN
collective path is actually executed — the helper's purpose, not just its
no-op branch.
"""

from __future__ import annotations

import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_WORKER = """
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
from volxel_tpu.parallel import initialize_multihost, process_info

addr = sys.argv[1]
pid = int(sys.argv[2])
assert initialize_multihost(
    coordinator_address=addr, num_processes=2, process_id=pid
) is True
info = process_info()
assert info["process_count"] == 2, info
assert info["distributed"] is True

# one real cross-process collective: psum over both processes' devices
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

mesh = Mesh(jax.devices(), ("dp",))  # 2 global devices, 1 per process
def f(x):
    return jax.lax.psum(x, "dp")
y = jax.jit(
    shard_map(f, mesh=mesh, in_specs=P("dp"), out_specs=P())
)(jnp.arange(2, dtype=jnp.float32))
total = float(jax.device_get(y)[0])
assert total == 1.0, total  # 0 + 1 summed across processes
print(f"proc {pid} ok: count={info['process_count']} psum={total}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_initialize_and_psum():
    addr = f"127.0.0.1:{_free_port()}"
    env = {
        "PATH": "/usr/bin:/bin",
        "HOME": "/root",
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": str(REPO),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, addr, str(pid)],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out}\n{err[-2000:]}"
    assert "proc 0 ok: count=2 psum=1.0" in outs[0][1]
    assert "proc 1 ok: count=2 psum=1.0" in outs[1][1]
