"""Probe A: ground-truth kernel timing via the tunnel's post-fetch
synchronous mode.

Context (NOTES.md + examples/probe_sync*.py): the axon relay acks
dispatches optimistically — fetch-free block_until_ready timings measure
the relay's speculator, not the chip (160 chained-matmul dispatches
"completed" at 47 exaFLOPS). The first device->host fetch switches the
session into a synchronous mode where every dispatch pays ~33 ms of relay
RTT but (hypothesis) actually waits for execution. If true, REAL kernel
time = slope of dispatch wall time vs in-dispatch work, with the fixed
RTT cancelling.

Sequence (each step prints before the next starts):
  1. warm/compile everything (pre-fetch, cheap acks)
  2. ONE tiny fetch — timed (expect the known ~4 min stall)
  3. trivial jit          -> the RTT floor (expect ~33 ms)
  4. matmul chain k=1/8/32 -> must scale ~linearly in k if sync mode
     blocks per PROGRAM; ~33 ms * k if each while_loop iteration pays RTT
     (then this mode is useless for loop-heavy kernels and probe B is
     needed)
  5. render_sample single  -> 33 ms + real sample time (or ~30 s if 4's
     per-iteration story holds)
  6. render_sample_batch k=32 / k=256 -> slope = REAL ms/sample
"""

from __future__ import annotations

import os
import sys as _sys
import time

import numpy as np

_sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_atlas import _build_renderer  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from volxel_tpu.render.pathtrace import render_sample, render_sample_batch

    @jax.jit
    def trivial(x):
        return x + 1.0

    @jax.jit
    def chain(a, b, k_arr):
        def body(i, c):
            return c @ b
        return jax.lax.fori_loop(0, k_arr, body, a)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.float32) * 1e-3

    print("== 1. warm/compile (pre-fetch)", flush=True)
    r, _ = _build_renderer(512)
    r.render_frame()
    ops = list(r._cached_operands)
    trivial(jnp.float32(1.0)).block_until_ready()
    chain(a, b, jnp.int32(1)).block_until_ready()
    render_sample(*ops, jnp.uint32(1)).block_until_ready()
    render_sample_batch(32, *ops, jnp.uint32(2)).block_until_ready()
    render_sample_batch(256, *ops, jnp.uint32(3)).block_until_ready()
    print("   compiles done", flush=True)

    print("== 2. the fetch (expect ~4 min stall)", flush=True)
    t0 = time.perf_counter()
    v = float(np.asarray(trivial(jnp.float32(41.0))))
    print(f"   fetch: {time.perf_counter() - t0:.1f} s (value {v})", flush=True)

    def timed(tag, fn, reps=3):
        xs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn().block_until_ready()
            xs.append((time.perf_counter() - t0) * 1000.0)
        print(f"   {tag}: {[round(x, 1) for x in xs]} ms", flush=True)
        return min(xs)

    print("== 3. RTT floor", flush=True)
    floor = timed("trivial", lambda: trivial(jnp.float32(2.0)))

    print("== 4. matmul chain scaling", flush=True)
    t1 = timed("chain k=1", lambda: chain(a, b, jnp.int32(1)))
    t8 = timed("chain k=8", lambda: chain(a, b, jnp.int32(8)))
    t32 = timed("chain k=32", lambda: chain(a, b, jnp.int32(32)))
    print(
        f"   slope (k32-k8)/24 = {(t32 - t8) / 24.0:.2f} ms/matmul "
        f"(f32 4096^2 real ~1-3 ms)",
        flush=True,
    )

    print("== 5. render_sample single", flush=True)
    ts = timed("render_sample", lambda: render_sample(*ops, jnp.uint32(50)))

    print("== 6. batch slope", flush=True)
    t32b = timed("batch k=32", lambda: render_sample_batch(32, *ops, jnp.uint32(60)))
    t256b = timed(
        "batch k=256", lambda: render_sample_batch(256, *ops, jnp.uint32(100)), reps=2
    )
    slope = (t256b - t32b) / (256 - 32)
    print(
        f"\nRESULT: rtt_floor={floor:.1f} ms, single={ts:.1f} ms, "
        f"REAL per-sample (batch slope) = {slope:.4f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
