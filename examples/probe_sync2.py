"""Probe 2: expose the tunnel's dispatch queue depth.

probe_sync.py showed chained-matmul wall time NOT scaling with chain
length at N=3 dispatches — block_until_ready acks before execution
completes, and a deep dispatch queue hides real exec time for short
timing loops. Here we push N far beyond any plausible queue depth: once
the queue saturates, enqueue backpressure makes wall/N converge to the
REAL per-dispatch execution time.

Fetch-free. Prints wall/N for growing N; the converged value is the
ground-truth cost.
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

    @jax.jit
    def chain(a, b, k_arr):
        def body(i, c):
            return c @ b
        return jax.lax.fori_loop(0, k_arr, body, a)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.float32) * 1e-3

    print("== matmul chain k=32 (~4.4 TFLOP/dispatch, real exec ~0.05-0.1 s)")
    chain(a, b, jnp.int32(32)).block_until_ready()
    for n in (3, 10, 40, 160):
        t0 = time.perf_counter()
        for _ in range(n):
            out = chain(a, b, jnp.int32(32))
        out.block_until_ready()
        ms = (time.perf_counter() - t0) / n * 1000.0
        print(f"  N={n}: {ms:.3f} ms/dispatch", flush=True)

    from volxel_tpu.render.pathtrace import render_sample_batch

    r, _ = _build_renderer(512)
    r.render_frame()
    ops = list(r._cached_operands)

    print("== render_sample_batch k=64")
    fn = lambda fi: render_sample_batch(64, *ops, fi)
    fn(jnp.uint32(7)).block_until_ready()
    for n in (4, 16, 64, 256):
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(jnp.uint32(1000 + 64 * i))
        out.block_until_ready()
        ms = (time.perf_counter() - t0) / n * 1000.0
        print(
            f"  N={n}: {ms:.3f} ms/dispatch ({ms / 64:.4f} ms/sample)",
            flush=True,
        )

    print("== render_sample (single) for comparison")
    from volxel_tpu.render.pathtrace import render_sample

    fs = lambda fi: render_sample(*ops, fi)
    fs(jnp.uint32(3)).block_until_ready()
    for n in (10, 40, 160, 640):
        t0 = time.perf_counter()
        for i in range(n):
            out = fs(jnp.uint32(5000 + i))
        out.block_until_ready()
        ms = (time.perf_counter() - t0) / n * 1000.0
        print(f"  N={n}: {ms:.3f} ms/dispatch", flush=True)


if __name__ == "__main__":
    main()
