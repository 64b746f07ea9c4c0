"""Probe: does block_until_ready on this backend actually wait for the
computation, and does render_sample_batch really execute n_samples loop
iterations?

Motivated by examples/ab_batch.py measuring 0.003 ms/sample at batch 64 —
~30x less than any plausible compute floor — which implies either a sync
artifact (block returns at RPC ack, not completion) or a short-circuited
loop. Two checks, both fetch-free:

1. chained matmuls: time k data-dependent 4096^2 f32 matmuls for
   k in {1, 8, 32}; real sync must scale ~linearly in k.
2. batch scaling at fixed dispatch count: time ONE render_sample_batch
   dispatch for k in {1, 4, 16, 64}; real execution must scale ~linearly
   in k once per-dispatch overhead is amortized.
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

    # --- 1: chained matmuls ---
    @jax.jit
    def chain(a, b, k_arr):
        def body(i, c):
            return c @ b
        return jax.lax.fori_loop(0, k_arr, body, a)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.float32) * 1e-3
    for k in (1, 8, 32):
        chain(a, b, jnp.int32(k)).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(3):
            out = chain(a, b, jnp.int32(k))
        out.block_until_ready()
        ms = (time.perf_counter() - t0) / 3 * 1000.0
        print(f"matmul chain k={k}: {ms:.3f} ms/dispatch", flush=True)

    # --- 2: one batched render dispatch, k scaling ---
    from volxel_tpu.render.pathtrace import render_sample_batch

    r, _ = _build_renderer(512)
    r.render_frame()
    ops = list(r._cached_operands)
    for k in (1, 4, 16, 64):
        fn = lambda fi: render_sample_batch(k, *ops, fi)  # noqa: B023
        fn(jnp.uint32(7)).block_until_ready()
        t0 = time.perf_counter()
        for i in range(4):
            out = fn(jnp.uint32(1000 + i * k))
        out.block_until_ready()
        ms = (time.perf_counter() - t0) / 4 * 1000.0
        print(
            f"render_sample_batch k={k}: {ms:.3f} ms/dispatch "
            f"({ms / k:.4f} ms/sample)",
            flush=True,
        )


if __name__ == "__main__":
    main()
