"""Probe A v2: ground-truth kernel timing via the post-fetch sync mode —
fetch-EARLY variant.

probe_truth.py enqueued heavy work pre-fetch and the fetch surfaced a
worker fault; here the session is switched into sync mode by a tiny fetch
BEFORE anything heavy is enqueued, then each stage is timed one dispatch
at a time (every dispatch now takes its real execution time + ~33 ms
relay RTT; a minimal probe confirmed the mode: fetch 26.7 s, post-fetch
trivial dispatch 31.7 ms).

Stages:
  1. tiny fetch -> sync mode
  2. trivial jit floor (~33 ms)
  3. matmul chain k=1/8/32: if wall scales ~linearly with k at the real
     per-matmul cost, sync mode blocks per PROGRAM (slope timing is
     sound); if it scales at ~33 ms per loop iteration, the relay paces
     inner iterations and this mode cannot time loop-heavy kernels.
  4. renderer at 256^3 / 960x540 (small uploads), render_sample x3
  5. batch slope k=16 vs k=128 -> REAL ms/sample

Run with python -u so progress streams.
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
    def trivial(x):
        return x + 1.0

    print("== 1. tiny fetch (sync-mode switch)", flush=True)
    trivial(jnp.float32(1.0)).block_until_ready()
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

    print("== 2. RTT floor", flush=True)
    floor = timed("trivial", lambda: trivial(jnp.float32(2.0)))

    print("== 3. matmul chain scaling (compiles first)", flush=True)

    @jax.jit
    def chain(a, b, k_arr):
        def body(i, c):
            return c @ b
        return jax.lax.fori_loop(0, k_arr, body, a)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.float32) * 1e-3
    chain(a, b, jnp.int32(1)).block_until_ready()  # compile once (shared)
    t1 = timed("chain k=1", lambda: chain(a, b, jnp.int32(1)))
    t8 = timed("chain k=8", lambda: chain(a, b, jnp.int32(8)))
    t32 = timed("chain k=32", lambda: chain(a, b, jnp.int32(32)))
    slope_mm = (t32 - t8) / 24.0
    print(
        f"   slope = {slope_mm:.2f} ms/matmul (real f32 4096^2 ~1-3 ms; "
        f"~33 ms would mean per-iteration RTT pacing)",
        flush=True,
    )

    print("== 4. renderer 256^3 @ 960x540", flush=True)
    from volxel_tpu.render.pathtrace import render_sample, render_sample_batch

    r, _ = _build_renderer(256, width=960, height=540)
    r.render_frame()
    ops = list(r._cached_operands)
    ts = timed("render_sample", lambda: render_sample(*ops, jnp.uint32(50)))

    print("== 5. batch slope", flush=True)
    t16 = timed(
        "batch k=16", lambda: render_sample_batch(16, *ops, jnp.uint32(60)), reps=2
    )
    t128 = timed(
        "batch k=128", lambda: render_sample_batch(128, *ops, jnp.uint32(100)), reps=2
    )
    slope = (t128 - t16) / (128 - 16)
    print(
        f"\nRESULT: rtt_floor={floor:.1f} ms, matmul_slope={slope_mm:.2f} "
        f"ms, single={ts:.1f} ms, REAL per-sample (batch slope, 960x540 "
        f"256^3) = {slope:.4f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
