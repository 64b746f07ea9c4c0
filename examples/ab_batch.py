"""Same-process fetch-free A/B: per-frame dispatch vs batched samples.

bench.py's sweep mirrors the reference's per-frame gl.finish protocol: one
render_sample dispatch + one accumulate dispatch + a block_until_ready per
sample, each paying the tunnel's fixed per-dispatch/sync overhead
(~0.03-0.09 ms measured on healthy sessions — NOTES.md). The offline
render path (Renderer.render) instead folds K samples into ONE dispatch
(render_sample_batch, bit-compatible mean). This measures where the knee
is, i.e. how much of the headline ms/sample is dispatch overhead rather
than compute.

Protocol (NOTES.md measurement hygiene): one process, tightly interleaved
variants, multiple passes, block_until_ready only — NEVER a device->host
fetch.

Usage: python examples/ab_batch.py [size] [frames] [passes]
"""

from __future__ import annotations

import os
import sys as _sys
import time

import numpy as np

_sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_atlas import _build_renderer  # noqa: E402


def main() -> None:
    import jax.numpy as jnp

    from volxel_tpu.render.pathtrace import render_sample, render_sample_batch

    size = int(_sys.argv[1]) if len(_sys.argv) > 1 else 512
    frames = int(_sys.argv[2]) if len(_sys.argv) > 2 else 8
    passes = int(_sys.argv[3]) if len(_sys.argv) > 3 else 4

    results: dict[str, list[float]] = {}

    r, _ = _build_renderer(size)
    r.render_frame()
    ops = list(r._cached_operands)

    def timed(tag, fn, k, fi0):
        fn(jnp.uint32(fi0)).block_until_ready()  # compile/warm
        t0 = time.perf_counter()
        for i in range(frames):
            out = fn(jnp.uint32(fi0 + (1 + i) * k))
        out.block_until_ready()
        ms = (time.perf_counter() - t0) / (frames * k) * 1000.0
        results.setdefault(tag, []).append(ms)
        print(f"  {tag}: {ms:.3f} ms/sample", flush=True)

    def single(fi):
        return render_sample(*ops, fi)

    def batched(k):
        return lambda fi: render_sample_batch(k, *ops, fi)

    variants = {
        "single": (single, 1),
        "batch4": (batched(4), 4),
        "batch16": (batched(16), 16),
        "batch64": (batched(64), 64),
    }
    for p in range(passes):
        print(f"pass {p}:", flush=True)
        for tag, (fn, k) in variants.items():
            timed(tag, fn, k, fi0=100000 * p)

    print("\n== medians / bests ==")
    for tag, xs in results.items():
        print(
            f"{tag}: median {np.median(xs):.3f} best {min(xs):.3f} "
            f"runs {[round(x, 3) for x in xs]}"
        )


if __name__ == "__main__":
    main()
