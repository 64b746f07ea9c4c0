"""Honest sync-mode A/B at the driver-graded headline scale: x-pair
packed decode (the r9 winner at 256^3 — -15.8%) on 1080p/512^3.

Arms (defaults otherwise: warp tables ON, mxu OFF, compact_decode
"loop", march_ladder, tile chunks, premul):

  base : dense bf16 field, 8 serialized trilinear tap gathers
  pair : dense_pair u32 field, 4 pair gathers (shipped default)

Both bit-identical (tests/test_render.py::test_pair_decode_bit_identical).
Protocol: NOTES.md ROUND-5 DISCOVERY — fetch first, then per-program
walls.

Usage: python examples/ab_pair512.py [size [width height [passes]]]
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

    size = int(_sys.argv[1]) if len(_sys.argv) > 1 else 512
    width = int(_sys.argv[2]) if len(_sys.argv) > 2 else 1920
    height = int(_sys.argv[3]) if len(_sys.argv) > 3 else 1080
    passes = int(_sys.argv[4]) if len(_sys.argv) > 4 else 3

    @jax.jit
    def trivial(x):
        return x + 1.0

    trivial(jnp.float32(1.0)).block_until_ready()
    t0 = time.perf_counter()
    float(np.asarray(trivial(jnp.float32(41.0))))
    print(f"fetch (sync-mode switch): {time.perf_counter() - t0:.1f} s", flush=True)

    from volxel_tpu.render.pathtrace import render_sample
    from volxel_tpu.render.sampling import DeviceGrid

    r, _ = _build_renderer(size, width=width, height=height)
    r.render_frame()  # primes operands (pair grid — the shipped default)
    ops = list(r._cached_operands)
    grid_i = next(i for i, o in enumerate(ops) if isinstance(o, DeviceGrid))
    arms = {
        "base": ops[grid_i]._replace(dense_pair=None),
        "pair": ops[grid_i],
    }

    def run(g, fi):
        o = list(ops)
        o[grid_i] = g
        return render_sample(*o, jnp.uint32(fi))

    print("== compiling arms (excluded from timing)", flush=True)
    for tag, g in arms.items():
        t0 = time.perf_counter()
        run(g, 77).block_until_ready()
        print(f"  {tag}: first run {time.perf_counter() - t0:.1f} s", flush=True)

    times: dict[str, list[float]] = {t: [] for t in arms}
    for p in range(passes):
        print(f"== pass {p}", flush=True)
        for tag, g in arms.items():
            t0 = time.perf_counter()
            run(g, 100 + p).block_until_ready()
            dt = time.perf_counter() - t0
            times[tag].append(dt)
            print(f"  {tag}: {dt:.3f} s", flush=True)

    print("== medians", flush=True)
    base = float(np.median(times["base"]))
    for tag, xs in times.items():
        m = float(np.median(xs))
        print(f"  {tag}: {m:.3f} s/sample ({(m / base - 1) * 100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
