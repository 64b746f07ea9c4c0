"""Honest sync-mode A/B: trilinear decode packing rungs pair/quad/octo.

probe_wide_gather.py measured that XLA TPU prices a complex64 gather
(8 B = 4 bf16 taps) AND a trailing size-2/4 u32 row-gather window like a
SINGLE element access (~11 ns/elem at dense-field table sizes) — so the
8-tap trilinear decode can drop from 4 gathers (shipped x-pair) to 2
(xy-quad, complex64) or 1 (full stencil, (Z,Y,X,4) u32 row). pair won
-18.4% real at 1080p when it halved 8 -> 4; this measures the next rungs.

Also re-probes the micro cost of a size-4 row window (the octo fetch
shape) at 134M rows, and bit-compares one fetched frame across arms.

Usage: python -u examples/ab_packdec.py [size [width height [passes]]]
"""

from __future__ import annotations

import os
import sys as _sys
import time

import numpy as np

_examples = os.path.dirname(os.path.abspath(__file__))
_sys.path.insert(0, _examples)
_sys.path.insert(0, os.path.dirname(_examples))
from ab_atlas import _build_renderer  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    size = int(_sys.argv[1]) if len(_sys.argv) > 1 else 256
    width = int(_sys.argv[2]) if len(_sys.argv) > 2 else 960
    height = int(_sys.argv[3]) if len(_sys.argv) > 3 else 540
    passes = int(_sys.argv[4]) if len(_sys.argv) > 4 else 3
    which = (_sys.argv[5].split(",") if len(_sys.argv) > 5
             else ["pair", "quad", "octo"])

    @jax.jit
    def trivial(x):
        return x + 1.0

    trivial(jnp.float32(1.0)).block_until_ready()
    t0 = time.perf_counter()
    float(np.asarray(trivial(jnp.float32(41.0))))
    print(f"fetch (sync-mode switch): {time.perf_counter() - t0:.1f} s", flush=True)

    # ---- micro: u32 size-4 row window at dense-field scale ----------------
    n_lanes = 131072
    rng = np.random.default_rng(0)
    for n in (1 << 24,) if size < 512 else ():
        tab = jax.jit(
            lambda n=n: jnp.stack([jnp.arange(n, dtype=jnp.uint32) % 3] * 4, 1)
        )()
        tab.block_until_ready()
        i0 = jnp.asarray(rng.integers(0, n, n_lanes).astype(np.int32))

        def chain(k, n=n, tab=tab):
            @jax.jit
            def g(tab, idx0):
                def body(i, idx):
                    v = tab[idx]
                    return (idx + (v[..., 0] & jnp.uint32(3)).astype(jnp.int32) + 7) % n

                return jax.lax.fori_loop(0, k, body, idx0)

            return g

        def best(fn, reps=3):
            xs = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn().block_until_ready()
                xs.append(time.perf_counter() - t0)
            return min(xs)

        try:
            g24, g4 = chain(24), chain(4)
            t24 = best(lambda: g24(tab, i0))
            t4 = best(lambda: g4(tab, i0))
            per = (t24 - t4) / 20.0 * 1000.0
            print(
                f"micro u32x4row n={n}: {per:.2f} ms/gather "
                f"({per * 1e6 / n_lanes:.1f} ns/row)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"micro u32x4row: FAILED {type(e).__name__}: {e}", flush=True)
        del tab

    # ---- render arms ------------------------------------------------------
    from volxel_tpu.render.pathtrace import render_sample
    from volxel_tpu.render.sampling import pack_dense_octo, pack_dense_quads

    r, _ = _build_renderer(size, width=width, height=height)
    r.render_frame()
    ops = list(r._cached_operands)
    config = ops[0]
    g_base = ops[1]
    dense = g_base.dense
    # the renderer default may already be octo — normalize to explicit arms
    g_base = g_base._replace(dense_pair=None, dense_quad=None, dense_octo=None)
    arms = {}
    if "pair" in which:
        from volxel_tpu.render.sampling import pack_dense_pairs

        arms["pair"] = g_base._replace(
            dense_pair=jax.jit(pack_dense_pairs)(dense)
        )
        arms["pair"].dense_pair.block_until_ready()
    if "quad" in which:
        arms["quad"] = g_base._replace(
            dense_quad=jax.jit(pack_dense_quads)(dense)
        )
        arms["quad"].dense_quad.block_until_ready()
    if "octo" in which:
        arms["octo"] = g_base._replace(
            dense_octo=jax.jit(pack_dense_octo)(dense)
        )
        arms["octo"].dense_octo.block_until_ready()

    def run(g, fi):
        o = list(ops)
        o[1] = g
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
    med = {}
    for tag, xs in times.items():
        med[tag] = float(np.median(xs))
        print(f"  {tag}: {med[tag]:.3f} s/sample", flush=True)
    base = med.get("pair")
    for tag in ("quad", "octo"):
        if base and tag in med:
            print(f"  {tag} vs pair: {100 * (med[tag] / base - 1):+.1f}%", flush=True)

    # bit-compare one frame across arms (fetches are fine post-switch)
    frames = {tag: np.asarray(run(g, 4242)) for tag, g in arms.items()}
    for tag in ("quad", "octo"):
        if tag in frames and "pair" in frames:
            same = (
                frames[tag].view(np.uint32) == frames["pair"].view(np.uint32)
            ).all()
            print(f"  {tag} bit-identical to pair: {bool(same)}", flush=True)


if __name__ == "__main__":
    main()
