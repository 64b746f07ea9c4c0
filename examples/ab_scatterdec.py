"""Honest sync-mode A/B: compacted-decode prefix-scatter vs the r6 full
permutes.

The r6 _compact_decode_rgba paid pos[order] (3n serialized elements) +
rgba_p[inv] (4n) EVERY collision iteration to decode a width-w prefix;
r9 gathers pos only for order[:width] and scatters the decoded rgba
back through the same prefix (7*width accesses instead of 6n +
7*width). This measures the delta by monkeypatching the OLD form in and
tracing each arm through a fresh jit wrapper (the shipped render_sample
jit would cache-collide — the arms differ only by module code).

Usage: python examples/ab_scatterdec.py [size [width height [passes]]]
"""

from __future__ import annotations

import functools
import os
import sys as _sys
import time

import numpy as np

_sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_atlas import _build_renderer  # noqa: E402


def _old_compact_decode_rgba(grid, params, lut, pos, live, spatial=False,
                             finest=None):
    """The r6 full-permute form (modes._compact_decode_rgba before r9)."""
    import jax
    import jax.numpy as jnp

    from volxel_tpu.render import modes as m

    n = live.shape[0]
    if n < m.COMPACT_DECODE_MIN_LANES:
        return m._decode_rgba(grid, params, lut, pos)

    def no_collisions(_):
        return jnp.zeros((n, 4), jnp.float32)

    def compacted(_):
        if spatial:
            base = jnp.clip(
                jnp.floor(pos - 0.5).astype(jnp.int32), 0, grid.extent - 1
            )
            flat = (
                base[..., 2] * grid.extent[1] + base[..., 1]
            ) * grid.extent[0] + base[..., 0]
            key = jnp.where(live, flat, jnp.int32(1 << 30))
            order = jnp.argsort(key, stable=True)
            inv = m._inverse_perm(order)
        else:
            order, inv = m._partition_perm(live)
        pos_p = pos[order]
        cnt = jnp.sum(live)

        def decode_at(width):
            def f(_):
                rgba_w = m._decode_rgba(grid, params, lut, pos_p[:width])
                return jnp.concatenate(
                    [rgba_w, jnp.zeros((n - width, 4), jnp.float32)], axis=0
                )

            return f

        rgba_p = m._width_ladder(
            cnt, m._compact_widths(n, finest), decode_at, decode_at(n), 0
        )
        return rgba_p[inv]

    return jax.lax.cond(jnp.any(live), compacted, no_collisions, 0)


def main() -> None:
    import jax
    import jax.numpy as jnp

    size = int(_sys.argv[1]) if len(_sys.argv) > 1 else 256
    width = int(_sys.argv[2]) if len(_sys.argv) > 2 else 960
    height = int(_sys.argv[3]) if len(_sys.argv) > 3 else 540
    passes = int(_sys.argv[4]) if len(_sys.argv) > 4 else 3

    @jax.jit
    def trivial(x):
        return x + 1.0

    trivial(jnp.float32(1.0)).block_until_ready()
    t0 = time.perf_counter()
    float(np.asarray(trivial(jnp.float32(41.0))))
    print(f"fetch (sync-mode switch): {time.perf_counter() - t0:.1f} s", flush=True)

    import volxel_tpu.render.modes as modes
    import volxel_tpu.render.pathtrace as pt

    r, _ = _build_renderer(size, width=width, height=height)
    r.render_frame()
    ops = list(r._cached_operands)

    raw = pt.render_sample.__wrapped__

    new_impl = modes._compact_decode_rgba
    fns = {}
    print("== compiling arms (excluded from timing)", flush=True)
    for tag, impl in (("scatter", new_impl), ("permute", _old_compact_decode_rgba)):
        modes._compact_decode_rgba = impl
        f = functools.partial(jax.jit(raw, static_argnums=(0,)))
        t0 = time.perf_counter()
        f(*ops, jnp.uint32(77)).block_until_ready()
        print(f"  {tag}: first run {time.perf_counter() - t0:.1f} s", flush=True)
        fns[tag] = f
        modes._compact_decode_rgba = new_impl

    # NOTE: each arm's jit wrapper retains its traced program, so pass
    # interleaving works; the monkeypatch only matters at trace time.
    times: dict[str, list[float]] = {t: [] for t in fns}
    for p in range(passes):
        print(f"== pass {p}", flush=True)
        for tag, f in fns.items():
            t0 = time.perf_counter()
            f(*ops, jnp.uint32(100 + p)).block_until_ready()
            dt = time.perf_counter() - t0
            times[tag].append(dt)
            print(f"  {tag}: {dt:.3f} s", flush=True)

    print("== medians", flush=True)
    base = float(np.median(times["permute"]))
    for tag, xs in times.items():
        m = float(np.median(xs))
        print(f"  {tag}: {m:.3f} s/sample ({(m / base - 1) * 100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
