"""Price the march's premul-majorant gather under index-locality
extremes, with LOOP-CARRIED indices (probe_partition's gather arm was
loop-invariant and XLA hoisted it — these can't hoist) and K-slopes
(T(K=160)-T(K=40))/120 so the ~26-33 ms program RTT floor cancels.

Arms at 129600 lanes against the real 512^3 premul pyramid (~300k f32):
  rand   — uniform-random positions over the volume (worst locality)
  sorted — the same positions z-major sorted (best locality)
  mip2   — random positions fetched at mip 2 (coarse level: 4k entries)
  tile   — positions quantized to a 32x16-pixel-tile-like cluster order

If even `sorted` prices >> 6.5 ns/element, the march gather is the
filled-leg wall and the in-kernel (VMEM-resident pyramid) march from
examples/probe_march_kernel.py deserves the production build next.

Usage: python examples/probe_gatherloc.py [size]
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

    from volxel_tpu.render import modes
    from volxel_tpu.render.sampling import lookup_majorant_premul

    size = int(_sys.argv[1]) if len(_sys.argv) > 1 else 512

    @jax.jit
    def trivial(x):
        return x + 1.0

    trivial(jnp.float32(1.0)).block_until_ready()
    t0 = time.perf_counter()
    float(np.asarray(trivial(jnp.float32(41.0))))
    print(f"fetch (sync-mode switch): {time.perf_counter() - t0:.1f} s", flush=True)

    r, _ = _build_renderer(size, width=1920, height=1080)
    r.render_frame()
    ops = list(r._cached_operands)
    grid, params, lut = ops[1], ops[2], ops[3]
    if getattr(grid, "maj_alpha", None) is None:
        grid = grid._replace(
            maj_alpha=modes.build_premul_majorant(grid.maj_mips, params, lut)
        )

    n = 129600
    rng = np.random.default_rng(7)
    ext = np.asarray(grid.extent, np.float32)
    pos_rand = (rng.random((n, 3), np.float32) * (ext - 2.0) + 1.0)
    key = np.lexsort((pos_rand[:, 0], pos_rand[:, 1], pos_rand[:, 2]))
    pos_sorted = pos_rand[key]
    # tile-like: cluster lanes into 384-lane groups spanning ~13x10x12
    # voxels (probe_tilequant's p50 tap-support bbox)
    ng = -(-n // 384)  # ceil: slice back to n below
    centers = rng.random((ng, 3), np.float32) * (ext - 16.0) + 8.0
    jit = rng.random((ng, 384, 3), np.float32) * np.array(
        [13, 10, 12], np.float32
    )
    pos_tile = (centers[:, None, :] + jit).reshape(-1, 3)[:n].astype(np.float32)

    def make(mip):
        def step(mask, pos):
            # loop-carried index: shift positions by the mask so XLA
            # cannot hoist the gather out of the fori loop
            p = pos + mask[:, None].astype(jnp.float32)
            mip_i = jnp.full((n,), mip, jnp.int32)
            v = lookup_majorant_premul(grid, p, mip_i)
            return v

        def g(K):
            @jax.jit
            def f(mask0, pos, grid_, params_):
                def body(i, mask):
                    v = step(mask, pos)
                    return jnp.roll(mask, 1) ^ (v[0] % 7.0 == 6.5)

                mask = jax.lax.fori_loop(0, K, body, mask0)
                return jnp.sum(mask.astype(jnp.int32))

            return f

        return g

    mask0 = jnp.asarray(rng.random(n) < 0.5)

    def slope(tag, pos, mip=0):
        pos = jnp.asarray(pos)
        g = make(mip)
        ts = {}
        for K in (40, 160):
            f = g(K)
            jax.block_until_ready(f(mask0, pos, grid, params))
            xs = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(f(mask0, pos, grid, params))
                xs.append(time.perf_counter() - t0)
            ts[K] = sorted(xs)[1]
        per = (ts[160] - ts[40]) / 120.0
        print(f"  {tag}: K40 {ts[40]*1e3:.1f} ms K160 {ts[160]*1e3:.1f} ms -> "
              f"{per*1e3:.3f} ms/iter = {per/n*1e9:.2f} ns/lane", flush=True)

    print(f"== majorant-gather locality slopes, width {n}", flush=True)
    slope("rand", pos_rand)
    slope("sorted", pos_sorted)
    slope("tile", pos_tile)
    slope("mip2", pos_rand, mip=2)


if __name__ == "__main__":
    main()
