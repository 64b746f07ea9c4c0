"""Honest per-op profile of the round-8 gather replacements, through the
REAL sampling.py code paths (not synthetic tables): majorant fetch
serial vs MXU, transfer LUT, warp full/tables/MXU, trilinear 8-tap vs
x-pair, partition old (2 argsorts) vs new (cumsum+scatter).

Protocol: NOTES.md ROUND-5 DISCOVERY — fetch first; each op chained K
times data-dependently inside ONE program; wall minus the loop floor,
divided by K.

Usage: python examples/profile_mxu_ops.py [size] [n_lanes]
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

    size = int(_sys.argv[1]) if len(_sys.argv) > 1 else 256
    n = int(_sys.argv[2]) if len(_sys.argv) > 2 else 131072
    k = 16

    @jax.jit
    def trivial(x):
        return x + 1.0

    t0 = time.perf_counter()
    float(np.asarray(trivial(jnp.float32(1.0))))
    print(f"sync switch: {time.perf_counter() - t0:.1f}s", flush=True)

    import volxel_tpu.render.modes as modes
    from volxel_tpu.render.modes import (
        _partition_perm,
        build_premul_majorant,
    )
    from volxel_tpu.render.mxu_gather import preferred_pack_dtype
    from volxel_tpu.render.sampling import (
        lookup_density_trilinear,
        lookup_majorant_premul,
        lookup_transfer,
        pack_dense_pairs,
        pack_premul_pyramid,
    )
    from volxel_tpu.scene.environment import (
        pack_warp_tables,
        sample_environment,
    )

    print(f"pack dtype probe: {preferred_pack_dtype()}", flush=True)
    r, _ = _build_renderer(size, width=960, height=540)
    r.render_frame()
    ops = list(r._cached_operands)
    grid, params, lut, env = ops[1], ops[2], ops[3], ops[4]
    from volxel_tpu.render.mxu_gather import pack_gather_table

    maj_alpha = build_premul_majorant(grid.maj_mips, params, lut, False)
    g_serial = grid._replace(maj_alpha=maj_alpha)
    lut_mxu = pack_gather_table(jnp.ravel(lut))
    g_mxu = g_serial._replace(maj_mxu=pack_premul_pyramid(maj_alpha))
    g_pair = grid._replace(dense_pair=pack_dense_pairs(grid.dense))
    d_mxu, e_mxu = pack_warp_tables(env.warp_d, env.warp_e)
    env_mxu = env._replace(warp_d_mxu=d_mxu, warp_e_mxu=e_mxu)
    env_bare = env._replace(warp_d=None, warp_e=None)

    rng = np.random.default_rng(0)
    ext = np.asarray(grid.extent, np.float32)
    pos = jnp.asarray((rng.random((n, 3)) * ext).astype(np.float32))
    mip = jnp.asarray(rng.integers(0, 4, n).astype(np.int32))
    dens = jnp.asarray(rng.random(n).astype(np.float32))
    rnd2 = jnp.asarray(rng.random((n, 2)).astype(np.float32))
    mask = jnp.asarray(rng.random(n) < 0.1)

    def timed(tag, f, *args):
        @jax.jit
        def chain(*a):
            def body(_, carry):
                p, acc = carry
                v = f(p, *a[1:])
                bump = jnp.zeros_like(p).at[(0,) * p.ndim].set(
                    jnp.ravel(v)[0] * 0.0
                )
                return (p + bump, acc + jnp.ravel(v)[0])

            _, acc = jax.lax.fori_loop(0, k, body, (a[0], jnp.float32(0.0)))
            return acc

        try:
            chain(*args).block_until_ready()
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                chain(*args).block_until_ready()
                walls.append(time.perf_counter() - t0)
            w = min(walls)
            print(f"{tag}: {(w - floor) / k * 1e3:8.3f} ms/eval "
                  f"(program {w:.3f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    # loop floor: the chain around a no-op
    floor = 0.0

    @jax.jit
    def fl(p):
        def body(_, c):
            return (c[0] + 0.0, c[1] + c[0][0, 0])

        return jax.lax.fori_loop(0, k, body, (p, jnp.float32(0.0)))[1]

    fl(pos).block_until_ready()
    t0 = time.perf_counter()
    fl(pos).block_until_ready()
    floor = time.perf_counter() - t0
    print(f"loop floor: {floor:.3f}s", flush=True)

    timed("majorant premul SERIAL", lambda p: lookup_majorant_premul(g_serial, p, mip), pos)
    timed("majorant premul MXU   ", lambda p: lookup_majorant_premul(g_mxu, p, mip), pos)
    timed("transfer LUT   SERIAL ", lambda p: lookup_transfer(lut, params.sample_range, dens + p[0, 0] * 0), pos)
    timed("transfer LUT   MXU    ", lambda p: lookup_transfer(lut, params.sample_range, dens + p[0, 0] * 0, mxu=lut_mxu), pos)
    timed("trilinear 8-tap SERIAL", lambda p: lookup_density_trilinear(g_serial, params, p), pos)
    timed("trilinear x-pair      ", lambda p: lookup_density_trilinear(g_pair, params, p), pos)
    timed("warp FULL (no tables) ", lambda p: sample_environment(env_bare, rnd2 + p[0, :2] * 0)[1], pos)
    timed("warp tables SERIAL    ", lambda p: sample_environment(env, rnd2 + p[0, :2] * 0)[1], pos)
    timed("warp tables MXU       ", lambda p: sample_environment(env_mxu, rnd2 + p[0, :2] * 0)[1], pos)
    timed("partition 2x argsort  ", lambda p: (jnp.argsort(jnp.argsort(~(mask | (p[0, 0] > 1e30)), stable=True), stable=True)).astype(jnp.float32), pos)
    timed("partition cumsum      ", lambda p: _partition_perm(mask | (p[0, 0] > 1e30))[1].astype(jnp.float32), pos)
    del modes


if __name__ == "__main__":
    main()
