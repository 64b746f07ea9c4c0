"""REAL profile, part 2: per-op attribution at wavefront width.

Confirms the decomposition model from profile_real.py before surgery:
  - 8-tap trilinear stencil from the dense field (phase-2's boss cost)
  - transfer-LUT lookup: gather vs exact select (mul-add reduce) form
  - stacked-pyramid majorant gather (march's cost)
  - sample_volume_dda alone vs transmittance_dda alone (loop split)
All in sync mode, chained k-times per program so the ~33 ms RTT cancels.
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

    trivial(jnp.float32(1.0)).block_until_ready()
    t0 = time.perf_counter()
    float(np.asarray(trivial(jnp.float32(41.0))))
    print(f"fetch: {time.perf_counter() - t0:.1f} s", flush=True)

    def timed(tag, fn, reps=3):
        try:
            xs = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn().block_until_ready()
                xs.append(time.perf_counter() - t0)
            print(f"  {tag}: {[round(x, 3) for x in xs]} s", flush=True)
            return sorted(xs)[len(xs) // 2]
        except Exception as e:  # noqa: BLE001
            print(f"  {tag}: FAILED {type(e).__name__}: {e}", flush=True)
            return None

    n = 131072
    rng = np.random.default_rng(0)

    r, _ = _build_renderer(256, width=960, height=540)
    r.render_frame()
    ops = list(r._cached_operands)
    config, grid, params, lut, env = ops[0], ops[1], ops[2], ops[3], ops[4]

    # positions inside the volume, f32, (n, 3)
    pos = jnp.asarray(
        rng.uniform(2.0, 253.0, (n, 3)).astype(np.float32)
    )
    mips = jnp.asarray(rng.integers(0, 4, n), jnp.int32)
    dens = jnp.asarray(rng.uniform(0.0, 1.0, n).astype(np.float32))

    from volxel_tpu.render.sampling import (
        lookup_density_trilinear,
        lookup_majorant,
        lookup_transfer,
    )

    K = 16

    def chained(fn0):
        """Chain K dependent evaluations so per-op cost = slope/K."""

        @jax.jit
        def g(p0):
            def body(i, p):
                v = fn0(p)
                return p + (v[..., None] if v.ndim == 1 else v[..., :3]) * 1e-6

            return jax.lax.fori_loop(0, K, body, p0)

        return g

    print(f"== per-op, {n} lanes, K={K} chained (divide by {K})", flush=True)

    tri = chained(lambda p: lookup_density_trilinear(grid, params, p))
    timed("trilinear 8-tap (dense 256^3)", lambda: tri(pos))

    maj = chained(lambda p: lookup_majorant(grid, params, p, mips))
    timed("majorant pyramid gather", lambda: maj(pos))

    lutg = chained(
        lambda p: lookup_transfer(lut, params.sample_range, p[..., 0] * 1e-3)
    )
    timed("transfer LUT gather (128x4)", lambda: lutg(pos))

    def lut_select(lut_arr, sample_range, density):
        k = lut_arr.shape[0]
        rejected = (density < sample_range[0]) | (density > sample_range[1])
        idx = jnp.clip(jnp.floor(density * k).astype(jnp.int32), 0, k - 1)
        sel = (idx[..., None] == jnp.arange(k, dtype=jnp.int32)).astype(
            jnp.float32
        )
        rgba = jnp.einsum("nk,kc->nc", sel, lut_arr,
                          precision=jax.lax.Precision.HIGHEST)
        return jnp.where(rejected[..., None], 0.0, rgba)

    luts = chained(
        lambda p: lut_select(lut, params.sample_range, p[..., 0] * 1e-3)
    )
    timed("transfer LUT select-einsum", lambda: luts(pos))

    def lut_select2(lut_arr, sample_range, density):
        k = lut_arr.shape[0]
        rejected = (density < sample_range[0]) | (density > sample_range[1])
        idx = jnp.clip(jnp.floor(density * k).astype(jnp.int32), 0, k - 1)
        sel = idx[..., None] == jnp.arange(k, dtype=jnp.int32)
        rgba = jnp.sum(
            jnp.where(sel[..., None], lut_arr[None, :, :], 0.0), axis=1
        )
        return jnp.where(rejected[..., None], 0.0, rgba)

    luts2 = chained(
        lambda p: lut_select2(lut, params.sample_range, p[..., 0] * 1e-3)
    )
    timed("transfer LUT select-wheresum", lambda: luts2(pos))

    # integer single-tap from dense (for comparison with the stencil)
    from volxel_tpu.render.sampling import lookup_density_brick_int

    one = chained(
        lambda p: lookup_density_brick_int(grid, p.astype(jnp.int32))
    )
    timed("single dense tap", lambda: one(pos))

    # the march loops in isolation, full wavefront width
    print("== loops in isolation (960x540 rays, chunked like the render)", flush=True)
    from volxel_tpu.render.modes import sample_volume_dda, transmittance_dda
    from volxel_tpu.render.rays import camera_rays
    from volxel_tpu.render.rng import seed_rays

    w, h = 960, 540
    npix = w * h
    pix = jnp.arange(npix, dtype=jnp.uint32)
    state0 = seed_rays(pix, jnp.uint32(3))
    tex = jnp.stack(
        [
            ((pix % w).astype(jnp.float32) + 0.5) / w,
            ((pix // w).astype(jnp.float32) + 0.5) / h,
        ],
        axis=-1,
    )
    inv_view, inv_proj = ops[5], ops[6]
    rays = camera_rays(inv_view, inv_proj, tex)
    active = jnp.ones((npix,), jnp.bool_)

    def chunked(fn):
        @jax.jit
        def g():
            def one_chunk(args):
                o, d, st, a = args
                return fn(o, d, st, a)

            c = 4
            return jax.lax.map(
                one_chunk,
                (
                    rays.origin.reshape(c, npix // c, 3),
                    rays.direction.reshape(c, npix // c, 3),
                    state0.reshape(c, npix // c, 4),
                    active.reshape(c, npix // c),
                ),
            )

        return g

    sv = chunked(
        lambda o, d, st, a: sample_volume_dda(grid, params, lut, o, d, st, a)[2]
    )
    timed("sample_volume_dda only", lambda: sv())

    tr = chunked(
        lambda o, d, st, a: transmittance_dda(grid, params, lut, o, d, st, a)[1]
    )
    timed("transmittance_dda only", lambda: tr())


if __name__ == "__main__":
    main()
