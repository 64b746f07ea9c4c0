"""REAL profile, part 4: where do the remaining 0.61 s/sample live?

At the new operating point (compact_decode="loop", ladder
compact_secondary/compact_env, 16200-lane tile chunks, 960x540/256^3):

  full render default / no_dda / raymarch   : mode anchors
  camera sample_volume only (loop, chunked) : march share
  camera transmittance only (loop, chunked) : shadow-march share
  primitives at 16200 lanes (K=16 chained)  : gather / argsort / trilinear
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
    print(f"fetch (sync-mode switch): {time.perf_counter() - t0:.1f} s", flush=True)

    def timed(tag, fn, reps=3):
        try:
            fn().block_until_ready()  # compile + first exec excluded
            xs = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn().block_until_ready()
                xs.append(time.perf_counter() - t0)
            print(f"  {tag}: {[round(x, 3) for x in xs]} s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {tag}: FAILED {type(e).__name__}: {e}", flush=True)

    from volxel_tpu.render.pathtrace import render_sample

    r, _ = _build_renderer(256, width=960, height=540)
    r.render_frame()
    ops = list(r._cached_operands)
    config = ops[0]
    print(f"chunk_size={config.chunk_size}", flush=True)

    print("== mode anchors", flush=True)
    for mode in ("default", "no_dda", "raymarch"):
        o = list(ops)
        o[0] = config._replace(mode=mode)
        timed(f"full render {mode}", lambda o=o: render_sample(*o, jnp.uint32(101)))

    print("== camera traversal shares (chunked like the render)", flush=True)
    from volxel_tpu.render.modes import get_mode_functions
    from volxel_tpu.render.rays import camera_rays
    from volxel_tpu.render.rng import rng2, seed_rays

    grid, params, lut = ops[1], ops[2], ops[3]
    w, h = config.width, config.height
    cs = config.chunk_size

    def traversal(fn):
        @jax.jit
        def traced(grid, params, lut, inv_view, inv_proj):
            pixel_index = jnp.arange(w * h, dtype=jnp.uint32)

            def one(pi):
                state = seed_rays(pi, jnp.uint32(3))
                state, jit2 = rng2(state)
                px = (pi % jnp.uint32(w)).astype(jnp.float32)
                py = (pi // jnp.uint32(w)).astype(jnp.float32)
                tex = jnp.stack([(px + 0.5) / w, (py + 0.5) / h], axis=-1)
                ndc = tex + (jit2 * 2.0 - 1.0) / jnp.array([w, h], jnp.float32)
                rays = camera_rays(inv_view, inv_proj, ndc)
                active = jnp.ones(pi.shape, jnp.bool_)
                out = fn(
                    grid, params, lut, rays.origin, rays.direction, state, active
                )
                return out[1]

            return jax.lax.map(one, pixel_index.reshape(-1, cs)).reshape(-1)

        return traced

    inv_view = jnp.asarray(np.linalg.inv(r.camera.view_matrix()).astype(np.float32))
    inv_proj = jnp.asarray(
        np.linalg.inv(r.camera.proj_matrix(w / h)).astype(np.float32)
    )
    sv, tr = get_mode_functions("default", compact_decode="loop")
    for tag, fn in (("sample_volume loop", sv), ("transmittance loop", tr)):
        traced = traversal(fn)
        timed(tag, lambda t=traced: t(grid, params, lut, inv_view, inv_proj))

    print("== primitives at 16200 lanes (K=16 chained)", flush=True)
    n, K = 16200, 16
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    mask = jnp.asarray(rng.random(n) < 0.15)
    dense = ops[1].dense
    tabsize = int(np.prod(dense.shape))
    idx0 = jnp.asarray(rng.integers(0, tabsize, n).astype(np.int32))

    @jax.jit
    def do_gather(i0, v):
        flat = dense.reshape(-1)

        def body(k, carry):
            i, acc = carry
            g = flat[i].astype(jnp.float32)
            return (i + 7) % tabsize, acc + g

        return jax.lax.fori_loop(0, K, body, (i0, v))[1]

    timed("volume gather", lambda: do_gather(idx0, vals))

    @jax.jit
    def do_argsort(m, v):
        def body(k, v):
            order = jnp.argsort(~m, stable=True)
            return v[order] * 0.5 + v

        return jax.lax.fori_loop(0, K, body, v)

    timed("argsort(bool)+permute", lambda: do_argsort(mask, vals))

    from volxel_tpu.scene.environment import sample_environment

    env = ops[4]
    st0 = seed_rays(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(9))

    @jax.jit
    def env_warp(st):
        def body(i, carry):
            st, acc = carry
            st, xi2 = rng2(st)
            le, pdf, w_i = sample_environment(env, xi2, False)
            return st, acc + w_i * le[..., :1]

        return jax.lax.fori_loop(0, K, body, (st, jnp.zeros((n, 3), jnp.float32)))[1]

    timed("sample_environment warp", lambda: env_warp(st0))


if __name__ == "__main__":
    main()
