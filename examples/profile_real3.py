"""REAL profile, part 3: flag A/Bs + the missing ~4 s + compaction
primitive costs. Sync mode; every number is true chip time.

Arms (960x540, 256^3, benchmark scene):
  baseline / premul / compact_secondary / both : 3 reps each — decides
      the real defaults for the two bit-identical flags
  env machinery: sample_environment warp + lookup_environment at
      wavefront width (the unexplained 9.44 - 4.33 - 0.86 residual)
  argsort/top_k/cumsum at 131k lanes: is sort-based lane compaction
      cheaper than the 15-18 ms/outer-iter gather block it would shrink?
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

    from volxel_tpu.render.pathtrace import render_sample

    r, _ = _build_renderer(256, width=960, height=540)
    r.render_frame()
    ops = list(r._cached_operands)
    config, grid, params, lut, env = ops[0], ops[1], ops[2], ops[3], ops[4]

    def arm(tag, cfg, fi=77, reps=3):
        o = list(ops)
        o[0] = cfg
        # compile (and first exec) outside the timing
        render_sample(*o, jnp.uint32(fi)).block_until_ready()
        return timed(tag, lambda: render_sample(*o, jnp.uint32(fi + 1)), reps)

    print("== flag A/Bs (compile excluded)", flush=True)
    arm("baseline", config)
    arm("premul", config._replace(premul_majorant=True))
    arm("compact_secondary", config._replace(compact_secondary=True))
    arm(
        "premul+compact",
        config._replace(premul_majorant=True, compact_secondary=True),
    )

    print("== env machinery at 131072 lanes, K=16 chained", flush=True)
    n = 131072
    K = 16
    rng = np.random.default_rng(0)
    from volxel_tpu.scene.environment import (
        lookup_environment,
        pdf_environment,
        sample_environment,
    )
    from volxel_tpu.render.rng import rng2, seed_rays

    dirs = rng.standard_normal((n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs_j = jnp.asarray(dirs)
    st0 = seed_rays(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(9))

    @jax.jit
    def env_warp(st):
        def body(i, carry):
            st, acc = carry
            st, xi2 = rng2(st)
            le, pdf, w_i = sample_environment(env, xi2, False)
            return st, acc + w_i * le[..., :1]

        return jax.lax.fori_loop(
            0, K, body, (st, jnp.zeros((n, 3), jnp.float32))
        )[1]

    env_warp(st0).block_until_ready()
    timed("sample_environment warp", lambda: env_warp(st0))

    @jax.jit
    def env_look(d0):
        def body(i, d):
            le = lookup_environment(env, d)
            return d + le * 1e-7

        return jax.lax.fori_loop(0, K, body, d0)

    env_look(dirs_j).block_until_ready()
    timed("lookup_environment bilinear", lambda: env_look(dirs_j))

    @jax.jit
    def env_pdf(d0):
        def body(i, d):
            p = pdf_environment(env, d, False)
            return d + p[..., None] * 1e-7

        return jax.lax.fori_loop(0, K, body, d0)

    env_pdf(dirs_j).block_until_ready()
    timed("pdf_environment", lambda: env_pdf(dirs_j))

    print("== compaction primitives at 131072 lanes (K=16)", flush=True)
    mask = jnp.asarray(rng.random(n) < 0.15)
    vals = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    @jax.jit
    def do_argsort(m, v):
        def body(i, v):
            order = jnp.argsort(~m, stable=True)
            return v[order] * 0.5 + v

        return jax.lax.fori_loop(0, K, body, v)

    do_argsort(mask, vals).block_until_ready()
    timed("argsort(bool) + permute", lambda: do_argsort(mask, vals))

    @jax.jit
    def do_cumsum(m, v):
        def body(i, v):
            slots = jnp.cumsum(m.astype(jnp.int32)) - 1
            return v + slots.astype(jnp.float32) * 1e-9

        return jax.lax.fori_loop(0, K, body, v)

    do_cumsum(mask, vals).block_until_ready()
    timed("cumsum slots", lambda: do_cumsum(mask, vals))

    @jax.jit
    def do_scatter(m, v):
        def body(i, v):
            slots = jnp.where(m, jnp.cumsum(m.astype(jnp.int32)) - 1, n - 1)
            out = jnp.zeros((n,), jnp.float32).at[slots].set(v)
            return v + out * 1e-9

        return jax.lax.fori_loop(0, K, body, v)

    do_scatter(mask, vals).block_until_ready()
    timed("cumsum + scatter compact", lambda: do_scatter(mask, vals))


if __name__ == "__main__":
    main()
