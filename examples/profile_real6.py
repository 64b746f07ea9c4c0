"""REAL profile, part 6: where the r9 1.074 s/sample (1080p/512^3,
pair decode ON, mxu OFF) lives.

Arms (all full render_sample calls, config tweaks only):
  default        : the shipped operating point (baseline)
  debug_hits     : ray-AABB only — the wavefront/setup floor
  no_env         : use_env=False (directional-light fallback) — removes
                   the NEE hierarchical warp + escape lookup/pdf;
                   different draws, same machinery cost shape
  no_ladder      : march_ladder=False — the ladder's net at this scale
  no_compactsec  : compact_secondary=False
  bounces3       : the reference's default bounce count (benchmark uses 1)
plus loop splits at the camera wavefront (sample_volume only /
transmittance only) chained through the chunked path.

Protocol: NOTES.md ROUND-5 DISCOVERY — fetch first, then per-program
walls (~33 ms RTT floor is negligible against ~1 s frames).

Usage: python examples/profile_real6.py [size [width height]]
"""

from __future__ import annotations

import functools
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

    @jax.jit
    def trivial(x):
        return x + 1.0

    trivial(jnp.float32(1.0)).block_until_ready()
    t0 = time.perf_counter()
    float(np.asarray(trivial(jnp.float32(41.0))))
    print(f"fetch (sync-mode switch): {time.perf_counter() - t0:.1f} s", flush=True)

    from volxel_tpu.render.pathtrace import render_sample

    r, _ = _build_renderer(size, width=width, height=height)
    r.render_frame()
    ops = list(r._cached_operands)
    config = ops[0]
    print(f"chunk={config.chunk_size} finest={config.compact_finest}", flush=True)

    def run(cfg, fi=101):
        o = list(ops)
        o[0] = cfg
        return render_sample(*o, jnp.uint32(fi))

    def timed(tag, fn, reps=3):
        try:
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            print(f"  {tag}: compile+first {time.perf_counter() - t0:.1f} s",
                  flush=True)
            xs = []
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(fn())
                xs.append(time.perf_counter() - t0)
            print(f"  {tag}: {[round(x, 3) for x in xs]} s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {tag}: FAILED {type(e).__name__}: {e}", flush=True)

    arms = {
        "default": config,
        "debug_hits": config._replace(debug_hits=True),
        "no_env": config._replace(use_env=False),
        "no_ladder": config._replace(march_ladder=False),
        "no_compactsec": config._replace(compact_secondary=False),
        "bounces3": config._replace(bounces=3),
    }
    print(f"== config arms {width}x{height}/{size}^3", flush=True)
    for tag, cfg in arms.items():
        timed(tag, lambda c=cfg: run(c))

    # ---- loop splits: camera wavefront through the chunked map ----
    # replicate render_pixels' wavefront exactly (seed, jitter, rays),
    # then run only one traversal loop per chunk (operand order:
    # config, grid, params, lut, env, inv_view, inv_proj, light_dir)
    from volxel_tpu.render.modes import get_mode_functions
    from volxel_tpu.render.rays import camera_rays
    from volxel_tpu.render.rng import rng2, seed_rays

    _, grid, params, lut, env, inv_view, inv_proj, light_dir = ops

    sv, tr = get_mode_functions(
        config.mode, compact_decode=config.compact_decode,
        march_ladder=config.march_ladder,
        ladder_factor=config.ladder_factor,
        compact_finest=config.compact_finest,
    )

    n = width * height
    chunk = config.chunk_size or n
    while n % chunk != 0:
        chunk -= 1

    def loop_only(which):
        # big operands are jit ARGUMENTS (closure constants embed the
        # dense field in the program -> tunnel remote-compile HTTP 413,
        # the BENCH_r02 post-mortem invariant)
        @functools.partial(jax.jit, static_argnums=())
        def f(grid, params, lut, env, inv_view, inv_proj, fi):
            pixel_index = jnp.arange(n, dtype=jnp.uint32)
            state = seed_rays(pixel_index, fi)
            state, j1 = rng2(state)
            state, j2 = rng2(state)
            px = (pixel_index % jnp.uint32(width)).astype(jnp.float32)
            py = (pixel_index // jnp.uint32(width)).astype(jnp.float32)
            tex = jnp.stack([(px + 0.5) / width, (py + 0.5) / height], axis=-1)
            ndc = tex + ((j1 + j2) / 2.0 * 2.0 - 1.0) / jnp.array(
                [width, height], jnp.float32)
            rays = camera_rays(inv_view, inv_proj, ndc)
            active = jnp.ones((n,), jnp.bool_)

            def one_chunk(args):
                o, d, st, a = args
                if which == "sample":
                    return sv(grid, params, lut, o, d, st, a)[2]
                return tr(grid, params, lut, o, d, st, a)[1]

            return jax.lax.map(
                one_chunk,
                (
                    rays.origin.reshape(-1, chunk, 3),
                    rays.direction.reshape(-1, chunk, 3),
                    state.reshape(-1, chunk, state.shape[-1]),
                    active.reshape(-1, chunk),
                ),
            )

        return f

    print("== loop splits (camera wavefront, chunked)", flush=True)
    for which in ("sample", "transmittance"):
        fn = loop_only(which)
        timed(
            f"{which} only",
            lambda f=fn: f(
                grid, params, lut, env, inv_view, inv_proj, jnp.uint32(101)
            ),
        )


if __name__ == "__main__":
    main()
