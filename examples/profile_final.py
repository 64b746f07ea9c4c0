"""REAL profile, final round: where the current defaults spend time on
BOTH bench framings (wide headline ~0.84 s/sample, filled ~4.9 s), in
ONE process so every arm shares executables across framings (camera and
density are operands, not compile-time constants).

Arms (full render_sample, shipped config unless noted):
  default, debug_hits  — headline and wavefront/setup floor
plus camera-wavefront loop splits for the default mode:
  sample    — sample_volume_dda_compact only, full camera width
  transmit  — transmittance_dda_compact only, full camera width

Protocol: NOTES.md ROUND-5 DISCOVERY — fetch a scalar first (sync-mode
switch), then per-program walls (~33 ms RTT floor, negligible here).

Usage: python examples/profile_final.py [size [width height]]
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

    t0 = time.perf_counter()
    r, _ = _build_renderer(size, width=width, height=height)
    r.render_frame()
    ops_wide = list(r._cached_operands)
    print(f"renderer build: {time.perf_counter() - t0:.1f} s", flush=True)

    from volxel_tpu.scene.camera import Camera

    r.camera = Camera(1.0)
    r.camera.rotate_around_view(0.6, 0.4)
    r.camera.zoom(0.8)
    r.settings.density_multiplier = 3.0
    r.restart_rendering()
    r.render_frame()
    ops_filled = list(r._cached_operands)
    config = ops_wide[0]
    print(f"chunk={config.chunk_size} finest={config.compact_finest}", flush=True)

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

    def run(ops, cfg, fi=101):
        o = list(ops)
        o[0] = cfg
        return render_sample(*o, jnp.uint32(fi))

    # ---- loop splits at the camera wavefront (default mode) ----
    from volxel_tpu.render.modes import get_mode_functions
    from volxel_tpu.render.rays import camera_rays
    from volxel_tpu.render.rng import rng2, seed_rays

    n = width * height
    chunk = config.chunk_size or n
    while n % chunk != 0:
        chunk -= 1

    def loop_only(which):
        sv, tr = get_mode_functions(
            "default", compact_decode=config.compact_decode,
            march_ladder=config.march_ladder,
            ladder_factor=config.ladder_factor,
            compact_finest=config.compact_finest,
        )

        @jax.jit
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

        def g(ops):
            _, grid, params, lut, env, inv_view, inv_proj, _ = ops
            return f(grid, params, lut, env, inv_view, inv_proj, jnp.uint32(101))

        return g

    arms = {
        "default": lambda ops: run(ops, config),
        "debug_hits": lambda ops: run(ops, config._replace(debug_hits=True)),
        "sample": loop_only("sample"),
        "transmit": loop_only("transmittance"),
    }
    for framing, ops, reps in (("wide", ops_wide, 3), ("filled", ops_filled, 2)):
        print(f"== {framing} {width}x{height}/{size}^3", flush=True)
        for tag, fn in arms.items():
            timed(f"{framing}/{tag}", lambda fn=fn, ops=ops: fn(ops), reps=reps)

    # ---- compaction-machinery micro-arms (same process/session) ----
    from probe_partition import run_probe

    run_probe(ops_wide[1], ops_wide[2], ops_wide[3])


if __name__ == "__main__":
    main()
