"""REAL profile of the VOLUME-FILLING leg (VERDICT r4 item 2).

BENCH_r04: wide default 750 ms/sample but FILLED default 4762 ms — and
the filled framing (97.5% AABB coverage, 3x density, steps p50=25) is
the realistic workload closest to the reference's body-donor protocol.
This decomposes the filled frame: config arms + per-loop splits, plus
the no_dda/raymarch filled anchors (VERDICT item 3 targets them).

Also validates the r5 env-build fix: Renderer() ctor wall time is
printed (was 73 s of eager tunnel compiles; should now be seconds).

Protocol: NOTES.md ROUND-5 DISCOVERY — fetch first, then per-program
walls (~33 ms RTT floor, negligible against multi-second frames).

Usage: python examples/profile_filled.py [size [width height]] [--splits]
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

    args = [a for a in _sys.argv[1:] if not a.startswith("--")]
    size = int(args[0]) if len(args) > 0 else 512
    width = int(args[1]) if len(args) > 1 else 1920
    height = int(args[2]) if len(args) > 2 else 1080

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
    print(f"renderer build (incl. env importance): {time.perf_counter() - t0:.1f} s",
          flush=True)
    # the volume-filling framing (bench._frame_filled): distance 0.8 ->
    # 97.5% of camera rays enter the AABB; reference's 3x density
    from volxel_tpu.scene.camera import Camera

    r.camera = Camera(1.0)
    r.camera.rotate_around_view(0.6, 0.4)
    r.camera.zoom(0.8)
    r.settings.density_multiplier = 3.0
    r.restart_rendering()
    r.render_frame()
    ops = list(r._cached_operands)
    config = ops[0]
    print(f"chunk={config.chunk_size} finest={config.compact_finest}", flush=True)

    def run(cfg, fi=101):
        o = list(ops)
        o[0] = cfg
        return render_sample(*o, jnp.uint32(fi))

    def timed(tag, fn, reps=2):
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
        "no_dda": config._replace(mode="no_dda"),
        "raymarch": config._replace(mode="raymarch", tile_march=False),
        "raymarch_tile": config._replace(mode="raymarch", tile_march=True),
        "raymarch_tile_csec": config._replace(
            mode="raymarch", tile_march=True, compact_secondary=True),
        "no_dda_csec": config._replace(mode="no_dda", compact_secondary=True),
    }
    sel = [a.split("=", 1)[1] for a in _sys.argv if a.startswith("--arms=")]
    if sel:
        keep = sel[0].split(",")
        arms = {k: v for k, v in arms.items() if k in keep}
    print(f"== filled config arms {width}x{height}/{size}^3", flush=True)
    for tag, cfg in arms.items():
        timed(tag, lambda c=cfg: run(c))

    # ---- loop splits at the filled camera wavefront ----
    from volxel_tpu.render.modes import get_mode_functions
    from volxel_tpu.render.rays import camera_rays
    from volxel_tpu.render.rng import rng2, seed_rays

    _, grid, params, lut, env, inv_view, inv_proj, light_dir = ops

    n = width * height
    chunk = config.chunk_size or n
    while n % chunk != 0:
        chunk -= 1

    def loop_only(mode, which):
        sv, tr = get_mode_functions(
            mode, compact_decode=config.compact_decode,
            march_ladder=config.march_ladder,
            ladder_factor=config.ladder_factor,
            compact_finest=config.compact_finest,
        )

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

        return lambda: f(grid, params, lut, env, inv_view, inv_proj,
                         jnp.uint32(101))

    if "--splits" in _sys.argv:
        print("== filled loop splits (camera wavefront only)", flush=True)
        for mode in ("default", "no_dda", "raymarch"):
            for which in ("sample", "transmittance"):
                timed(f"{mode}/{which}", loop_only(mode, which))


if __name__ == "__main__":
    main()
