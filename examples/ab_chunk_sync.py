"""Honest sync-mode chunk-size sweep + loop-variant decomposition.

The old chunk sweep (NOTES "Interleaved 3-pass sweep") was relay-ack
fiction. Under the real cost model (march cost = width x local-max-steps
x ~27 ns/gather-element) smaller tile chunks should cut the
max-vs-average divergence penalty — but pay more fixed per-chunk costs.
Arms (960x540, 256^3 benchmark scene, compact_decode="loop" default):

  chunk 32400 / 64800 / 129600 / None (unchunked)
  + decomposition at the default chunk: camera sample_volume only,
    camera transmittance only (isolates the traversal from NEE/env)
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

    from volxel_tpu.render.pathtrace import render_sample

    r, _ = _build_renderer(256, width=960, height=540)
    r.render_frame()
    ops = list(r._cached_operands)
    config = ops[0]

    arms = {
        "chunk32400": config._replace(chunk_size=32400),
        "chunk64800": config._replace(chunk_size=64800),
        "chunk129600": config._replace(chunk_size=129600),
        "unchunked": config._replace(chunk_size=None),
    }

    def run(cfg, fi):
        o = list(ops)
        o[0] = cfg
        return render_sample(*o, jnp.uint32(fi))

    print("== compiling (excluded)", flush=True)
    for tag, cfg in arms.items():
        t0 = time.perf_counter()
        run(cfg, 77).block_until_ready()
        print(f"  {tag}: first {time.perf_counter() - t0:.1f} s", flush=True)

    times: dict[str, list[float]] = {t: [] for t in arms}
    passes = 3
    for p in range(passes):
        print(f"== pass {p}", flush=True)
        for tag, cfg in arms.items():
            t0 = time.perf_counter()
            run(cfg, 100 + p).block_until_ready()
            dt = time.perf_counter() - t0
            times[tag].append(dt)
            print(f"  {tag}: {dt:.2f} s", flush=True)

    print("== medians", flush=True)
    for tag, xs in times.items():
        med = sorted(xs)[len(xs) // 2]
        print(f"  {tag}: med {med:.2f} s  best {min(xs):.2f}", flush=True)

    # ---- decomposition: traversal-only wavefronts at the default chunk
    from volxel_tpu.render.modes import get_mode_functions
    from volxel_tpu.render.rays import camera_rays
    from volxel_tpu.render.rng import rng2, seed_rays

    grid, params, lut = ops[1], ops[2], ops[3]
    w, h = config.width, config.height
    sample_volume, transmittance = get_mode_functions(
        "default", compact_decode="loop"
    )
    sample_two, transmittance_two = get_mode_functions(
        "default", compact_decode=False
    )

    def make_trace(fn, n_out):
        @jax.jit
        def traced(grid, params, lut, inv_view, inv_proj):
            total = w * h
            pixel_index = jnp.arange(total, dtype=jnp.uint32)
            cs = config.chunk_size or total

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
                return out[1] if n_out else out[1]

            res = jax.lax.map(one, pixel_index.reshape(-1, cs))
            return res.reshape(-1)

        return traced

    inv_view = jnp.asarray(
        np.linalg.inv(r.camera.view_matrix()).astype(np.float32)
    )
    inv_proj = jnp.asarray(
        np.linalg.inv(r.camera.proj_matrix(w / h)).astype(np.float32)
    )

    print("== decomposition (camera wavefront only, chunk=129600)", flush=True)
    for tag, fn in (
        ("sample_volume loop", sample_volume),
        ("sample_volume two-phase", sample_two),
        ("transmittance loop", transmittance),
        ("transmittance two-phase", transmittance_two),
    ):
        traced = make_trace(fn, 1)
        try:
            traced(grid, params, lut, inv_view, inv_proj).block_until_ready()
            xs = []
            for _ in range(3):
                t0 = time.perf_counter()
                traced(grid, params, lut, inv_view, inv_proj).block_until_ready()
                xs.append(time.perf_counter() - t0)
            print(f"  {tag}: {[round(x, 2) for x in xs]} s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {tag}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
