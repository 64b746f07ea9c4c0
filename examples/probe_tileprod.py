"""Decompose the production tile-march sample leg on the chip.

raymarch_tile measured 5.6 s/sample at 1080p/512^3 filled — no win over
the serial 5.2-6.1 s even though the raw march-sums kernel A/B'd
5.5-8.5x. This splits the tiled sample into corners / kernel / resume
and measures the freeze rate, on the real filled camera wavefront.

Usage: python examples/probe_tileprod.py [size [width height]]
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
    print(f"fetch (sync-mode switch): {time.perf_counter() - t0:.1f} s",
          flush=True)

    r, _ = _build_renderer(size, width=width, height=height)
    from volxel_tpu.scene.camera import Camera

    r.camera = Camera(1.0)
    r.camera.rotate_around_view(0.6, 0.4)
    r.camera.zoom(0.8)
    r.settings.density_multiplier = 3.0
    r.restart_rendering()
    r.render_frame()
    _, grid, params, lut, env, inv_view, inv_proj, light_dir = r._cached_operands

    from volxel_tpu.render import modes
    from volxel_tpu.render import tilemarch as tm
    from volxel_tpu.render.rays import camera_rays, ray_box_intersection, Rays
    from volxel_tpu.render.rng import rng_where, seed_rays

    n = width * height
    # micro-tile-major pixel order (what the render path uses)
    tw, th = 32, 12
    order = (
        np.arange(n).reshape(height, width)
        .reshape(height // th, th, width // tw, tw)
        .transpose(0, 2, 1, 3).reshape(-1)
    )
    pixel_index = jnp.asarray(order, jnp.uint32)

    @jax.jit
    def make_rays(inv_view, inv_proj, fi):
        state = seed_rays(pixel_index, fi)
        px = (pixel_index % jnp.uint32(width)).astype(jnp.float32)
        py = (pixel_index // jnp.uint32(width)).astype(jnp.float32)
        ndc = jnp.stack([(px + 0.5) / width, (py + 0.5) / height], axis=-1)
        rays = camera_rays(inv_view, inv_proj, ndc)
        return rays.origin, rays.direction, state

    origin, direction, state = jax.block_until_ready(
        make_rays(inv_view, inv_proj, jnp.uint32(101)))
    active = jnp.ones((n,), bool)

    def timed(tag, fn, reps=2):
        try:
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn())
            print(f"  {tag}: compile+first {time.perf_counter() - t0:.1f} s",
                  flush=True)
            xs = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = jax.block_until_ready(fn())
                xs.append(time.perf_counter() - t0)
            print(f"  {tag}: {[round(x, 3) for x in xs]} s", flush=True)
            return out
        except Exception as e:  # noqa: BLE001
            print(f"  {tag}: FAILED {type(e).__name__}: {e}"[:400], flush=True)
            return None

    # full XLA sample (ladder on, production config); operands as jit
    # ARGUMENTS (closure constants blow the tunnel's 413 limit)
    if "--serial" in _sys.argv:
        serial_j = jax.jit(lambda g, o, d, st: modes.sample_volume_raymarch(
            g, params, lut, o, d, st, active, ladder=4)[2])
        timed("serial sample (ladder)",
              lambda: serial_j(grid, origin, direction, state))

    # ---- pieces ----
    hit_box, near, far = ray_box_intersection(
        Rays(origin, direction), params.aabb_lo, params.aabb_hi)
    ipos, idir = modes._to_index_space(params, origin, direction)
    valid = active & hit_box
    st2, xi_tau = rng_where(valid, state)
    tau_target = -jnp.log(1.0 - xi_tau)
    dt = (far - near) / modes.RAYMARCH_STEPS
    st2, xi_j = rng_where(valid, st2)
    start = near + xi_j * dt
    ntiles = n // tm.LANES
    tl = lambda x: x.reshape((ntiles, tm.LANES) + x.shape[1:])
    rays_p = jax.block_until_ready(tm.pack_tile_rays(
        tl(ipos), tl(idir), tl(start), tl(dt), tl(far), tl(valid),
        tl(tau_target)))
    zdim, ydim, xdim = grid.dense.shape
    neigh = tm.effective_neigh(grid.dense.shape, 8, (3, 2, 1))

    corners_j = jax.jit(lambda rp: tm.tile_block_corners_stochastic(
        rp, [xdim, ydim, zdim], 8, neigh, steps=modes.RAYMARCH_STEPS))
    cb = timed("corners only", lambda: corners_j(rays_p))

    scalars = jnp.stack([
        params.inv_maj, params.vol_maj, params.density_scale,
        params.sample_range[0], params.sample_range[1],
        jnp.float32(0), jnp.float32(0), jnp.float32(0)]).astype(jnp.float32)
    state4 = jnp.moveaxis(tl(st2), -1, 1).astype(jnp.uint32)
    ext4 = jnp.asarray([xdim, ydim, zdim, 0], jnp.int32)
    lut_t = jnp.asarray(np.asarray(lut).T)

    for bz, ng in ((8, (3, 2, 1)), (8, (3, 2, 2)), (8, (4, 2, 2))):
        ng = tm.effective_neigh(grid.dense.shape, bz, ng)
        cbi = jax.jit(lambda rp, b=bz, g=ng: tm.tile_block_corners_stochastic(
            rp, [xdim, ydim, zdim], b, g, steps=modes.RAYMARCH_STEPS))(rays_p)
        kern_j = jax.jit(functools.partial(
            tm.tile_march_sample, bz=bz, neigh=ng,
            steps=modes.RAYMARCH_STEPS, interpret=False))
        out = timed(f"kernel only bz{bz} n{ng}", lambda: kern_j(
            grid.dense, rays_p, state4, cbi, lut_t, scalars, ext4))
        if out is None:
            continue
        outf = np.asarray(out[0])
        miss_step = outf[:, tm.O_MISS].reshape(-1)
        hit = outf[:, tm.O_HIT].reshape(-1) > 0.5
        vd = np.asarray(valid)
        frozen = miss_step > 0.5
        if frozen.any():
            print(f"    freeze {frozen[vd].mean() * 100:.2f}% of valid; "
                  f"hit in-kernel {hit[vd].mean() * 100:.1f}%; "
                  f"freeze step p50 {np.percentile(miss_step[frozen], 50):.0f} "
                  f"p90 {np.percentile(miss_step[frozen], 90):.0f}; "
                  f"mean remaining {(64 - miss_step[frozen]).mean():.1f}",
                  flush=True)
        else:
            print("    freeze 0%", flush=True)

    tiled_j = jax.jit(
        lambda g, o, d, st, bz, neigh: modes.sample_volume_raymarch_tiled(
            g, params, lut, o, d, st, active, bz=bz, neigh=neigh)[2],
        static_argnums=(4, 5))
    for bz, neigh in ((8, (3, 2, 2)), (8, (4, 2, 2))):
        timed(f"tiled sample full bz{bz} n{neigh}",
              lambda: tiled_j(grid, origin, direction, state, bz, neigh))


if __name__ == "__main__":
    main()
