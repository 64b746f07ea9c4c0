"""Honest chip A/B: tile-march kernel vs XLA serialized gathers.

The VERDICT r4 item-1 economics test: the raymarch step loop's density
taps on the REAL 1080p/512^3 volume-filling benchmark geometry, fetched
(a) by XLA's serialized per-lane gathers (the shipped path's cost
model), (b) by the tile-march kernel (render/tilemarch.py): per-tile
double-buffered box DMA + one-hot MXU selects. Reports wall times, the
measured miss fraction, implied HBM DMA traffic, and a bit-equality
check on hit lanes.

Protocol: NOTES.md ROUND-5 DISCOVERY — fetch first (sync mode), then
per-program walls.

Usage: python examples/ab_tilemarch.py [ntiles [reps]]
"""

from __future__ import annotations

import sys
import time

import numpy as np

EXT = 512
W, H = 1920, 1080
TW, TH = 32, 12  # 384-lane micro-tile (tilemarch.LANES)
STEPS = 64


def geometry():
    """Real benchmark volume-filling framing (bench._frame_filled)."""
    from volxel_tpu.scene.camera import Camera
    from volxel_tpu.scene.volume import Volume

    cam = Camera(1.0)
    cam.rotate_around_view(0.6, 0.4)
    cam.zoom(0.8)
    vol = Volume((EXT, EXT, EXT), np.eye(4, dtype=np.float32))
    vol.rescale_to_unit_cube()
    inv_view = np.linalg.inv(cam.view_matrix()).astype(np.float32)
    inv_proj = np.linalg.inv(cam.proj_matrix(W / H)).astype(np.float32)
    minv = np.linalg.inv(vol.combined_transform()).astype(np.float32)
    lo, hi = vol.aabb()

    ys, xs = np.meshgrid(
        (np.arange(H, dtype=np.float32) + 0.5) / H,
        (np.arange(W, dtype=np.float32) + 0.5) / W,
        indexing="ij",
    )
    ndc = np.stack([xs, ys], axis=-1).reshape(-1, 2)
    clip = np.concatenate(
        [ndc * 2.0 - 1.0, np.zeros((ndc.shape[0], 1), np.float32),
         np.ones((ndc.shape[0], 1), np.float32)], axis=1)
    view_h = clip @ inv_proj.T
    view = view_h[:, :3] / view_h[:, 3:4]
    world_h = np.concatenate([view, np.ones_like(view[:, :1])], axis=1) @ inv_view.T
    world = world_h[:, :3] / world_h[:, 3:4]
    cam_pos = (inv_view @ np.array([0, 0, 0, 1], np.float32))[:3]
    d = world - cam_pos
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / d
        t0 = (lo - cam_pos) * inv
        t1 = (hi - cam_pos) * inv
    near = np.maximum(0.0, np.fmin(t0, t1).max(axis=1))
    far = np.fmax(t0, t1).min(axis=1)
    valid = near <= far
    near = np.where(valid, near, 0.0)
    far = np.where(valid, far, 0.0)
    ipos = cam_pos @ minv[:3, :3].T + minv[:3, 3]
    idir = np.nan_to_num(d @ minv[:3, :3].T)

    order = (
        np.arange(W * H)
        .reshape(H, W)
        .reshape(H // TH, TH, W // TW, TW)
        .transpose(0, 2, 1, 3)
        .reshape(-1, TH * TW)
    )
    ip = np.broadcast_to(ipos, (W * H, 3))[order]
    idr = idir[order]
    nr, fr, vd = near[order], far[order], valid[order]
    dt = np.where(vd, (fr - nr) / STEPS, 0.0)
    return ip, idr, nr, dt, fr, vd


def main() -> None:
    import jax
    import jax.numpy as jnp

    from volxel_tpu.render.tilemarch import (
        pack_tile_rays, serial_march_sums, tile_block_corners,
        tile_march_sums,
    )

    ntiles = int(sys.argv[1]) if len(sys.argv) > 1 else 5400
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    @jax.jit
    def trivial(x):
        return x + 1.0

    trivial(jnp.float32(1.0)).block_until_ready()
    t0 = time.perf_counter()
    float(np.asarray(trivial(jnp.float32(41.0))))
    print(f"fetch (sync-mode switch): {time.perf_counter() - t0:.1f} s",
          flush=True)

    rng = np.random.default_rng(0)
    dense = jnp.asarray(
        rng.random((EXT, EXT, EXT), np.float32), jnp.bfloat16)
    ip, idr, nr, dt, fr, vd = geometry()
    # keep the BUSIEST ntiles (most live lanes) so a subset run measures
    # real work, not background tiles
    busy = np.argsort(-vd.sum(axis=1))[:ntiles]
    rays = pack_tile_rays(
        jnp.asarray(ip[busy]), jnp.asarray(idr[busy]), jnp.asarray(nr[busy]),
        jnp.asarray(dt[busy]), jnp.asarray(fr[busy]), jnp.asarray(vd[busy]),
    )
    ext4 = jnp.asarray([EXT, EXT, EXT, 0], jnp.int32)
    live = float(vd[busy].sum()) * STEPS
    print(f"tiles {ntiles}, live lane-steps {live/1e6:.1f}M", flush=True)

    def timed(tag, fn, extra=""):
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
            print(f"  {tag}: {[round(x, 4) for x in xs]} s {extra}", flush=True)
            return out, float(np.median(xs))
        except Exception as e:  # noqa: BLE001
            print(f"  {tag}: FAILED {type(e).__name__}: {e}"[:500], flush=True)
            return None, None

    serial_j = jax.jit(lambda d, r: serial_march_sums(d, r, ext4))
    ref, t_serial = timed("serial-gather", lambda: serial_j(dense, rays))

    corners_j = jax.jit(
        lambda r, bz, neigh: tile_block_corners(r, [EXT, EXT, EXT], bz, neigh),
        static_argnums=(1, 2))

    for bz, neigh in ((8, (3, 2, 1)), (16, (2, 2, 1)), (8, (2, 2, 1)),
                      (8, (2, 2, 2))):
        win = (bz * neigh[0], 16 * neigh[1], 128 * neigh[2])
        cs, t_c = timed(f"corners bz{bz} n{neigh}",
                        lambda: corners_j(rays, bz, neigh))
        if cs is None:
            continue
        out, t_k = timed(
            f"tile-march bz{bz} n{neigh} win{win}",
            lambda: tile_march_sums(dense, rays, cs, ext4, bz=bz, neigh=neigh),
            extra=f"(DMA {ntiles * STEPS * win[0] * win[1] * win[2] * 2 / 1e9:.1f} GB)",
        )
        if out is None:
            continue
        sums, miss = np.asarray(out[0]), np.asarray(out[1])
        refn = np.asarray(ref)
        hit = miss == 0
        ok = np.array_equal(sums[hit], refn[hit])
        print(f"    miss {float((miss > 0).mean()) * 100:.2f}% of lanes, "
              f"{miss.sum() / max(live, 1) * 100:.2f}% of lane-steps; "
              f"hit lanes bit-equal: {ok}; "
              f"speedup vs serial {t_serial / t_k:.2f}x "
              f"(+corners {t_serial / (t_k + t_c):.2f}x)", flush=True)


if __name__ == "__main__":
    main()
