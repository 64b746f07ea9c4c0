"""Per-(tile, step) tap bounding boxes of the raymarch wavefront.

Sizes the VMEM box for the tile-march Pallas kernel (VERDICT r4 item 1:
bandwidth-bound raymarch). For P-pixel micro-tiles of the 1080p/512^3
benchmark framing, measures — per raymarch step — the index-space
bounding box of every live lane's stochastic-tricubic tap SUPPORT
(the full 4^3 neighborhood over the lane's possible jittered t range,
i.e. a conservative upper bound on what the kernel must have resident),
and the miss rate candidate (DZ, DY, DX) boxes would pay.

Camera framings mirror bench.py: wide (zoom 2.0) and volume-filling
(zoom 0.8). Geometry only — no density data, no TPU. Run on CPU:
  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/probe_tilebox.py
"""

from __future__ import annotations

import sys

import numpy as np

from volxel_tpu.scene.camera import Camera
from volxel_tpu.scene.volume import Volume

W, H = 1920, 1080
EXT = 512
STEPS = 64

# candidate (DZ, DY, DX) boxes. DX=128 = one vreg row (rows = DZ*DY);
# DX<128 packs 128//DX z-phases into the 128-wide column (rows =
# DZ*DX//128*DY... see tilemarch.py layout) — better cube fit per byte.
CANDIDATES = [(8, 16, 128), (16, 16, 128), (16, 32, 128), (32, 32, 128),
              (32, 32, 32), (32, 32, 64), (48, 48, 64), (16, 16, 64),
              (24, 24, 64), (64, 64, 64)]


def scene(filled: bool):
    cam = Camera(1.0)
    cam.rotate_around_view(0.6, 0.4)
    cam.zoom(0.8 if filled else 2.0)
    vol = Volume((EXT, EXT, EXT), np.eye(4, dtype=np.float32))
    vol.rescale_to_unit_cube()
    inv_view = np.linalg.inv(cam.view_matrix()).astype(np.float32)
    inv_proj = np.linalg.inv(cam.proj_matrix(W / H)).astype(np.float32)
    minv = np.linalg.inv(vol.combined_transform()).astype(np.float32)
    lo, hi = vol.aabb()
    return inv_view, inv_proj, minv, lo, hi


def rays(inv_view, inv_proj, minv):
    """Index-space rays for every pixel (no AA jitter — +-0.5 px is
    absorbed by the tap-support dilation)."""
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
    ipos = cam_pos @ minv[:3, :3].T + minv[:3, 3]
    idir = d @ minv[:3, :3].T
    return np.broadcast_to(ipos, d.shape).copy(), idir, cam_pos, d


def main() -> None:
    for label, filled in (("wide", False), ("filled", True)):
        inv_view, inv_proj, minv, lo, hi = scene(filled)
        ipos, idir, cam_pos, wdir = rays(inv_view, inv_proj, minv)
        inv = 1.0 / wdir
        t0 = (lo - cam_pos) * inv
        t1 = (hi - cam_pos) * inv
        near = np.maximum(0.0, np.minimum(t0, t1).max(axis=1))
        far = np.maximum(t0, t1).min(axis=1)
        valid = near <= far
        dt = np.where(valid, (far - near) / STEPS, 0.0)

        for tw, th in ((64, 8), (32, 12)):
            lanes = tw * th
            tiles_x, tiles_y = W // tw, H // th
            order = (
                np.arange(W * H)
                .reshape(H, W)
                .reshape(tiles_y, th, tiles_x, tw)
                .transpose(0, 2, 1, 3)
                .reshape(tiles_y * tiles_x, lanes)
            )
            ntiles = order.shape[0]
            exts = np.zeros((ntiles, STEPS, 3), np.int32)
            live_any = np.zeros((ntiles, STEPS), bool)
            miss = {c: 0 for c in CANDIDATES}
            total_live = 0
            for c0 in range(0, ntiles, 256):
                sel = order[c0:c0 + 256]
                ip, idr = ipos[sel], idir[sel]  # (T, L, 3)
                nr, fr, vd, dtt = near[sel], far[sel], valid[sel], dt[sel]
                i = np.arange(STEPS, dtype=np.float32)
                # lane t range at step i: [near + i*dt, min(near+(i+1)*dt, far)]
                ta = np.minimum(nr[..., None] + i * dtt[..., None], fr[..., None])
                tb = np.minimum(nr[..., None] + (i + 1) * dtt[..., None], fr[..., None])
                # p = ipos + t*idir, per axis extremes at t endpoints
                pa = ip[:, :, None, :] + ta[..., None] * idr[:, :, None, :]
                pb = ip[:, :, None, :] + tb[..., None] * idr[:, :, None, :]
                pmin, pmax = np.minimum(pa, pb), np.maximum(pa, pb)
                # tricubic support: floor(p - .5) + {-1..2} -> [f-1, f+2]
                tap_lo = np.floor(pmin - 0.5) - 1
                tap_hi = np.floor(pmax - 0.5) + 2
                # OOB taps are 0 by rule and need no data: clip to extent
                tap_lo = np.clip(tap_lo, 0, EXT - 1).astype(np.int32)
                tap_hi = np.clip(tap_hi, 0, EXT - 1).astype(np.int32)
                lv = vd[:, :, None] & np.broadcast_to(
                    True, tap_lo.shape[:3])  # (T, L, S)
                big = np.int32(1 << 20)
                blo = np.where(lv[..., None], tap_lo, big).min(axis=1)
                bhi = np.where(lv[..., None], tap_hi, -big).max(axis=1)
                live = lv.any(axis=1)  # (T, S)
                exts[c0:c0 + 256] = np.where(
                    live[..., None], bhi - blo + 1, 0)
                live_any[c0:c0 + 256] = live
                total_live += int(lv.sum())
                # miss accounting per candidate: box anchored at the
                # clipped tile min; a LANE misses when its tap range
                # exceeds the box in any axis (conservative: the real
                # stochastic pick needs 1 of the 4^3 support taps)
                for dz, dy, dx in CANDIDATES:
                    box = np.array([dx, dy, dz], np.int32)  # x, y, z order
                    anchor = np.clip(blo, 0, EXT - box)
                    fit = (tap_lo >= anchor[:, None]) & (
                        tap_hi < anchor[:, None] + box)
                    lane_miss = lv & ~fit.all(axis=-1)
                    miss[(dz, dy, dx)] += int(lane_miss.sum())
            live_steps = exts[live_any]
            p = lambda q: np.percentile(live_steps, q, axis=0).astype(int)
            print(f"\n== {label} framing, tile {tw}x{th} "
                  f"({ntiles} tiles, live lane-steps {total_live/1e6:.1f}M)")
            print(f"  bbox extents (x, y, z) p50 {p(50)} p90 {p(90)} "
                  f"p99 {p(99)} max {live_steps.max(axis=0)}")
            for c in CANDIDATES:
                print(f"  box (dz,dy,dx)={c}: miss {miss[c]/max(total_live,1)*100:.2f}%"
                      f"  ({np.prod(c)*2/1024:.0f} KiB, "
                      f"{np.prod(c)*2*STEPS*ntiles/1e9:.1f} GB/frame)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
