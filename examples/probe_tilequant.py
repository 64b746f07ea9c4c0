"""Quantized-window miss rates for the PIPELINED tile-march kernel.

The on-chip Mosaic bisect (NOTES round-12) showed user-level DMA windows
must be lane-aligned and static below dim 0, so the kernel fetches its
per-(tile, step) box via automatic pipelining: the dense field rides
N = prod(neigh) block in_specs whose index_maps add a neighborhood
offset to a prefetched per-(tile, step) base BLOCK index. The window is
therefore quantized to the block grid — this probe measures what that
quantization costs in miss rate vs the ideal free-anchor box, per
candidate (block, neighborhood) and tile shape, on the bench framings.

Uses the EXACT jittered per-lane t (start = near + xi*dt is drawn before
the march, so the in-graph corner precompute knows it) — the committed
probe_tilebox sweeps the whole jitter range instead, a loose bound.

Geometry only — run on CPU:
  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/probe_tilequant.py
"""

from __future__ import annotations

import sys

import numpy as np

from probe_tilebox import EXT, STEPS, W, H, rays, scene

# (block (bz, by, bx), neigh (nz, ny, nx)); by mult of 16, bx mult of 128
# (bf16 VMEM tiling), bz free. in_specs per candidate = prod(neigh).
CANDIDATES = [
    ((8, 16, 128), (2, 2, 1)),
    ((8, 16, 128), (2, 1, 1)),
    ((8, 16, 128), (3, 1, 1)),
    ((8, 16, 128), (3, 2, 1)),
    ((4, 16, 128), (3, 1, 1)),
    ((4, 16, 128), (4, 1, 1)),
    ((4, 16, 128), (4, 2, 1)),
    ((4, 16, 128), (6, 2, 1)),
    ((8, 16, 128), (2, 2, 2)),
    ((16, 16, 128), (2, 2, 1)),
    ((16, 16, 128), (2, 2, 2)),
]
TILES = [(32, 12), (16, 12), (16, 8), (32, 8)]


def main() -> None:
    rng = np.random.default_rng(7)
    for label, filled in (("filled", True), ("wide", False)):
        inv_view, inv_proj, minv, lo, hi = scene(filled)
        ipos, idir, cam_pos, wdir = rays(inv_view, inv_proj, minv)
        inv = np.where(wdir != 0, 1.0 / np.where(wdir == 0, 1, wdir), 1e30)
        t0 = (lo - cam_pos) * inv
        t1 = (hi - cam_pos) * inv
        near = np.maximum(0.0, np.minimum(t0, t1).max(axis=1))
        far = np.maximum(t0, t1).min(axis=1)
        valid = near <= far
        dt = np.where(valid, (far - near) / STEPS, 0.0)
        start = near + rng.random(near.shape[0]).astype(np.float32) * dt

        for tw, th in TILES:
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
            miss = {i: 0 for i in range(len(CANDIDATES))}
            ext_acc = []
            total_live = 0
            for c0 in range(0, ntiles, 512):
                sel = order[c0:c0 + 512]
                ip, idr = ipos[sel], idir[sel]
                st_, fr, vd = start[sel], far[sel], valid[sel]
                dtt = dt[sel]
                i = np.arange(STEPS, dtype=np.float32)
                t = np.minimum(st_[..., None] + i * dtt[..., None],
                               fr[..., None])  # (T, L, S)
                p = ip[:, :, None, :] + t[..., None] * idr[:, :, None, :]
                base = np.floor(p - 0.5)
                tap_lo = np.clip(base - 1, 0, EXT - 1).astype(np.int32)
                tap_hi = np.clip(base + 2, 0, EXT - 1).astype(np.int32)
                lv = vd[:, :, None] & np.broadcast_to(True, tap_lo.shape[:3])
                big = np.int32(1 << 20)
                blo = np.where(lv[..., None], tap_lo, big).min(axis=1)
                bhi = np.where(lv[..., None], tap_hi, -big).max(axis=1)
                live = lv.any(axis=1)
                ext_acc.append((bhi - blo + 1)[live])
                total_live += int(lv.sum())
                for ci, (blk, ngh) in enumerate(CANDIDATES):
                    b = np.array([blk[2], blk[1], blk[0]], np.int32)
                    n = np.array([ngh[2], ngh[1], ngh[0]], np.int32)
                    nb = EXT // b
                    a = np.clip(blo // b, 0, nb - n)
                    w_lo = a * b
                    w_hi = w_lo + n * b
                    fit = (tap_lo >= w_lo[:, None]) & (tap_hi < w_hi[:, None])
                    miss[ci] += int((lv & ~fit.all(axis=-1)).sum())
            exts = np.concatenate(ext_acc)
            pq = lambda q: np.percentile(exts, q, axis=0).astype(int)
            print(f"\n== {label} tile {tw}x{th} ({ntiles} tiles, "
                  f"{total_live/1e6:.1f}M live lane-steps) "
                  f"ext(x,y,z) p50 {pq(50)} p90 {pq(90)} p99 {pq(99)}")
            for ci, (blk, ngh) in enumerate(CANDIDATES):
                win = tuple(b * n for b, n in zip(blk, ngh))
                bytes_step = np.prod(win) * 2
                gb_frame = bytes_step * STEPS * ntiles / 1e9
                rows = win[0] * win[1]
                tmac = rows * win[2] * lanes * STEPS * ntiles / 1e12
                print(f"  blk {blk} x {ngh} -> win {win}: "
                      f"miss {miss[ci]/max(total_live,1)*100:.2f}%  "
                      f"{gb_frame:.0f} GB/frame, {tmac:.1f} TMAC")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
