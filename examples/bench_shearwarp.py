"""Same-process A/B: Pallas shear-warp kernel vs the identical XLA scan.

The north-star Pallas evidence (VERDICT round-1 item 3): run both
implementations of the shear-warp DVR intermediate (render/shearwarp.py)
on the same process/device and report ms/frame, plus the wavefront
raymarch mode at a comparable pixel count for context. Results recorded in
NOTES.md.

Usage: python examples/bench_shearwarp.py [size]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _median_ms(fn, n=10, warmup=2):
    for _ in range(warmup):
        fn().block_until_ready()
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn().block_until_ready()
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1000.0)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from volxel_tpu.render.shearwarp import (
        shearwarp_intermediate_pallas,
        shearwarp_intermediate_xla,
    )
    from volxel_tpu.transfer.function import generate_transfer_function

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.default_rng(0)
    z = y = x = size
    vol_np = (rng.random((z, y, x)) * (rng.random((z, y, x)) > 0.7)).astype(np.float32)
    vol = jnp.asarray(vol_np)
    lut = jnp.asarray(
        generate_transfer_function(
            [
                {"color": [0.57, 0.25, 0.67, 0.54], "stop": 0.0},
                {"color": [0.97, 0.89, 0.36, 1.0], "stop": 0.18},
                {"color": [0.0, 1.0, 1.0, 0.17], "stop": 0.4},
            ]
        )
    )
    sx, sy = 0.35, -0.2
    args = (vol, lut, sx, sy, 1.0, 1.1)

    xla = jax.jit(lambda v: shearwarp_intermediate_xla(v, *args[1:])[0])
    pal8 = jax.jit(
        lambda v: shearwarp_intermediate_pallas(v, *args[1:], stacked=False)[0]
    )
    pal2 = jax.jit(
        lambda v: shearwarp_intermediate_pallas(v, *args[1:], stacked=True)[0]
    )

    # TIMING FIRST, correctness fetch LAST: a session's first
    # device->host transfer CAN stall ~4 min and permanently add ~33 ms
    # of sync overhead to every later dispatch (NOTES.md round 3b; the
    # trigger is intermittent — a fetch-free rerun of this script
    # reproduced the original fetch-first numbers, 2.30x — but the
    # ordering costs nothing and removes the hazard).
    inter_shape = jax.eval_shape(xla, vol).shape
    inter_side = int(inter_shape[0])
    ms_xla = _median_ms(lambda: xla(vol))
    ms_pal8 = _median_ms(lambda: pal8(vol))
    ms_pal2 = _median_ms(lambda: pal2(vol))
    n_px = inter_shape[0] * inter_shape[1]
    print(
        f"shearwarp XLA:              {ms_xla:8.2f} ms/frame  ({n_px / ms_xla / 1e3:.1f} Mpix/s)"
    )
    print(
        f"shearwarp Pallas 8-rotate:  {ms_pal8:8.2f} ms/frame  ({n_px / ms_pal8 / 1e3:.1f} Mpix/s)"
        f"  -> {ms_xla / ms_pal8:.2f}x vs XLA"
    )
    print(
        f"shearwarp Pallas stacked:   {ms_pal2:8.2f} ms/frame  ({n_px / ms_pal2 / 1e3:.1f} Mpix/s)"
        f"  -> {ms_xla / ms_pal2:.2f}x vs XLA, {ms_pal8 / ms_pal2:.2f}x vs 8-rotate",
        flush=True,
    )
    # context: the wavefront raymarch MC mode at the same pixel count
    # (still fetch-free; runs before the correctness fetches below)
    from volxel_tpu import Renderer
    from volxel_tpu.grid import construct_brick_grid

    grid = construct_brick_grid(vol_np, transform=np.eye(4, dtype=np.float32))
    r = Renderer(width=inter_side, height=inter_side)
    r.restart_from_grid(grid)
    r.camera.zoom(2.0)
    r.settings.bounces = 1
    r.render_mode = "raymarch"
    ms_rm = _median_ms(lambda: r.render_frame(), n=6)

    print(
        f"raymarch MC mode: {ms_rm:8.2f} ms/sample "
        f"({inter_side}x{inter_side}, 1 progressive sample)"
    )

    # correctness LAST: these asarray calls poison the session (see above)
    a = np.asarray(xla(vol))
    b8 = np.asarray(pal8(vol))
    b2 = np.asarray(pal2(vol))
    err8 = float(np.abs(a - b8).max())
    err2 = float(np.abs(a - b2).max())
    print(
        f"# size {size}^3, intermediate {a.shape}, pallas-vs-xla max err "
        f"{err8:.2e} (8-rotate) / {err2:.2e} (stacked 2-rotate)"
    )
    assert err8 < 1e-4 and err2 < 1e-4


if __name__ == "__main__":
    main()
