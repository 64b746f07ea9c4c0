"""Bisect which construct of the tile-march kernel Mosaic rejects.

The full kernel (render/tilemarch.py) fails remote-compile with an
opaque HTTP 500; each arm here adds one suspect construct on top of a
known-good r8-style base. Run on the chip; failures are fast (~2 s).

Arms:
  a_smem_block   : SMEM BlockSpec with index_map (vs r8's scalar prefetch)
  b_dotgen       : dot_general contracting dim 0 of both operands
  c_fori_dma     : single-buffered DMA inside an in-kernel fori
  d_dbuf         : + double-buffered DMA (dynamic slot win/sem indexing)
  e_dyn_read     : + win[slot] dynamic read + reshape
  f_full         : the real tile_march_sums
"""

from __future__ import annotations

import sys
import time

import numpy as np

T, L, S = 8, 384, 8
DZ, DY, DX = 16, 16, 64
ZP = 128 // DX
DZQ = DZ // ZP
ROWS = DZQ * DY
EXT = 128


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.random((EXT, EXT, EXT), np.float32), jnp.bfloat16)
    corners = jnp.asarray(
        rng.integers(0, EXT - max(DZ, DY, DX), (T, S, 4)), jnp.int32)
    rows_idx = jnp.asarray(rng.integers(0, ROWS, (T, 1, L)), jnp.int32)

    def timed(tag, fn):
        try:
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn())
            print(f"  {tag}: OK {time.perf_counter() - t0:.1f} s "
                  f"sum={float(np.asarray(out).sum()):.3f}", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:200]
            print(f"  {tag}: FAILED {type(e).__name__}: {msg}", flush=True)

    common = dict(
        out_specs=pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 1, L), jnp.float32),
    )

    # ---- a: SMEM BlockSpec with index_map + one static DMA ----
    def kern_a(c_ref, r_ref, dense_ref, o_ref, win, sem):
        z0 = c_ref[0, 0, 0]
        cp = pltpu.make_async_copy(
            dense_ref.at[pl.ds(z0, DZ), pl.ds(z0, DY), pl.ds(z0, DX)],
            win, sem)
        cp.start()
        cp.wait()
        table = win[:].reshape(ROWS * ZP, DX)
        o_ref[0] = jnp.sum(table) + jnp.zeros((1, L), jnp.float32) \
            + r_ref[0].astype(jnp.float32)

    timed("a_smem_block", lambda: pl.pallas_call(
        kern_a,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, S, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[pltpu.VMEM((DZ, DY, DX), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA(())],
        **common,
    )(corners, rows_idx, dense))

    # ---- b: + dot_general contracting dim 0 x dim 0 ----
    def kern_b(c_ref, r_ref, dense_ref, o_ref, win, sem):
        z0 = c_ref[0, 0, 0]
        cp = pltpu.make_async_copy(
            dense_ref.at[pl.ds(z0, DZ), pl.ds(z0, DY), pl.ds(z0, DX)],
            win, sem)
        cp.start()
        cp.wait()
        table = win[:].reshape(ROWS, ZP * DX)
        row = r_ref[0]
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, L), 0)
        onehot = (row == row_iota).astype(jnp.bfloat16)
        vals = jax.lax.dot_general(
            table, onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0] = jnp.sum(vals, axis=0, keepdims=True)

    timed("b_dotgen", lambda: pl.pallas_call(
        kern_b,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, S, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[pltpu.VMEM((DZ, DY, DX), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA(())],
        **common,
    )(corners, rows_idx, dense))

    # ---- c: DMA inside an in-kernel fori (single buffer) ----
    def kern_c(c_ref, r_ref, dense_ref, o_ref, win, sem):
        def body(s, acc):
            z0 = c_ref[0, s, 0]
            cp = pltpu.make_async_copy(
                dense_ref.at[pl.ds(z0, DZ), pl.ds(z0, DY), pl.ds(z0, DX)],
                win, sem)
            cp.start()
            cp.wait()
            return acc + jnp.sum(win[:].astype(jnp.float32))

        acc = jax.lax.fori_loop(0, S, body, jnp.float32(0.0))
        o_ref[0] = acc + jnp.zeros((1, L), jnp.float32)

    timed("c_fori_dma", lambda: pl.pallas_call(
        kern_c,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, S, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[pltpu.VMEM((DZ, DY, DX), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA(())],
        **common,
    )(corners, rows_idx, dense))

    # ---- d: + double buffering (dynamic slot) ----
    def kern_d(c_ref, r_ref, dense_ref, o_ref, win, sem):
        def dmas(slot, s):
            z0 = c_ref[0, s, 0]
            return [pltpu.make_async_copy(
                dense_ref.at[pl.ds(z0 + zr * DZQ, DZQ), pl.ds(z0, DY),
                             pl.ds(z0, DX)],
                win.at[slot, :, :, zr, :], sem.at[slot, zr])
                for zr in range(ZP)]

        for cp in dmas(0, 0):
            cp.start()

        def body(s, acc):
            slot = jax.lax.rem(s, 2)

            @pl.when(s + 1 < S)
            def _():
                for cp in dmas(1 - slot, s + 1):
                    cp.start()

            for cp in dmas(slot, s):
                cp.wait()
            return acc + win[slot, 0, 0, 0, 0].astype(jnp.float32)

        acc = jax.lax.fori_loop(0, S, body, jnp.float32(0.0))
        o_ref[0] = acc + jnp.zeros((1, L), jnp.float32)

    timed("d_dbuf", lambda: pl.pallas_call(
        kern_d,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, S, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[pltpu.VMEM((2, DZQ, DY, ZP, DX), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((2, ZP))],
        **common,
    )(corners, rows_idx, dense))

    # ---- e: + dynamic win[slot] read + reshape ----
    def kern_e(c_ref, r_ref, dense_ref, o_ref, win, sem):
        def dmas(slot, s):
            z0 = c_ref[0, s, 0]
            return [pltpu.make_async_copy(
                dense_ref.at[pl.ds(z0 + zr * DZQ, DZQ), pl.ds(z0, DY),
                             pl.ds(z0, DX)],
                win.at[slot, :, :, zr, :], sem.at[slot, zr])
                for zr in range(ZP)]

        for cp in dmas(0, 0):
            cp.start()
        row = r_ref[0]
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, L), 0)

        def body(s, acc):
            slot = jax.lax.rem(s, 2)

            @pl.when(s + 1 < S)
            def _():
                for cp in dmas(1 - slot, s + 1):
                    cp.start()

            for cp in dmas(slot, s):
                cp.wait()
            table = win[slot].reshape(ROWS, ZP * DX)
            onehot = (row == row_iota).astype(jnp.bfloat16)
            vals = jax.lax.dot_general(
                table, onehot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc + jnp.sum(vals, axis=0, keepdims=True)

        acc = jax.lax.fori_loop(0, S, body, jnp.zeros((1, L), jnp.float32))
        o_ref[0] = acc

    timed("e_dyn_read", lambda: pl.pallas_call(
        kern_e,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, S, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[pltpu.VMEM((2, DZQ, DY, ZP, DX), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((2, ZP))],
        **common,
    )(corners, rows_idx, dense))

    # ---- f: the real kernel at probe scale ----
    from volxel_tpu.render.tilemarch import (
        pack_tile_rays, tile_corners, tile_march_sums)

    ipos = rng.uniform(5, 20, (T, L, 3)).astype(np.float32)
    idir = rng.normal(size=(T, 1, 3)).astype(np.float32)
    idir = np.broadcast_to(
        idir / np.linalg.norm(idir, axis=-1, keepdims=True), (T, L, 3))
    rays = pack_tile_rays(
        jnp.asarray(ipos), jnp.asarray(idir),
        jnp.zeros((T, L), jnp.float32), jnp.full((T, L), 0.9, jnp.float32),
        jnp.full((T, L), 60.0, jnp.float32), jnp.ones((T, L), bool))
    ext4 = jnp.asarray([EXT, EXT, EXT, 0], jnp.int32)
    cs = tile_corners(rays, [EXT] * 3, DZ, DY, DX, steps=S)
    timed("f_full", lambda: tile_march_sums(
        dense, rays, cs, ext4, dz=DZ, dy=DY, dx=DX, steps=S)[0])


if __name__ == "__main__":
    main()
