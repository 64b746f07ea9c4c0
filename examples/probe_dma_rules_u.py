"""u-series: aligned-lane DMA variants for the tile-march kernel.
Rule so far: lane-dim window must be statically 128-aligned; dynamic
leading-dim (z) offsets OK. Unknown: dynamic sublane (y), provably
aligned dynamic x (qx*128, pl.multiple_of), full dbuf+fori structure."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, L = 4, 384
def timed(tag, fn):
    try:
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn())
        print(f"{tag}: OK {time.perf_counter()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e).splitlines()[0][:200]}", flush=True)

x = jnp.ones((T, 1, L), jnp.float32)
D = jnp.ones((64, 64, 512), jnp.bfloat16)
corners = jnp.zeros((T, 8, 4), jnp.int32)
vspec = pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
oshape = jax.ShapeDtypeStruct((T, 1, L), jnp.float32)

def arm(tag, win_shape, slicer):
    def kern(c_ref, x_ref, d_ref, o_ref, win, sem):
        z0 = c_ref[0, 0, 0]
        y0 = c_ref[0, 0, 1]
        qx = c_ref[0, 0, 2]
        cp = pltpu.make_async_copy(slicer(d_ref, z0, y0, qx), win, sem)
        cp.start(); cp.wait()
        o_ref[0] = x_ref[0] + jnp.sum(win[:].astype(jnp.float32))
    timed(tag, lambda: pl.pallas_call(
        kern, grid=(T,),
        in_specs=[pl.BlockSpec((1, 8, 4), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                  vspec, pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=vspec, out_shape=oshape,
        scratch_shapes=[pltpu.VMEM(win_shape, jnp.bfloat16),
                        pltpu.SemaphoreType.DMA(())],
    )(corners, x, D))

arm("u1_dyn_zy_staticx", (8, 8, 128),
    lambda d, z, y, q: d.at[pl.ds(z, 8), pl.ds(y, 8), pl.ds(0, 128)])
arm("u2_dyn_x_times128", (8, 8, 128),
    lambda d, z, y, q: d.at[pl.ds(z, 8), pl.ds(y, 8), pl.ds(q * 128, 128)])
arm("u3_dyn_x_multiple_of", (8, 8, 128),
    lambda d, z, y, q: d.at[pl.ds(z, 8), pl.ds(y, 8),
                            pl.ds(pl.multiple_of(q * 128, 128), 128)])
arm("u4_x256_times128", (8, 8, 256),
    lambda d, z, y, q: d.at[pl.ds(z, 8), pl.ds(y, 8), pl.ds(q * 128, 256)])
arm("u5_y16_x256", (8, 16, 256),
    lambda d, z, y, q: d.at[pl.ds(z, 8), pl.ds(y, 16), pl.ds(q * 128, 256)])

# u6: the full tile-march structure — dbuf fori + dot_general, aligned x
def u6(c_ref, t_ref, d_ref, o_ref, win, sem):
    tv = t_ref[0]
    def dmas(slot, s):
        z0 = c_ref[0, s, 0]
        y0 = c_ref[0, s, 1]
        qx = c_ref[0, s, 2]
        return [pltpu.make_async_copy(
            d_ref.at[pl.ds(z0, 8), pl.ds(y0, 16), pl.ds(qx * 128, 256)],
            win.at[slot], sem.at[slot])]
    for cp in dmas(0, 0):
        cp.start()
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (8 * 16, L), 0)
    def body(s, acc):
        slot = jax.lax.rem(s, 2)
        @pl.when(s + 1 < 8)
        def _():
            for cp in dmas(1 - slot, s + 1):
                cp.start()
        for cp in dmas(slot, s):
            cp.wait()
        table = win[slot].reshape(8 * 16, 256)
        onehot = ((tv % 128) == row_iota).astype(jnp.bfloat16)
        vals = jax.lax.dot_general(table, onehot, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        return acc + jnp.sum(vals, axis=0, keepdims=True)
    acc = jax.lax.fori_loop(0, 8, body, jnp.zeros((1, L), jnp.float32))
    o_ref[0] = acc
taps = jnp.ones((T, 1, L), jnp.int32)
timed("u6_full_struct_aligned", lambda: pl.pallas_call(
    u6, grid=(T,),
    in_specs=[pl.BlockSpec((1, 8, 4), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
              pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=vspec, out_shape=oshape,
    scratch_shapes=[pltpu.VMEM((2, 8, 16, 256), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((2,))],
)(corners, taps, D))

# u7: while_loop instead of fori (the production sample kernel uses while)
def u7(c_ref, t_ref, d_ref, o_ref, win, sem):
    def dmas(slot, s):
        z0 = c_ref[0, s, 0]
        return [pltpu.make_async_copy(
            d_ref.at[pl.ds(z0, 8), pl.ds(0, 16), pl.ds(0, 256)],
            win.at[slot], sem.at[slot])]
    for cp in dmas(0, 0):
        cp.start()
    def cond(carry):
        return carry[0] < 8
    def body(carry):
        s, acc = carry
        slot = jax.lax.rem(s, 2)
        @pl.when(s + 1 < 8)
        def _():
            for cp in dmas(1 - slot, s + 1):
                cp.start()
        for cp in dmas(slot, s):
            cp.wait()
        return s + 1, acc + jnp.sum(win[slot].astype(jnp.float32))
    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(0.0)))
    o_ref[0] = acc + jnp.zeros((1, L), jnp.float32)
timed("u7_while_dbuf", lambda: pl.pallas_call(
    u7, grid=(T,),
    in_specs=[pl.BlockSpec((1, 8, 4), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
              pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=vspec, out_shape=oshape,
    scratch_shapes=[pltpu.VMEM((2, 8, 16, 256), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((2,))],
)(corners, taps, D))
print("all arms done", flush=True)
