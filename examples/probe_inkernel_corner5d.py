"""c4: dynamic ds on untiled dims 0,1,2 of a 5D (Z, Yq, Xq, 16, 128)
layout — the key to adaptive in-kernel box DMA with compact windows."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, L = 4, 384
def timed(tag, fn):
    try:
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        print(f"{tag}: OK {time.perf_counter()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e).splitlines()[0][:160]}", flush=True)

D5 = jnp.ones((64, 32, 4, 16, 128), jnp.bfloat16)
taps = jnp.ones((T, 1, L), jnp.int32) * 3
vspec = pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
oshape = jax.ShapeDtypeStruct((T, 1, L), jnp.float32)

def c4(t_ref, d_ref, o_ref, win, sem):
    r0 = jnp.clip(jnp.min(t_ref[0]), 0, 56)
    y0 = jnp.clip(jnp.min(t_ref[0]) // 2, 0, 30)
    x0 = jnp.clip(jnp.min(t_ref[0]) // 3, 0, 2)
    cp = pltpu.make_async_copy(
        d_ref.at[pl.ds(r0, 8), pl.ds(y0, 2), pl.ds(x0, 2)], win, sem)
    cp.start(); cp.wait()
    o_ref[0] = jnp.sum(win[:].astype(jnp.float32)) + jnp.zeros((1, L), jnp.float32)
timed("c4_5d_dyn_untiled_dims", lambda: pl.pallas_call(
    c4, grid=(T,),
    in_specs=[vspec, pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=vspec, out_shape=oshape,
    scratch_shapes=[pltpu.VMEM((8, 2, 2, 16, 128), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA(())],
)(taps, D5))

# c5: same inside a while_loop with the offset evolving from the window
# content (true adaptive-march shape: next window depends on data)
def c5(t_ref, d_ref, o_ref, win, sem):
    def cond(c):
        return c[0] < 6
    def body(c):
        i, r0, acc = c
        cp = pltpu.make_async_copy(
            d_ref.at[pl.ds(r0, 8), pl.ds(0, 2), pl.ds(0, 2)], win, sem)
        cp.start(); cp.wait()
        s = jnp.sum(win[:].astype(jnp.float32))
        r0n = jnp.clip(r0 + (s.astype(jnp.int32) % 3) + 1, 0, 56)
        return i + 1, r0n, acc + s
    _, _, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.clip(jnp.min(t_ref[0]), 0, 56),
                     jnp.float32(0.0)))
    o_ref[0] = acc + jnp.zeros((1, L), jnp.float32)
timed("c5_adaptive_while_dma", lambda: pl.pallas_call(
    c5, grid=(T,),
    in_specs=[vspec, pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=vspec, out_shape=oshape,
    scratch_shapes=[pltpu.VMEM((8, 2, 2, 16, 128), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA(())],
)(taps, D5))
print("done", flush=True)
