"""t-series: which window/source geometry kills the remote compile.
Known: (64,64,64) src + (8,8,64) window FAILS; 2D leading-dim slice OK."""
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
D512 = jnp.ones((64, 64, 512), jnp.bfloat16)
D64 = jnp.ones((64, 64, 64), jnp.bfloat16)
corners = jnp.zeros((T, 8, 4), jnp.int32)
vspec = pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
oshape = jax.ShapeDtypeStruct((T, 1, L), jnp.float32)

def arm(tag, src, win_shape, slicer, dyn=False):
    def kern(c_ref, x_ref, d_ref, o_ref, win, sem):
        z0 = c_ref[0, 0, 0] if dyn else 0
        cp = pltpu.make_async_copy(slicer(d_ref, z0), win, sem)
        cp.start(); cp.wait()
        o_ref[0] = x_ref[0] + jnp.sum(win[:].astype(jnp.float32))
    timed(tag, lambda: pl.pallas_call(
        kern, grid=(T,),
        in_specs=[pl.BlockSpec((1, 8, 4), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                  vspec, pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=vspec, out_shape=oshape,
        scratch_shapes=[pltpu.VMEM(win_shape, jnp.bfloat16),
                        pltpu.SemaphoreType.DMA(())],
    )(corners, x, src))

# static offsets, 512-wide source
arm("t1_z_y_slice_fullx", D512, (8, 8, 512),
    lambda d, z: d.at[pl.ds(0, 8), pl.ds(0, 8)])
arm("t2_x128_at0", D512, (8, 8, 128),
    lambda d, z: d.at[pl.ds(0, 8), pl.ds(0, 8), pl.ds(0, 128)])
arm("t3_x128_at64", D512, (8, 8, 128),
    lambda d, z: d.at[pl.ds(0, 8), pl.ds(0, 8), pl.ds(64, 128)])
arm("t4_x64_win", D512, (8, 8, 64),
    lambda d, z: d.at[pl.ds(0, 8), pl.ds(0, 8), pl.ds(0, 64)])
# control: the known-fail geometry
arm("t5_ctrl_64src", D64, (8, 8, 64),
    lambda d, z: d.at[pl.ds(0, 8), pl.ds(0, 8), pl.ds(0, 64)])
# dynamic offsets
arm("t6_dyn_z", D512, (8, 8, 128),
    lambda d, z: d.at[pl.ds(z, 8), pl.ds(0, 8), pl.ds(0, 128)], dyn=True)
arm("t7_dyn_all", D512, (8, 8, 128),
    lambda d, z: d.at[pl.ds(z, 8), pl.ds(z, 8), pl.ds(z, 128)], dyn=True)
arm("t8_dyn_all_x64", D512, (8, 8, 64),
    lambda d, z: d.at[pl.ds(z, 8), pl.ds(z, 8), pl.ds(z, 64)], dyn=True)
print("all arms done", flush=True)
