"""Is a dim0-dynamic in-kernel DMA offset legal when the window obeys
the lane rule (full/128-aligned lanes, static sublanes)? The old k4
failure used an illegal 64-lane window; this isolates the offset
PROVENANCE: SMEM scalar (known OK) vs in-kernel vector reduction vs
in-kernel SMEM scratch round-trip."""
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

D = jnp.ones((4096, 512), jnp.bfloat16)  # (Z*Y, X) layout
taps = jnp.ones((T, 1, L), jnp.int32) * 7
x = jnp.ones((T, 1, L), jnp.float32)
vspec = pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
oshape = jax.ShapeDtypeStruct((T, 1, L), jnp.float32)

# c1: offset from in-kernel VECTOR REDUCTION (min over VMEM lanes)
def c1(t_ref, d_ref, o_ref, win, sem):
    r0 = jnp.clip(jnp.min(t_ref[0]), 0, 4096 - 16)
    cp = pltpu.make_async_copy(d_ref.at[pl.ds(r0, 16)], win, sem)
    cp.start(); cp.wait()
    o_ref[0] = jnp.sum(win[:].astype(jnp.float32)) + jnp.zeros((1, L), jnp.float32)
timed("c1_vector_reduce_offset", lambda: pl.pallas_call(
    c1, grid=(T,),
    in_specs=[vspec, pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=vspec, out_shape=oshape,
    scratch_shapes=[pltpu.VMEM((16, 512), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA(())],
)(taps, D))

# c2: same inside a fori loop (the adaptive-march shape)
def c2(t_ref, d_ref, o_ref, win, sem):
    def body(s, acc):
        r0 = jnp.clip(jnp.min(t_ref[0]) + s, 0, 4096 - 16)
        cp = pltpu.make_async_copy(d_ref.at[pl.ds(r0, 16)], win, sem)
        cp.start(); cp.wait()
        return acc + jnp.sum(win[:].astype(jnp.float32))
    acc = jax.lax.fori_loop(0, 8, body, jnp.float32(0.0))
    o_ref[0] = acc + jnp.zeros((1, L), jnp.float32)
timed("c2_fori_vector_offset", lambda: pl.pallas_call(
    c2, grid=(T,),
    in_specs=[vspec, pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=vspec, out_shape=oshape,
    scratch_shapes=[pltpu.VMEM((16, 512), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA(())],
)(taps, D))

# c3: 3D source, dyn dim0 from vector reduce, static full last dims
D3 = jnp.ones((512, 16, 512), jnp.bfloat16)
def c3(t_ref, d_ref, o_ref, win, sem):
    r0 = jnp.clip(jnp.min(t_ref[0]), 0, 512 - 8)
    cp = pltpu.make_async_copy(
        d_ref.at[pl.ds(r0, 8), pl.ds(0, 16), pl.ds(0, 512)], win, sem)
    cp.start(); cp.wait()
    o_ref[0] = jnp.sum(win[:].astype(jnp.float32)) + jnp.zeros((1, L), jnp.float32)
timed("c3_3d_dyn_dim0", lambda: pl.pallas_call(
    c3, grid=(T,),
    in_specs=[vspec, pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=vspec, out_shape=oshape,
    scratch_shapes=[pltpu.VMEM((8, 16, 512), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA(())],
)(taps, D3))
print("done", flush=True)
