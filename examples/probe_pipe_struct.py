"""Prove the pipelined tile-march structure on-chip: grid (T, S), dense
as 8 block in_specs (2x2x2 neighborhood) with per-(t,s) prefetched block
indices, scratch persisting across s, revisited output accumulation,
in-kernel dot_general, pl.when gating. Fetch-free."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, S, L = 4, 8, 384
BZ, BY, BX = 8, 16, 128
Z, Y, X = 64, 64, 512

def timed(tag, fn):
    try:
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn())
        print(f"{tag}: OK {time.perf_counter()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e).splitlines()[0][:240]}", flush=True)

rng = np.random.default_rng(0)
dense = jnp.asarray(rng.random((Z, Y, X), np.float32), jnp.bfloat16)
# per-(t, s) base block index (bz, by, bx), each in block units
cb = jnp.stack([
    jnp.asarray(rng.integers(0, Z // BZ - 1, (T, S)), jnp.int32),
    jnp.asarray(rng.integers(0, Y // BY - 1, (T, S)), jnp.int32),
    jnp.asarray(rng.integers(0, X // BX - 1, (T, S)), jnp.int32),
], axis=-1)  # (T, S, 3)
taps = jnp.ones((T, 1, L), jnp.int32)
rows = 2 * BZ * 2 * BY  # window z*y rows when both z,y neighborhoods used

def kern(c_ref, t_ref, *refs):
    # refs: 8 dense blocks, out, state scratch
    blocks = refs[:8]
    o_ref = refs[8]
    st = refs[9]
    t = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        o_ref[0] = jnp.zeros((1, L), jnp.float32)
        st[...] = jnp.zeros((1, L), jnp.float32)

    # window (2BZ, 2BY, 2BX): assemble logical table rows = (z, y)
    # as 2x2 block quadrants; cols = x in [0, 2BX)
    tv = t_ref[0]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (BZ * BY, L), 0)
    acc = jnp.zeros((1, L), jnp.float32)
    for zi in range(2):
        for yi in range(2):
            for xi in range(2):
                blk = blocks[zi * 4 + yi * 2 + xi][...]  # (BZ, BY, BX)
                table = blk.reshape(BZ * BY, BX)
                onehot = ((tv % (BZ * BY)) == row_iota).astype(jnp.bfloat16)
                vals = jax.lax.dot_general(
                    table, onehot, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = acc + jnp.sum(vals, axis=0, keepdims=True)
    st[...] = st[...] + acc
    o_ref[0] += acc + jnp.where(s == S - 1, st[...], 0.0)

def block_spec(zo, yo, xo):
    return pl.BlockSpec(
        (BZ, BY, BX),
        lambda t, s, c: (c[t, s, 0] + zo, c[t, s, 1] + yo, c[t, s, 2] + xo),
        memory_space=pltpu.VMEM)

gs = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(T, S),
    in_specs=[pl.BlockSpec((1, 1, L), lambda t, s, c: (t, 0, 0),
                           memory_space=pltpu.VMEM)]
    + [block_spec(zi, yi, xi)
       for zi in range(2) for yi in range(2) for xi in range(2)],
    out_specs=pl.BlockSpec((1, 1, L), lambda t, s, c: (t, 0, 0),
                           memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((1, L), jnp.float32)],
)
timed("pipe_full_struct", lambda: pl.pallas_call(
    kern, grid_spec=gs,
    out_shape=jax.ShapeDtypeStruct((T, 1, L), jnp.float32),
)(cb, taps, *([dense] * 8)))

# variant: while-free but with lax.cond inside (production uses selects only)
print("all arms done", flush=True)
