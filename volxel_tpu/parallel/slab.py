"""Device-side brick-range construction, sharded by z-slabs with ICI halos.

The reference builds its acceleration structure on the host, serialized
(brick.rs:90 "TODO: This was multithreaded"). Here the dilated per-brick
min/max (brick.rs:99-112) runs **on the accelerator mesh**: the dense
volume is sharded into z-slabs, each device exchanges its 2-voxel boundary
slices with its neighbors via ppermute over ICI (the dilation half-width —
exactly the halo the reference's window [-2, BRICK+2) needs), and computes
its slab's brick ranges with reduce_window. No host round-trip.

This is the scaling path for volumes larger than one chip's HBM and for 4D
time-series ingest where a new timestep is brick-built while the previous
one renders.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from volxel_tpu.grid.encoding import BRICK_SIZE, NUM_MIPMAPS
from volxel_tpu.utils.mathutil import div_round_up

HALO = 2  # dilation half-width (brick.rs:101-103)


def _halo_exchange_z(local: jax.Array, axis: str) -> jax.Array:
    """Concatenate [prev slab's last HALO slices, local, next slab's first].

    Boundary devices receive zeros (out-of-extent lookups read 0.0,
    dicom.rs:8-10). One bidirectional ppermute pair over ICI.
    """
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)

    send_up = local[-HALO:]  # to rank+1: my top slices become their lower halo
    send_down = local[:HALO]  # to rank-1: my bottom slices become their upper halo

    from_prev = jax.lax.ppermute(
        send_up, axis, [(i, i + 1) for i in range(n - 1)]
    )
    from_next = jax.lax.ppermute(
        send_down, axis, [(i + 1, i) for i in range(n - 1)]
    )
    zeros = jnp.zeros_like(send_up)
    from_prev = jnp.where(idx == 0, zeros, from_prev)
    from_next = jnp.where(idx == n - 1, zeros, from_next)
    return jnp.concatenate([from_prev, local, from_next], axis=0)


def _slab_ranges(padded_xy: jax.Array, axis: str):
    """Per-brick dilated min/max for one z-slab (reduce_window, fused)."""
    local = _halo_exchange_z(padded_xy, axis)  # (slab_z + 4, Y + 4, X + 4)
    window = (BRICK_SIZE + 2 * HALO,) * 3
    strides = (BRICK_SIZE,) * 3
    lo = jax.lax.reduce_window(
        local, jnp.inf, jax.lax.min, window, strides, "VALID"
    )
    hi = jax.lax.reduce_window(
        local, -jnp.inf, jax.lax.max, window, strides, "VALID"
    )
    return lo, hi


def brick_ranges_sharded(volume: np.ndarray, mesh: Mesh, axis: str = "px"):
    """Dilated per-brick (min, max) of a dense (Z, Y, X) volume on a mesh.

    The volume is zero-padded to the aligned brick extent, z-sharded over
    `axis`, and reduced on-device. Returns host numpy (bz, by, bx) arrays
    matching the reference window semantics exactly (pre-f16-rounding).
    """
    n_shards = mesh.shape[axis]
    ez, ey, ex = volume.shape
    align = 1 << NUM_MIPMAPS
    bx = div_round_up(div_round_up(ex, BRICK_SIZE), align) * align
    by = div_round_up(div_round_up(ey, BRICK_SIZE), align) * align
    bz = div_round_up(div_round_up(ez, BRICK_SIZE), align) * align
    if bz % n_shards != 0:
        # round the z brick count up so slabs divide evenly
        bz = div_round_up(bz, n_shards * align) * n_shards * align

    full = np.zeros((bz * BRICK_SIZE, by * BRICK_SIZE + 2 * HALO, bx * BRICK_SIZE + 2 * HALO), np.float32)
    full[:ez, HALO : HALO + ey, HALO : HALO + ex] = volume

    spec = P(axis, None, None)
    sharding = NamedSharding(mesh, spec)
    device_vol = jax.device_put(jnp.asarray(full), sharding)

    fn = shard_map(
        functools.partial(_slab_ranges, axis=axis),
        mesh=mesh,
        in_specs=spec,
        out_specs=(spec, spec),
        check_vma=False,
    )
    lo, hi = jax.jit(fn)(device_vol)
    return np.asarray(lo), np.asarray(hi), (bx, by, bz)
