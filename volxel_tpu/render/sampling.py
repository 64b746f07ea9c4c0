"""Device-side brick-grid lookups and transfer-function sampling.

JAX re-design of shaders/sampling/common.glsl. All functions are vectorized
over an arbitrary leading ray/sample shape and are pure (state explicit).

TPU-specific redesign vs the GL original:
  * the per-ray adaptive-mip majorant lookup (common.glsl:50-53) would need
    a data-dependent texture level; instead every range-mip level is
    nearest-upsampled to finest brick resolution at load time and stacked
    into one (NUM_MIPS+1, bz, by, bx) array, so the traced mip index becomes
    one more gather coordinate. 4 levels of a 64^3 brick grid cost ~4 MiB.
  * the transfer LUT is sampled NEAREST (the viewer uses NEAREST filters,
    viewer.ts:386-387) with sample-range rejection (common.glsl:78-83).
  * out-of-extent voxel taps return 0.0 like GL texelFetch robust access.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from volxel_tpu.grid.brick import BrickGrid
from volxel_tpu.render.rng import rng3, rng3_where


class DeviceGrid(NamedTuple):
    """Brick grid resident in HBM.

    `dense`, when present, is the atlas pre-decoded to a flat (Z, Y, X)
    bfloat16 field: a TPU-first trade (HBM is plentiful; the browser
    renderer's indirection exists to fit GPU memory) that turns the
    4-array gather chain of a voxel read (range_lo, range_hi, ptr, atlas —
    common.glsl:36-43) into ONE gather. Values are decoded from the
    quantized atlas, so images match the brick path up to bf16 rounding
    (~the same magnitude as the u8 quantization itself). Majorant queries
    still use the brick range pyramid.
    """

    atlas: jax.Array  # (az, ay, ax) uint8
    range_lo: jax.Array  # (bz, by, bx) float32
    range_hi: jax.Array  # (bz, by, bx) float32
    ptr: jax.Array  # (bz, by, bx, 3) int32 (x, y, z)
    # all mip levels upsampled to finest brick resolution:
    maj_mips: jax.Array  # (4, bz, by, bx) float32 — level 0 = range_hi
    extent: jax.Array  # (3,) int32 (x, y, z) index extent
    dense: jax.Array | None = None  # (Z, Y, X) bfloat16 decoded density
    # optional premultiplied pyramid: vol_maj * transfer_alpha(majorant)
    # precomputed per texel at operand-prep time (modes.build_premul_majorant)
    # so the DDA inner march does ONE gather per step instead of pyramid +
    # transfer-LUT. Same per-element op sequence as the inline computation
    # -> bit-identical renders (pinned by tests/test_render.py).
    maj_alpha: jax.Array | None = None  # (4, bz, by, bx) float32
    # optional MXU-gather packing of maj_alpha (render.mxu_gather): the
    # COMPACT pyramid (level m at its own (ceil(b/2^m))^3 resolution —
    # same values, smaller index space) flattened level-major and packed
    # into bf16 byte planes, so the march's per-step majorant fetch runs
    # as a one-hot matmul on the MXU instead of XLA's serialized scalar
    # gather. Values bit-equal to maj_alpha's by construction.
    maj_mxu: jax.Array | None = None  # (R, 512) bfloat16
    # int8 packing of the same compact premul pyramid for the
    # VMEM-resident in-kernel march (render.pyrmarch): present when
    # RenderConfig.pyr_march engages. Values bit-equal to maj_alpha's.
    maj_pyr: jax.Array | None = None  # (R, 512) int8
    # MXU-gather packing of the transfer LUT (K*4 floats) — the decode
    # and raymarch LUT fetches run on the MXU when present.
    lut_mxu: jax.Array | None = None
    # x-pair packing of `dense` (pack_dense_pairs): element [z, y, x]
    # holds bf16(dense[z, y, x]) in the low 16 bits and
    # bf16(dense[z, y, min(x+1, X-1)]) in the high 16 — the trilinear
    # decode then fetches its 8 taps with FOUR serialized gathers
    # instead of eight (XLA TPU prices gathers per ELEMENT, independent
    # of element size — NOTES.md r5 profile). Costs one extra dense-set
    # of HBM (u32 vs bf16); opt-in via Renderer(pair_decode=True).
    dense_pair: jax.Array | None = None
    # xy-quad packing of `dense` (pack_dense_quads): one complex64
    # element per voxel holds the FOUR bf16 taps of a trilinear
    # stencil's xy-plane — real bits = x-pair at row y, imag bits =
    # x-pair at row min(y+1, Y-1) — so the 8-tap decode fetches TWO
    # 8-byte elements (the next rung of the per-ACCESS gather pricing
    # that made dense_pair win -18.4%). Costs 4x the bf16 field in HBM;
    # takes precedence over dense_pair when both are present.
    dense_quad: jax.Array | None = None
    # full-stencil packing (pack_dense_octo): a (Z, Y, X, 4) uint32 row
    # per voxel holds ALL EIGHT bf16 taps of the trilinear stencil based
    # there (channel 2*dz+dy = the x-pair at (z+dz, y+dy), clamped), so
    # the decode is ONE row gather — the probe measured a trailing
    # size-4 gather window priced like a single access
    # (examples/probe_wide_gather.py). Costs 8x the bf16 field in HBM
    # (2 GiB at 512^3); takes precedence over dense_quad/dense_pair.
    dense_octo: jax.Array | None = None


# dense fields are built for volumes up to this many bytes (bf16)
DENSE_BUDGET_BYTES = 2 << 30
# the full-stencil octo packing (16 B/voxel) engages under "auto" only up
# to this many bytes — 512^3 costs 2 GiB, 1024^3 would cost 16 GiB and
# must fall back to the 4 B/voxel pair packing (v5e HBM is 16 GiB total)
OCTO_BUDGET_BYTES = 8 << 30


def _upsample_nearest(arr: np.ndarray, factor: int) -> np.ndarray:
    return np.repeat(np.repeat(np.repeat(arr, factor, 0), factor, 1), factor, 2)


def decode_dense(grid: BrickGrid, dtype=np.float32) -> np.ndarray:
    """Decode the full brick grid to a dense (Z, Y, X) field (host side)."""
    bx, by, bz = grid.brick_count
    az_b = grid.atlas.shape[0] // 8 if grid.atlas.shape[0] else 0
    # atlas -> per-slot bricks
    atlas_bricks = (
        grid.atlas.reshape(az_b, 8, by, 8, bx, 8)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(az_b * by * bx, 8, 8, 8)
        .astype(np.float32)
        if az_b
        else np.zeros((0, 8, 8, 8), np.float32)
    )
    ptr = grid.indirection.reshape(-1, 3).astype(np.int64)
    slot = ptr[:, 2] * (by * bx) + ptr[:, 1] * bx + ptr[:, 0]
    occupied = (grid.range_lo != grid.range_hi).ravel()
    lo = grid.range_lo.reshape(-1, 1, 1, 1)
    hi = grid.range_hi.reshape(-1, 1, 1, 1)
    voxels = np.where(
        occupied[:, None, None, None],
        atlas_bricks[np.minimum(slot, max(len(atlas_bricks) - 1, 0))],
        0.0,
    )
    decoded = lo + voxels * np.float32(1.0 / 255.0) * (hi - lo)
    dense = (
        decoded.reshape(bz, by, bx, 8, 8, 8)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(bz * 8, by * 8, bx * 8)
    )
    return dense.astype(dtype)


def decode_dense_brick_rows(
    grid: BrickGrid, b0: int, b1: int, dtype=np.float32
) -> np.ndarray:
    """Decode brick z-rows [b0, b1) to dense voxels — bitwise equal to
    `decode_dense(grid)[b0*8 : b1*8]` (pinned by tests/test_grid.py).

    The out-of-core building block (VERDICT r3 item 1): a z-slab of a
    beyond-budget volume decodes without ever materializing the full dense
    field on host or device. Peak host memory is O((b1-b0) * Y * X).
    """
    bx, by, bz = grid.brick_count
    nb = b1 - b0
    out_shape = (nb * 8, by * 8, bx * 8)
    if nb <= 0:
        return np.zeros((0,) + out_shape[1:], dtype)
    ptr = grid.indirection[b0:b1].reshape(-1, 3).astype(np.int64)
    lo = grid.range_lo[b0:b1].reshape(-1, 1, 1, 1)
    hi = grid.range_hi[b0:b1].reshape(-1, 1, 1, 1)
    occupied = (grid.range_lo[b0:b1] != grid.range_hi[b0:b1]).ravel()
    if grid.atlas.size:
        dz, dy, dx = np.meshgrid(
            np.arange(8), np.arange(8), np.arange(8), indexing="ij"
        )
        # direct per-brick atlas window: atlas[pz*8+dz, py*8+dy, px*8+dx]
        # is elementwise identical to decode_dense's atlas_bricks[slot]
        # (same z-major slot layout); coords clipped for unoccupied bricks
        # whose ptr may be stale — their values are masked out below.
        az = np.clip(ptr[:, 2, None, None, None] * 8 + dz, 0, grid.atlas.shape[0] - 1)
        ay = np.clip(ptr[:, 1, None, None, None] * 8 + dy, 0, grid.atlas.shape[1] - 1)
        ax = np.clip(ptr[:, 0, None, None, None] * 8 + dx, 0, grid.atlas.shape[2] - 1)
        raw = grid.atlas[az, ay, ax].astype(np.float32)
    else:
        raw = np.zeros((len(ptr), 8, 8, 8), np.float32)
    voxels = np.where(occupied[:, None, None, None], raw, 0.0)
    decoded = lo + voxels * np.float32(1.0 / 255.0) * (hi - lo)
    dense = (
        decoded.reshape(nb, by, bx, 8, 8, 8)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(out_shape)
    )
    return dense.astype(dtype)


def _decode_dense_device(atlas, range_lo, range_hi, ptr):
    """Decode the brick atlas to the dense bf16 field ON DEVICE.

    Bit-parity with the host `decode_dense` (same op sequence in f32, cast
    to bf16 at the end — pinned by tests/test_grid.py): uploading the u8
    atlas + ranges and decoding on the accelerator ships ~half the bytes
    of the decoded bf16 field over the host->device link and deletes the
    host-side decode entirely (VERDICT r3 item 2: 211 s of driver setup
    was this upload). Everything is a jit ARGUMENT, never a closure
    constant (tunnel remote-compile size limit, CLAUDE.md).
    """
    bz, by, bx = range_lo.shape
    az_b = atlas.shape[0] // 8 if atlas.shape[0] else 0
    if az_b == 0:
        return jnp.zeros((bz * 8, by * 8, bx * 8), jnp.bfloat16)
    atlas_bricks = (
        atlas.reshape(az_b, 8, by, 8, bx, 8)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(az_b * by * bx, 8, 8, 8)
        .astype(jnp.float32)
    )
    p = ptr.reshape(-1, 3).astype(jnp.int32)
    slot = p[:, 2] * (by * bx) + p[:, 1] * bx + p[:, 0]
    occupied = (range_lo != range_hi).ravel()
    lo = range_lo.reshape(-1, 1, 1, 1)
    hi = range_hi.reshape(-1, 1, 1, 1)
    voxels = jnp.where(
        occupied[:, None, None, None],
        atlas_bricks[jnp.minimum(slot, az_b * by * bx - 1)],
        0.0,
    )
    # optimization_barriers pin the host decode's exact IEEE op order:
    # without them XLA contracts/reassociates (FMA, const-folding
    # c*(hi-lo)) and voxels landing on bf16 rounding ties flip by one ulp
    # (measured: 6/262k elements without the barriers)
    barrier = jax.lax.optimization_barrier
    scaled = barrier(voxels * jnp.float32(1.0 / 255.0))
    scaled = barrier(scaled * (hi - lo))
    decoded = barrier(lo + scaled)
    dense = (
        decoded.reshape(bz, by, bx, 8, 8, 8)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(bz * 8, by * 8, bx * 8)
    )
    return dense.astype(jnp.bfloat16)


_decode_dense_jit = jax.jit(_decode_dense_device)


def _ceil_to_bf16(a: np.ndarray) -> np.ndarray:
    """Round a non-negative f32 array UP to the nearest bfloat16 — the
    conservative direction for majorants (an underestimate would bias the
    null-collision estimator; an overestimate only costs extra null
    collisions)."""
    import ml_dtypes

    b = a.astype(ml_dtypes.bfloat16)
    down = b.astype(np.float32) < a
    bumped = (b.view(np.uint16) + 1).view(ml_dtypes.bfloat16)
    return np.where(down, bumped, b)


def build_majorant_pyramid(grid: BrickGrid, maj_dtype: str = "float32") -> np.ndarray:
    """Stacked (NUM_MIPS+1, bz, by, bx) majorant pyramid — every range-mip
    level nearest-upsampled to finest brick resolution (module docstring).
    maj_dtype="bfloat16" rounds UP so the result stays a valid majorant."""
    mips = [grid.range_hi]
    for level, (_, hi) in enumerate(grid.range_mips):
        mips.append(_upsample_nearest(hi, 1 << (level + 1)))
    maj = np.stack(mips, axis=0).astype(np.float32)
    if maj_dtype == "bfloat16":
        maj = _ceil_to_bf16(maj)
    return maj


def device_grid_from_brick(
    grid: BrickGrid,
    dense: bool | None = None,
    maj_dtype: str = "float32",
    decode_on_device: bool = True,
) -> DeviceGrid:
    """Upload a BrickGrid. dense: True/False force, None = auto by budget.

    maj_dtype="bfloat16" stores the stacked majorant pyramid in bf16
    (rounded UP, so it stays a valid majorant) — halves the hot
    1-gather-per-DDA-step traffic at the cost of slightly more null
    collisions; the estimator stays unbiased but per-sample images are a
    different (equally valid) random realization, so it is opt-in.

    decode_on_device (default): the dense field is decoded from the
    uploaded u8 atlas BY THE ACCELERATOR (_decode_dense_device) instead of
    decoded on host and shipped as bf16 — half the host->device bytes and
    no host decode. Bit-identical to the host path (pinned by
    tests/test_grid.py::test_device_decode_bit_parity)."""
    bx, by, bz = grid.brick_count
    maj = build_majorant_pyramid(grid, maj_dtype)

    n_voxels = (bx * by * bz) * 512
    if dense is None:
        dense = n_voxels * 2 <= DENSE_BUDGET_BYTES
    atlas = jnp.asarray(grid.atlas)
    range_lo = jnp.asarray(grid.range_lo)
    range_hi = jnp.asarray(grid.range_hi)
    ptr = jnp.asarray(grid.indirection)
    if not dense:
        dense_field = None
    elif decode_on_device:
        dense_field = _decode_dense_jit(atlas, range_lo, range_hi, ptr)
    else:
        dense_field = jnp.asarray(decode_dense(grid), dtype=jnp.bfloat16)
    return DeviceGrid(
        atlas=atlas,
        range_lo=range_lo,
        range_hi=range_hi,
        ptr=ptr,
        maj_mips=jnp.asarray(maj),
        extent=jnp.asarray(np.array(grid.index_extent, np.int32)),
        dense=dense_field,
    )


@jax.tree_util.register_pytree_node_class
class SlabGrid:
    """A DeviceGrid whose dense voxel field is z-slab-sharded over a mesh axis.

    Render-time volume sharding (north star configs[4]): the bulk voxel data
    — the only operand that outgrows one chip's HBM — lives as per-device
    z-slabs with a 2-voxel halo band on each side (the reference's dilation
    half-width, brick.rs:101-103, which also covers every trilinear stencil,
    common.glsl:61-69), exchanged once at load time via ppermute over ICI
    (parallel.volshard). The majorant pyramid and extent stay replicated
    (~4 MiB for 512^3 — metadata, not bulk).

    Lookup protocol: ray state is replicated over the slab axis, so every
    device executes the same traversal control flow in lockstep; each
    density tap is answered by the one device owning the tap's z-slice
    (owner-masked local gather) and combined with a psum over the axis.
    Adding the other devices' exact-zero contributions is bitwise-exact, so
    sharded renders are bit-identical to replicated-grid renders — pinned by
    tests/test_volshard.py.

    Only valid inside shard_map over a mesh containing `axis`.
    """

    def __init__(self, dense_local, maj_mips, extent, axis: str,
                 tap_dtype: str = "float32"):
        self.dense_local = dense_local  # (slab_z + 2*SLAB_HALO, Y, X) bf16
        self.maj_mips = maj_mips  # replicated — same layout as DeviceGrid
        self.extent = extent  # replicated (3,) int32 (x, y, z)
        self.axis = axis  # mesh axis name (static)
        # "bfloat16" halves the per-tap all-reduce payload over ICI at the
        # cost of ~2^-8 relative drift on trilinear taps (integer taps stay
        # exact: the dense field is bf16, so a single owner's value
        # round-trips). Off by default to preserve bit-identity.
        self.tap_dtype = tap_dtype

    def tree_flatten(self):
        return (self.dense_local, self.maj_mips, self.extent), (
            self.axis, self.tap_dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, axis=aux[0], tap_dtype=aux[1])


SLAB_HALO = 2  # dilation half-width (brick.rs:101-103)


def _slab_z0(grid: SlabGrid):
    slab_z = grid.dense_local.shape[0] - 2 * SLAB_HALO
    return jax.lax.axis_index(grid.axis) * slab_z, slab_z


def _slab_local_tap(grid: SlabGrid, z0, iipos):
    """Tap the local halo'd slab at global integer coords (OOB -> 0.0).

    Matches the replicated dense tap bitwise: same extent clip, same
    inside mask, same bf16 -> f32 conversion. Caller masks by ownership.
    """
    inside = jnp.all((iipos >= 0) & (iipos < grid.extent), axis=-1)
    ip = jnp.clip(iipos, 0, grid.extent - 1)
    lz = ip[..., 2] - z0 + SLAB_HALO
    lz = jnp.clip(lz, 0, grid.dense_local.shape[0] - 1)
    value = grid.dense_local[lz, ip[..., 1], ip[..., 0]].astype(jnp.float32)
    return jnp.where(inside, value, 0.0)


def _slab_psum(grid: SlabGrid, masked):
    """All-reduce an owner-masked per-lane tap over the slab axis, in
    f32 (default, bit-identical) or bf16 (opt-in, half the ICI bytes)."""
    if grid.tap_dtype == "bfloat16":
        return jax.lax.psum(
            masked.astype(jnp.bfloat16), grid.axis
        ).astype(jnp.float32)
    return jax.lax.psum(masked, grid.axis)


def _slab_density_int(grid: SlabGrid, iipos):
    """Sharded single-tap lookup: owner = device whose slab holds the tap z."""
    z0, slab_z = _slab_z0(grid)
    z = iipos[..., 2]
    own = (z >= z0) & (z < z0 + slab_z)
    value = _slab_local_tap(grid, z0, iipos)
    return _slab_psum(grid, jnp.where(own, value, 0.0))


def _slab_density_trilinear(grid: SlabGrid, params: "VolumeParams", ipos):
    """Sharded trilinear: the device owning the (clipped) stencil base z
    computes the whole 8-tap stencil from its halo'd slab (taps reach at
    most base+1 — inside the halo), then one psum. Identical accumulation
    order to the replicated path -> bit-identical results."""
    z0, slab_z = _slab_z0(grid)
    p = ipos - 0.5
    base = jnp.floor(p).astype(jnp.int32)
    base_zc = jnp.clip(base[..., 2], 0, grid.extent[2] - 1)
    own = (base_zc >= z0) & (base_zc < z0 + slab_z)
    acc = _trilinear_acc(
        ipos, lambda tap: _slab_local_tap(grid, z0, tap)
    )
    return params.density_scale * _slab_psum(grid, jnp.where(own, acc, 0.0))


class VolumeParams(NamedTuple):
    """Per-frame volume uniforms (viewer.ts bindUniforms, :1295-1357)."""

    aabb_lo: jax.Array  # (3,) world-space clipped AABB
    aabb_hi: jax.Array  # (3,)
    transform_inv: jax.Array  # (4, 4) world -> index
    vol_min: jax.Array  # scalar: minorant * density_scale * multiplier
    vol_maj: jax.Array  # scalar majorant (same scaling)
    inv_maj: jax.Array  # 1 / vol_maj
    density_scale: jax.Array  # density_scale * multiplier
    albedo: jax.Array  # (3,) — 0.9 constant in the reference
    phase_g: jax.Array  # scalar — 0 in the reference
    sample_range: jax.Array  # (2,)


def world_to_index_point(params: VolumeParams, p):
    m = params.transform_inv
    return p @ m[:3, :3].T + m[:3, 3]


def world_to_index_dir(params: VolumeParams, d):
    return d @ params.transform_inv[:3, :3].T


# -- raw voxel lookups ---------------------------------------------------------


def lookup_density_brick_int(grid, iipos):
    """Decoded density at integer voxel coords (common.glsl:36-43).

    iipos: (..., 3) int32 in (x, y, z) order. OOB taps return 0.0.
    Uses the pre-decoded dense field (one gather) when present; for a
    SlabGrid the tap is answered by the owning device + psum.
    """
    if isinstance(grid, SlabGrid):
        return _slab_density_int(grid, iipos)
    inside = jnp.all((iipos >= 0) & (iipos < grid.extent), axis=-1)
    ip = jnp.clip(iipos, 0, grid.extent - 1)
    if grid.dense is not None:
        value = grid.dense[ip[..., 2], ip[..., 1], ip[..., 0]].astype(jnp.float32)
        return jnp.where(inside, value, 0.0)
    bxc = ip[..., 0] >> 3
    byc = ip[..., 1] >> 3
    bzc = ip[..., 2] >> 3
    lo = grid.range_lo[bzc, byc, bxc]
    hi = grid.range_hi[bzc, byc, bxc]
    ptr = grid.ptr[bzc, byc, bxc]  # (..., 3)
    ax = (ptr[..., 0] << 3) + (ip[..., 0] & 7)
    ay = (ptr[..., 1] << 3) + (ip[..., 1] & 7)
    az = (ptr[..., 2] << 3) + (ip[..., 2] & 7)
    raw = grid.atlas[az, ay, ax].astype(jnp.float32)
    value = lo + raw * jnp.float32(1.0 / 255.0) * (hi - lo)
    return jnp.where(inside, value, 0.0)


def _majorant_coords(grid, ipos):
    """Brick coordinates of a majorant tap — shared by the raw and
    premultiplied pyramid lookups so both gather the identical texel."""
    ip = jnp.floor(ipos).astype(jnp.int32)
    ip = jnp.clip(ip, 0, grid.extent - 1)
    return ip[..., 0] >> 3, ip[..., 1] >> 3, ip[..., 2] >> 3


def lookup_majorant(grid: DeviceGrid, params: VolumeParams, ipos, mip):
    """Scaled brick majorant at a traced mip level (common.glsl:50-53).

    mip: (...,) int32 in [0, 3]. One gather thanks to the stacked pyramid.
    """
    bxc, byc, bzc = _majorant_coords(grid, ipos)
    # astype is a no-op for the default f32 pyramid; for the opt-in bf16
    # pyramid it converts after the (now half-width) gather
    return params.density_scale * grid.maj_mips[mip, bzc, byc, bxc].astype(
        jnp.float32
    )


def _compact_pyramid_dims(shape):
    """Static per-level dims of the compact pyramid for a stacked
    (4, bz, by, bx) pyramid: level m keeps every 2^m-th texel (the
    stacked layout is a nearest-upsample, so slicing recovers the
    pooled level exactly). Returns (dims, offsets): dims[m] = (cz, cy,
    cx), offsets[m] = flat start of level m."""
    _, bz, by, bx = shape
    dims, offsets, off = [], [], 0
    for m in range(4):
        s = 1 << m
        cz, cy, cx = -(-bz // s), -(-by // s), -(-bx // s)
        dims.append((cz, cy, cx))
        offsets.append(off)
        off += cz * cy * cx
    return dims, offsets


def pack_premul_pyramid(
    maj_alpha: jax.Array, dtype: str | None = None
) -> jax.Array:
    """Stacked (4, bz, by, bx) premul pyramid -> MXU-gather byte planes
    of the compact level-major flattening (values bit-equal: slicing a
    nearest-upsampled level recovers the pooled level exactly). dtype
    "int8" forces the integer packing (render.pyrmarch's in-kernel
    march); None resolves the backend-preferred packing."""
    from volxel_tpu.render.mxu_gather import pack_gather_table

    levels = [
        maj_alpha[m, :: 1 << m, :: 1 << m, :: 1 << m].reshape(-1) for m in range(4)
    ]
    return pack_gather_table(jnp.concatenate(levels), dtype)


def _sel4(m, vals):
    """Per-lane select of one of 4 static ints by mip — where-chain, not a
    gather (a 4-entry table gather would serialize like any other)."""
    return jnp.where(
        m <= 1,
        jnp.where(m == 0, vals[0], vals[1]),
        jnp.where(m == 2, vals[2], vals[3]),
    )


def lookup_majorant_premul(grid, ipos, mip):
    """Fully-scaled DDA step majorant from the premultiplied alpha pyramid
    (grid.maj_alpha): one gather replaces pyramid gather + transfer-LUT
    gather + the per-step scaling arithmetic. With grid.maj_mxu present
    the gather itself runs as a one-hot MXU matmul (render.mxu_gather —
    bit-equal values, ~Nx faster than XLA's serialized gather for
    VMEM-small pyramids)."""
    bxc, byc, bzc = _majorant_coords(grid, ipos)
    if getattr(grid, "maj_mxu", None) is not None:
        from volxel_tpu.render.mxu_gather import mxu_gather_f32

        dims, offsets = _compact_pyramid_dims(grid.maj_alpha.shape)
        cx = [d[2] for d in dims]
        cyx = [d[1] * d[2] for d in dims]
        idx = (
            _sel4(mip, offsets)
            + (bzc >> mip) * _sel4(mip, cyx)
            + (byc >> mip) * _sel4(mip, cx)
            + (bxc >> mip)
        )
        return mxu_gather_f32(grid.maj_mxu, idx)
    return grid.maj_alpha[mip, bzc, byc, bxc]


def lookup_density(grid: DeviceGrid, params: VolumeParams, ipos):
    """Nearest-neighbor scaled density (common.glsl:56-58)."""
    iipos = jnp.floor(ipos).astype(jnp.int32)
    return params.density_scale * lookup_density_brick_int(grid, iipos)


def _trilinear_acc(ipos, tap_fn):
    """8-tap trilinear accumulation; shared by the replicated and slab
    paths so both execute the identical op sequence (bit-parity)."""
    p = ipos - 0.5
    base = jnp.floor(p).astype(jnp.int32)
    f = p - base
    acc = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                tap = tap_fn(base + jnp.array([dx, dy, dz], jnp.int32))
                w = (
                    (f[..., 0] if dx else 1 - f[..., 0])
                    * (f[..., 1] if dy else 1 - f[..., 1])
                    * (f[..., 2] if dz else 1 - f[..., 2])
                )
                acc = acc + tap * w
    return acc


def pack_dense_pairs(dense: jax.Array) -> jax.Array:
    """(Z, Y, X) bf16 -> (Z, Y, X) uint32 x-pair packing (see
    DeviceGrid.dense_pair). Pure elementwise — built once at load."""
    bits = jax.lax.bitcast_convert_type(dense, jnp.uint16).astype(jnp.uint32)
    shifted = jnp.concatenate([bits[:, :, 1:], bits[:, :, -1:]], axis=2)
    return bits | (shifted << jnp.uint32(16))


def _pair_halves(pair: jax.Array):
    """uint32 x-pair -> (f32 low tap, f32 high tap), bit-equal to the
    dense field's bf16 values cast to f32."""
    lo = jax.lax.bitcast_convert_type(
        (pair & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.bfloat16
    )
    hi = jax.lax.bitcast_convert_type(
        (pair >> jnp.uint32(16)).astype(jnp.uint16), jnp.bfloat16
    )
    return lo.astype(jnp.float32), hi.astype(jnp.float32)


def pack_dense_quads(dense: jax.Array) -> jax.Array:
    """(Z, Y, X) bf16 -> (Z, Y, X) complex64 xy-quad packing (see
    DeviceGrid.dense_quad). Pure elementwise — built once at load.

    complex64 is TPU's only native 8-byte element, so gathering one
    fetches all four xy-plane taps in a single access: real bits carry
    the row-y x-pair, imag bits the row-(y+1) x-pair (both x and y
    shifted copies clamp at the high edge, mirroring pack_dense_pairs)."""
    pairs = pack_dense_pairs(dense)
    pairs_y1 = jnp.concatenate([pairs[:, 1:], pairs[:, -1:]], axis=1)
    return jax.lax.complex(
        jax.lax.bitcast_convert_type(pairs, jnp.float32),
        jax.lax.bitcast_convert_type(pairs_y1, jnp.float32),
    )


def _trilinear_quad(grid, params: VolumeParams, ipos):
    """lookup_density_trilinear via dense_quad: 2 quad gathers for the 8
    taps, with the exact tap values and accumulation order of
    _trilinear_acc (bit-identical — pinned by
    tests/test_render.py::test_quad_decode_bit_identical)."""
    ext = grid.extent
    p = ipos - 0.5
    base = jnp.floor(p).astype(jnp.int32)
    f = p - base
    acc = 0.0
    ux0 = base[..., 0]
    uy0 = base[..., 1]
    vx = jnp.clip(ux0, 0, ext[0] - 1)
    vy = jnp.clip(uy0, 0, ext[1] - 1)
    in_x0 = (ux0 >= 0) & (ux0 < ext[0])
    in_x1 = (ux0 + 1 >= 0) & (ux0 + 1 < ext[0])
    in_y0 = (uy0 >= 0) & (uy0 < ext[1])
    in_y1 = (uy0 + 1 >= 0) & (uy0 + 1 < ext[1])
    # when the base column/row is below the volume, clip maps BOTH taps
    # of that axis to index 0, whose value lives in the LOW half / the
    # row-y (real) half respectively
    x1_low = ux0 < 0
    y1_low = uy0 < 0
    wx0, wx1 = 1 - f[..., 0], f[..., 0]
    wy0, wy1 = 1 - f[..., 1], f[..., 1]
    for dz in (0, 1):
        uz = base[..., 2] + dz
        vz = jnp.clip(uz, 0, ext[2] - 1)
        in_z = (uz >= 0) & (uz < ext[2])
        q = grid.dense_quad[vz, vy, vx]
        r0, r1 = _pair_halves(
            jax.lax.bitcast_convert_type(jnp.real(q), jnp.uint32)
        )
        s0, s1 = _pair_halves(
            jax.lax.bitcast_convert_type(jnp.imag(q), jnp.uint32)
        )
        # row-(y+1) taps fall back to the row-y halves when the clip
        # aliased both rows to row 0
        u0 = jnp.where(y1_low, r0, s0)
        u1 = jnp.where(y1_low, r1, s1)
        t00 = jnp.where(in_z & in_y0 & in_x0, r0, 0.0)
        t01 = jnp.where(in_z & in_y0 & in_x1, jnp.where(x1_low, r0, r1), 0.0)
        t10 = jnp.where(in_z & in_y1 & in_x0, u0, 0.0)
        t11 = jnp.where(in_z & in_y1 & in_x1, jnp.where(x1_low, u0, u1), 0.0)
        # identical per-tap w expression and accumulation order as
        # _trilinear_acc: w = ((wx) * (wy)) * (wz), dx innermost
        wz = f[..., 2] if dz else 1 - f[..., 2]
        acc = acc + t00 * ((wx0 * wy0) * wz)
        acc = acc + t01 * ((wx1 * wy0) * wz)
        acc = acc + t10 * ((wx0 * wy1) * wz)
        acc = acc + t11 * ((wx1 * wy1) * wz)
    return params.density_scale * acc


def pack_dense_octo(dense: jax.Array) -> jax.Array:
    """(Z, Y, X) bf16 -> (Z, Y, X, 4) uint32 full-stencil packing (see
    DeviceGrid.dense_octo). Pure elementwise — built once at load."""
    pairs = pack_dense_pairs(dense)
    pairs_y1 = jnp.concatenate([pairs[:, 1:], pairs[:, -1:]], axis=1)
    z0 = jnp.stack([pairs, pairs_y1], axis=-1)  # (Z, Y, X, 2)
    z1 = jnp.concatenate([z0[1:], z0[-1:]], axis=0)
    return jnp.concatenate([z0, z1], axis=-1)  # channels: y0, y1 @ z, z+1


def _trilinear_octo(grid, params: VolumeParams, ipos):
    """lookup_density_trilinear via dense_octo: ONE row gather for the 8
    taps, with the exact tap values and accumulation order of
    _trilinear_acc (bit-identical — pinned by
    tests/test_render.py::test_octo_decode_bit_identical)."""
    ext = grid.extent
    p = ipos - 0.5
    base = jnp.floor(p).astype(jnp.int32)
    f = p - base
    ux0, uy0, uz0 = base[..., 0], base[..., 1], base[..., 2]
    vx = jnp.clip(ux0, 0, ext[0] - 1)
    vy = jnp.clip(uy0, 0, ext[1] - 1)
    vz = jnp.clip(uz0, 0, ext[2] - 1)
    in_x = ((ux0 >= 0) & (ux0 < ext[0]), (ux0 + 1 >= 0) & (ux0 + 1 < ext[0]))
    in_y = ((uy0 >= 0) & (uy0 < ext[1]), (uy0 + 1 >= 0) & (uy0 + 1 < ext[1]))
    in_z = ((uz0 >= 0) & (uz0 < ext[2]), (uz0 + 1 >= 0) & (uz0 + 1 < ext[2]))
    # when a base coordinate is below the volume, clip maps BOTH taps of
    # that axis to index 0 — the +1 tap's value is then the LOW half /
    # the dy=0 channel / the dz=0 channel respectively
    x1_low = ux0 < 0
    y1_low = uy0 < 0
    z1_low = uz0 < 0
    q = grid.dense_octo[vz, vy, vx]  # (..., 4) uint32
    lohi = [_pair_halves(q[..., c]) for c in range(4)]  # [(x0, x1)] per ch
    wx = (1 - f[..., 0], f[..., 0])
    wy = (1 - f[..., 1], f[..., 1])
    wz = (1 - f[..., 2], f[..., 2])
    acc = 0.0
    for dz in (0, 1):
        cz = jnp.where(z1_low, 0, dz) if dz else 0
        for dy in (0, 1):
            cy = jnp.where(y1_low, 0, dy) if dy else 0
            # per-lane channel select (2*dz' + dy') — a 4-way where
            # chain over the gathered row, not another gather
            c = 2 * cz + cy
            v0 = lohi[0][0]
            v1 = lohi[0][1]
            for ch in (1, 2, 3):
                v0 = jnp.where(c == ch, lohi[ch][0], v0)
                v1 = jnp.where(c == ch, lohi[ch][1], v1)
            for dx in (0, 1):
                tap = jnp.where(x1_low, v0, v1) if dx else v0
                tap = jnp.where(in_z[dz] & in_y[dy] & in_x[dx], tap, 0.0)
                # identical per-tap w expression and accumulation order
                # as _trilinear_acc: w = ((wx) * (wy)) * (wz)
                acc = acc + tap * ((wx[dx] * wy[dy]) * wz[dz])
    return params.density_scale * acc


def _trilinear_pair(grid, params: VolumeParams, ipos):
    """lookup_density_trilinear via dense_pair: 4 pair gathers for the 8
    taps, with the exact tap values and accumulation order of
    _trilinear_acc (bit-identical — pinned by
    tests/test_render.py::test_pair_decode_bit_identical)."""
    ext = grid.extent
    p = ipos - 0.5
    base = jnp.floor(p).astype(jnp.int32)
    f = p - base
    acc = 0.0
    ux0 = base[..., 0]
    ux1 = ux0 + 1
    vx = jnp.clip(ux0, 0, ext[0] - 1)
    in_x0 = (ux0 >= 0) & (ux0 < ext[0])
    in_x1 = (ux1 >= 0) & (ux1 < ext[0])
    # when the base column is left of the volume, clip maps BOTH taps to
    # column 0, whose value is the pair's LOW half
    x1_low = ux0 < 0
    for dz in (0, 1):
        for dy in (0, 1):
            uy = base[..., 1] + dy
            uz = base[..., 2] + dz
            vy = jnp.clip(uy, 0, ext[1] - 1)
            vz = jnp.clip(uz, 0, ext[2] - 1)
            in_zy = (uy >= 0) & (uy < ext[1]) & (uz >= 0) & (uz < ext[2])
            v0, v1 = _pair_halves(grid.dense_pair[vz, vy, vx])
            t0 = jnp.where(in_zy & in_x0, v0, 0.0)
            t1 = jnp.where(in_zy & in_x1, jnp.where(x1_low, v0, v1), 0.0)
            # identical per-tap w expression and accumulation order as
            # _trilinear_acc: w = ((wx) * (wy)) * (wz), dx innermost
            acc = acc + t0 * (
                ((1 - f[..., 0]) * (f[..., 1] if dy else 1 - f[..., 1]))
                * (f[..., 2] if dz else 1 - f[..., 2])
            )
            acc = acc + t1 * (
                (f[..., 0] * (f[..., 1] if dy else 1 - f[..., 1]))
                * (f[..., 2] if dz else 1 - f[..., 2])
            )
    return params.density_scale * acc


def lookup_density_trilinear(grid, params: VolumeParams, ipos):
    """Trilinear filtered scaled density (common.glsl:61-69)."""
    if isinstance(grid, SlabGrid):
        return _slab_density_trilinear(grid, params, ipos)
    if getattr(grid, "dense_octo", None) is not None:
        return _trilinear_octo(grid, params, ipos)
    if getattr(grid, "dense_quad", None) is not None:
        return _trilinear_quad(grid, params, ipos)
    if getattr(grid, "dense_pair", None) is not None:
        return _trilinear_pair(grid, params, ipos)
    acc = _trilinear_acc(ipos, lambda tap: lookup_density_brick_int(grid, tap))
    return params.density_scale * acc


def stochastic_tricubic_offsets(ipos, state, mask=None):
    """Weighted-reservoir tricubic tap selection (common.glsl:9-32).

    Returns (state, iipos (...,3) int32) — the chosen tap location. With
    `mask`, lanes where it is False do not consume their rng3 draws
    (reference draw-protocol parity: the GLSL only evaluates the filter on
    live marching steps).
    """
    p = ipos - 0.5
    iipos = jnp.floor(p).astype(jnp.int32)
    t = p - iipos
    t2 = t * t
    t3 = t * t2
    w0 = (1.0 / 6.0) * (-t3 + 3.0 * t2 - 3.0 * t + 1.0)
    w1 = (1.0 / 6.0) * (3.0 * t3 - 6.0 * t2 + 4.0)
    w2 = (1.0 / 6.0) * (-3.0 * t3 + 3.0 * t2 + 3.0 * t + 1.0)
    w3 = (1.0 / 6.0) * t3
    sum_w = w0
    idx = jnp.zeros_like(iipos)
    for tap, w in ((1, w1), (2, w2), (3, w3)):
        sum_w = sum_w + w
        if mask is None:
            state, r = rng3(state)
        else:
            state, r = rng3_where(mask, state)
        take = r < w / jnp.maximum(1e-3, sum_w)
        idx = jnp.where(take, tap, idx)
    return state, iipos + idx - 1


def lookup_density_stochastic(
    grid: DeviceGrid, params: VolumeParams, ipos, state, mask=None
):
    """Stochastic tricubic density (common.glsl:71-76)."""
    state, tap = stochastic_tricubic_offsets(ipos, state, mask)
    return state, params.density_scale * lookup_density_brick_int(grid, tap)


# -- transfer function ---------------------------------------------------------


def lookup_transfer(lut: jax.Array, sample_range, density, mxu=None):
    """NEAREST LUT sample with range rejection (common.glsl:78-83).

    lut: (K, 4). density: (...,) normalized by the majorant. Returns (..., 4).
    `mxu`: optional MXU-gather packing of lut (bit-equal values).
    """
    k = lut.shape[0]
    rejected = (density < sample_range[0]) | (density > sample_range[1])
    idx = jnp.clip(jnp.floor(density * k).astype(jnp.int32), 0, k - 1)
    if mxu is not None:
        from volxel_tpu.render.mxu_gather import mxu_gather_f32

        rgba = mxu_gather_f32(mxu, idx[..., None] * 4 + jnp.arange(4, dtype=jnp.int32))
    else:
        rgba = lut[idx]
    return jnp.where(rejected[..., None], 0.0, rgba)
