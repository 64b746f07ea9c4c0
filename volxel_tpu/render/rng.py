"""Counter-based per-ray RNG: TEA seeding + xoshiro128++ streams.

Same generator family as the reference (shaders/random.glsl:41-94): each
ray derives a 32-bit seed with the tiny encryption algorithm from
(pixel index, frame index), expands it to a 128-bit xoshiro128++ state with
Wang hashes, and draws 24-bit-mantissa floats in [0, 1).

Everything is vectorized over a leading ray axis as pure uint32 VPU ops —
far cheaper per draw than threefry, and statistically adequate for MC
integration (xoshiro128++ passes BigCrush). State is explicit: functions
take and return `(state, value)`.
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def _rotl(x, k: int):
    return (x << _U32(k)) | (x >> _U32(32 - k))


def tea(val0, val1, rounds: int = 32):
    """TEA hash of two uint32 streams (random.glsl:41-51)."""
    v0 = jnp.asarray(val0, _U32)
    v1 = jnp.asarray(val1, _U32)
    s0 = _U32(0)
    for _ in range(rounds):
        s0 = s0 + _U32(0x9E3779B9)
        v0 = v0 + (((v1 << _U32(4)) + _U32(0xA341316C)) ^ (v1 + s0) ^ ((v1 >> _U32(5)) + _U32(0xC8013EA4)))
        v1 = v1 + (((v0 << _U32(4)) + _U32(0xAD90777D)) ^ (v0 + s0) ^ ((v0 >> _U32(5)) + _U32(0x7E95761E)))
    return v0


def wang_hash(x):
    """Thomas Wang integer hash (random.glsl:59-67)."""
    x = jnp.asarray(x, _U32)
    x = (x ^ _U32(61)) ^ (x >> _U32(16))
    x = x * _U32(9)
    x = x ^ (x >> _U32(4))
    x = x * _U32(0x27D4EB2D)
    x = x ^ (x >> _U32(15))
    return x


def seed_xoshiro(seed):
    """Expand uint32 seeds (...,) to xoshiro states (..., 4) (random.glsl:69-76)."""
    seed = jnp.asarray(seed, _U32)
    return jnp.stack(
        [wang_hash(seed + _U32(i)) for i in range(4)],
        axis=-1,
    )


def next_u32(state):
    """xoshiro128++ step (random.glsl:80-94): (state) -> (state', uint32)."""
    s0, s1, s2, s3 = state[..., 0], state[..., 1], state[..., 2], state[..., 3]
    result = _rotl(s0 + s2, 7) + s0
    t = s1 << _U32(9)
    s2 = s2 ^ s0
    s3 = s3 ^ s1
    s1 = s1 ^ s2
    s0 = s0 ^ s3
    s2 = s2 ^ t
    s3 = _rotl(s3, 11)
    return jnp.stack([s0, s1, s2, s3], axis=-1), result


def rng(state):
    """Draw float32 in [0, 1) from the top 24 bits (random.glsl:103-106)."""
    state, r = next_u32(state)
    return state, (r >> _U32(8)).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def rng2(state):
    state, a = rng(state)
    state, b = rng(state)
    return state, jnp.stack([a, b], axis=-1)


def rng3(state):
    state, a = rng(state)
    state, b = rng(state)
    state, c = rng(state)
    return state, jnp.stack([a, b, c], axis=-1)


def rng_where(mask, state):
    """Masked draw: lanes where mask is False do NOT consume the draw.

    The GLSL consumes draws conditionally (inside `if` bodies and after
    early returns — e.g. dda.glsl only draws on collision iterations, and
    skips the tau reset on a real collision). Per-lane stream parity with
    the reference therefore requires conditional consumption, not just
    conditional use; tests/test_parity_oracle.py pins this against the
    scalar GLSL oracle. The returned value is meaningful only where mask
    is True.
    """
    state2, x = rng(state)
    return jnp.where(mask[..., None], state2, state), x


def rng2_where(mask, state):
    state2, x = rng2(state)
    return jnp.where(mask[..., None], state2, state), x


def rng3_where(mask, state):
    state2, x = rng3(state)
    return jnp.where(mask[..., None], state2, state), x


def seed_rays(pixel_index, frame_index):
    """Per-ray state from pixel index + frame (fragment.frag:143-144)."""
    seed = tea(_U32(42) * jnp.asarray(pixel_index, _U32), jnp.asarray(frame_index, _U32))
    return seed_xoshiro(seed)
