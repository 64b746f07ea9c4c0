"""RNG: bit-exact checks against pure-Python reference implementations."""

import numpy as np

from volxel_tpu.render import rng as vrng

M32 = 0xFFFFFFFF


def _py_tea(v0, v1, rounds=32):
    s0 = 0
    for _ in range(rounds):
        s0 = (s0 + 0x9E3779B9) & M32
        v0 = (
            v0
            + ((((v1 << 4) & M32) + 0xA341316C) ^ ((v1 + s0) & M32) ^ ((v1 >> 5) + 0xC8013EA4))
        ) & M32
        v1 = (
            v1
            + ((((v0 << 4) & M32) + 0xAD90777D) ^ ((v0 + s0) & M32) ^ ((v0 >> 5) + 0x7E95761E))
        ) & M32
    return v0


def _py_wang(x):
    x = ((x ^ 61) ^ (x >> 16)) & M32
    x = (x * 9) & M32
    x = x ^ (x >> 4)
    x = (x * 0x27D4EB2D) & M32
    x = x ^ (x >> 15)
    return x


def _rotl(x, k):
    return ((x << k) | (x >> (32 - k))) & M32


def _py_xoshiro_next(s):
    result = (_rotl((s[0] + s[2]) & M32, 7) + s[0]) & M32
    t = (s[1] << 9) & M32
    s[2] ^= s[0]
    s[3] ^= s[1]
    s[1] ^= s[2]
    s[0] ^= s[3]
    s[2] ^= t
    s[3] = _rotl(s[3], 11)
    return result


def test_tea_matches_reference():
    vals = vrng.tea(np.uint32([0, 1, 42, 123456]), np.uint32([0, 7, 99, 2**31]))
    for i, (a, b) in enumerate([(0, 0), (1, 7), (42, 99), (123456, 2**31)]):
        assert int(vals[i]) == _py_tea(a, b)


def test_wang_hash_matches_reference():
    xs = [0, 1, 2, 1337, 0xDEADBEEF]
    got = vrng.wang_hash(np.uint32(xs))
    for i, x in enumerate(xs):
        assert int(got[i]) == _py_wang(x)


def test_xoshiro_stream_matches_reference():
    seed = 12345
    state = vrng.seed_xoshiro(np.uint32([seed]))
    py_state = [_py_wang(seed + i) for i in range(4)]
    for _ in range(20):
        state, r = vrng.next_u32(state)
        expect = _py_xoshiro_next(py_state)
        assert int(r[0]) == expect


def test_rng_float_range_and_mean():
    state = vrng.seed_xoshiro(np.arange(4096, dtype=np.uint32))
    total = np.zeros(4096, np.float64)
    for _ in range(64):
        state, x = vrng.rng(state)
        x = np.asarray(x)
        assert (x >= 0).all() and (x < 1).all()
        total += x
    mean = total.mean() / 64
    assert abs(mean - 0.5) < 0.01


def test_seed_rays_decorrelated_across_frames():
    s0 = np.asarray(vrng.seed_rays(np.arange(256, dtype=np.uint32), 0))
    s1 = np.asarray(vrng.seed_rays(np.arange(256, dtype=np.uint32), 1))
    assert (s0 != s1).any(axis=-1).all()
