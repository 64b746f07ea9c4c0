"""Probe: does an XLA (2,2,2)-slice gather beat 8 element gathers?

The collision decode's trilinear is 8 per-lane element gathers (real cost
4.2x one tap — adjacent taps cache, NOTES.md r5 profile). XLA gather
supports multi-element slice_sizes; if vmap(dynamic_slice (2,2,2)) lowers
to ONE latency-bound access per lane, the decode drops from 9 gathers to
2 (cell + LUT) at the price of a +1 zero-padded dense field. Also probes
(1,1,2) pair-slices (4 gathers) as the fallback shape.

Protocol: NOTES.md ROUND-5 DISCOVERY (tiny fetch first; K-chained fori so
the ~33 ms RTT floor amortizes; subtract it anyway).
"""

from __future__ import annotations

import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def trivial(x):
        return x + 1.0

    trivial(jnp.float32(1.0)).block_until_ready()
    t0 = time.perf_counter()
    float(np.asarray(trivial(jnp.float32(41.0))))
    print(f"fetch (sync-mode switch): {time.perf_counter() - t0:.1f} s", flush=True)

    D, n, K = 256, 16200, 16
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.standard_normal((D, D, D)).astype(np.float32))
    # coherent-ish indices (march locality): random base + small walk
    base = rng.integers(0, D - 2, (n, 3)).astype(np.int32)
    idx0 = jnp.asarray(base)

    def timed(tag, fn, reps=3):
        fn().block_until_ready()
        xs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn().block_until_ready()
            xs.append(time.perf_counter() - t0)
        med = float(np.median(xs))
        print(
            f"  {tag}: {[round(x, 3) for x in xs]} s  "
            f"(~{(med - 0.033) / K * 1e3:.2f} ms/eval)",
            flush=True,
        )

    @jax.jit
    def taps8(i0):
        def body(k, carry):
            i, acc = carry
            s = jnp.float32(0.0)
            for dz in (0, 1):
                for dy in (0, 1):
                    for dx in (0, 1):
                        s = s + dense[
                            i[:, 2] + dz, i[:, 1] + dy, i[:, 0] + dx
                        ]
            return (i + 3) % (D - 2), acc + s
        return jax.lax.fori_loop(0, K, body, (i0, jnp.zeros((n,), jnp.float32)))[1]

    @jax.jit
    def slice222(i0):
        def one(s):
            return jax.lax.dynamic_slice(dense, (s[2], s[1], s[0]), (2, 2, 2))
        def body(k, carry):
            i, acc = carry
            cell = jax.vmap(one)(i)  # (n,2,2,2)
            return (i + 3) % (D - 2), acc + cell.sum(axis=(1, 2, 3))
        return jax.lax.fori_loop(0, K, body, (i0, jnp.zeros((n,), jnp.float32)))[1]

    @jax.jit
    def slice112(i0):
        def one(s):
            return jax.lax.dynamic_slice(dense, (s[2], s[1], s[0]), (1, 1, 2))
        def body(k, carry):
            i, acc = carry
            s = jnp.float32(0.0)
            for dz in (0, 1):
                for dy in (0, 1):
                    off = jnp.stack(
                        [i[:, 0], i[:, 1] + dy, i[:, 2] + dz], axis=1
                    )
                    s = s + jax.vmap(one)(off).sum(axis=(1, 2, 3))
            return (i + 3) % (D - 2), acc + s
        return jax.lax.fori_loop(0, K, body, (i0, jnp.zeros((n,), jnp.float32)))[1]

    @jax.jit
    def tap1(i0):
        def body(k, carry):
            i, acc = carry
            return (i + 3) % (D - 2), acc + dense[i[:, 2], i[:, 1], i[:, 0]]
        return jax.lax.fori_loop(0, K, body, (i0, jnp.zeros((n,), jnp.float32)))[1]

    for tag, fn in (
        ("1 element gather ", tap1),
        ("8 element gathers", taps8),
        ("4 x (1,1,2) slice", slice112),
        ("1 x (2,2,2) slice", slice222),
    ):
        timed(tag, lambda fn=fn: fn(idx0))

    # equality sanity
    a = np.asarray(taps8(idx0))
    b = np.asarray(slice222(idx0))
    print("  slice222 == taps8:", bool(np.allclose(a, b)), flush=True)


if __name__ == "__main__":
    main()
