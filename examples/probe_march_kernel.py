"""Probe: can the whole DDA phase-1 march live INSIDE one Pallas kernel?

Round-9 context: the per-iteration MXU one-hot gather (render.mxu_gather
wired into the XLA while_loop body) measured a LOSS (+5.3%,
examples/ab_mxu.py) — the pallas_call dispatch + HBM round trips per
march iteration cost more than the serialized gather it replaced. The
structural fix is to amortize: run the march LOOP inside the kernel with
the packed pyramid resident in VMEM, one one-hot MXU gather per step, no
per-step dispatch.

This probe answers, on hardware:
  1. LEGALITY — does Mosaic lower a fori/while loop whose body does
     iota-compare one-hot + int8 MXU dot + take_along_axis, with the
     loop-carried per-lane state feeding the next step's indices?
  2. COST — ns per lane-step vs the XLA serial-gather march shape
     (fori_loop over K steps of `table[idx]` + state update), at
     render-like widths (129600 lanes) and pyramid-like table sizes
     (37k entries = 256^3 compact premul pyramid, 300k = 512^3).
  3. LAYOUT — (B,1) lane-column state (the r8 kernel's shape) vs
     (8,128)-tiled state with reshape around the gather.

Protocol: NOTES.md ROUND-5 DISCOVERY — fetch first, then per-program
walls; chained data-dependent steps so nothing folds.

Usage: python examples/probe_march_kernel.py [n_lanes [K [table_size]]]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 129600
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 37000

    @jax.jit
    def trivial(x):
        return x + 1.0

    trivial(jnp.float32(1.0)).block_until_ready()
    t0 = time.perf_counter()
    float(np.asarray(trivial(jnp.float32(41.0))))
    print(f"fetch (sync-mode switch): {time.perf_counter() - t0:.1f} s", flush=True)

    from volxel_tpu.render.mxu_gather import pack_gather_table

    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.random(T).astype(np.float32))
    packed = pack_gather_table(flat, "int8")
    R = packed.shape[0]
    idx0 = jnp.asarray(rng.integers(0, T, n).astype(np.int32))
    acc0 = jnp.zeros((n,), jnp.float32)

    # the march-like step: fetch val = table[idx], accumulate, move to a
    # data-dependent next index (nothing XLA can fold or hoist)
    def next_idx(idx, val):
        return (
            (idx * 1103515245 + jax.lax.bitcast_convert_type(val, jnp.int32))
            & 0x7FFFFFFF
        ) % T

    # ---- arm 1: XLA serial-gather march (the shipped shape) ----
    @jax.jit
    def xla_march(idx, acc):
        def body(_, c):
            idx, acc = c
            val = flat[idx]
            return next_idx(idx, val), acc + val

        return jax.lax.fori_loop(0, K, body, (idx, acc))

    # ---- arm 2: in-kernel march, (B,1) lane-column state ----
    B = 1024

    def kernel_col(idx_ref, table_ref, out_ref):
        rows = table_ref.shape[0]

        def fetch(idx):
            row = idx >> 7
            col = idx & 127
            onehot = (
                row
                == jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], rows), 1)
            ).astype(jnp.int8)
            vals = (
                jax.lax.dot_general(
                    onehot,
                    table_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                + 128
            )
            colb = jnp.broadcast_to(col, (idx.shape[0], 128))

            def plane(p):
                sel = jnp.take_along_axis(
                    vals[:, p * 128 : (p + 1) * 128], colb, axis=1
                )
                return sel[:, :1].astype(jnp.uint32)

            bits = (
                plane(0)
                | (plane(1) << jnp.uint32(8))
                | (plane(2) << jnp.uint32(16))
                | (plane(3) << jnp.uint32(24))
            )
            return jax.lax.bitcast_convert_type(bits, jnp.float32)

        def body(_, c):
            idx, acc = c
            val = fetch(idx)
            return next_idx(idx, val), acc + val

        idx, acc = jax.lax.fori_loop(
            0, K, body, (idx_ref[:], jnp.zeros((B, 1), jnp.float32))
        )
        out_ref[:] = acc

    @functools.partial(jax.jit, static_argnames=())
    def pallas_march_col(idx):
        npad = -(-n // B) * B
        idxp = jnp.zeros((npad,), jnp.int32).at[:n].set(idx)
        out = pl.pallas_call(
            kernel_col,
            out_shape=jax.ShapeDtypeStruct((npad, 1), jnp.float32),
            grid=(npad // B,),
            in_specs=[
                pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (R, packed.shape[1]), lambda i: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            interpret=jax.default_backend() != "tpu",
        )(idxp[:, None], packed)
        return out[:n, 0]

    # ---- timing ----
    def timed(tag, fn, reps=3, k_steps=None):
        try:
            t0 = time.perf_counter()
            r0 = fn()
            jax.block_until_ready(r0)
            print(
                f"  {tag}: compile+first {time.perf_counter() - t0:.1f} s",
                flush=True,
            )
            xs = []
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(fn())
                xs.append(time.perf_counter() - t0)
            med = float(np.median(xs))
            per = med / (n * (k_steps or K)) * 1e9
            print(
                f"  {tag}: {[round(x, 4) for x in xs]} s  "
                f"({per:.2f} ns/lane-step)",
                flush=True,
            )
            return r0
        except Exception as e:  # noqa: BLE001 — legality probe
            print(f"  {tag}: FAILED {type(e).__name__}: {e}", flush=True)
            return None

    print(f"== n={n} K={K} T={T} (R={R})", flush=True)
    ref = timed("xla serial march", lambda: xla_march(idx0, acc0))
    got = timed("pallas in-kernel march (B,1)", lambda: pallas_march_col(idx0))
    if ref is not None and got is not None:
        ok = np.array_equal(np.asarray(ref[1]), np.asarray(got))
        print(f"  bit-equal: {ok}", flush=True)

    # K-scaling: slope isolates per-step cost from dispatch floor
    for k2 in (16, 256):
        K_save = K
        globals()  # noqa: B018
        # rebuild with different K via closure: simplest is re-jit
        # (kernel closes over K through the fori bound)
        print(f"== K={k2} slope check", flush=True)

        @jax.jit
        def xla_march_k(idx, acc, k2=k2):
            def body(_, c):
                i, a = c
                v = flat[i]
                return next_idx(i, v), a + v

            return jax.lax.fori_loop(0, k2, body, (idx, acc))

        timed(f"xla serial march K={k2}",
              lambda f=xla_march_k: f(idx0, acc0), reps=2, k_steps=k2)
        K = K_save


if __name__ == "__main__":
    main()
