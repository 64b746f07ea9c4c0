"""On-chip probe: MXU one-hot gather vs XLA serial gather, plus a fresh
Mosaic dynamic-gather support sweep (VERDICT r3 item 9 — re-check each
round whether multi-vreg dynamic gather landed).

Honest sync-mode protocol (NOTES.md r5): one tiny fetch first, then
per-program walls; each timed op is chained K times through a fori_loop
inside ONE program so the ~33 ms relay RTT amortizes and the slope is
real execution time.

Usage: python examples/probe_mxu_gather.py [T ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def sync_switch():
    t0 = time.perf_counter()
    float(np.asarray(jax.jit(lambda x: x + 1.0)(jnp.float32(1.0))))
    print(f"sync-mode switch: {time.perf_counter() - t0:.1f}s", flush=True)


def time_program(fn, *args, reps=3):
    fn(*args)  # compile + first run
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        walls.append(time.perf_counter() - t0)
    return min(walls)


def chained(op, k):
    """Chain op k times data-dependently so one program holds k evals."""

    @jax.jit
    def f(idx, table):
        def body(_, carry):
            idx_c, acc = carry
            v = op(table, idx_c)
            # make the next iteration's indices depend on v without
            # changing them (scalar * 0): data dependence defeats CSE,
            # and a scalar broadcasts against any index shape
            vf = v.reshape(-1)[0].astype(jnp.float32)
            return (idx_c + (vf * 0).astype(idx_c.dtype), acc + vf)

        _, acc = jax.lax.fori_loop(0, k, body, (idx, jnp.float32(0.0)))
        return acc

    return f


def probe_mosaic_gather():
    """Does Mosaic now lower per-lane dynamic gathers? (jax 0.9.0)"""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    results = {}

    def try_kernel(name, kernel, out_shape, *args):
        try:
            got = pl.pallas_call(
                kernel,
                out_shape=out_shape,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*args)
            jax.block_until_ready(got)
            results[name] = "OK"
        except Exception as e:  # noqa: BLE001
            results[name] = f"{type(e).__name__}: {str(e)[:140]}"

    table = jnp.arange(4096 * 128, dtype=jnp.float32).reshape(4096, 128)
    idx_rows = jnp.ones((8, 128), jnp.int32) * 777

    def k_taa_axis0(t_ref, i_ref, o_ref):
        # per-lane row gather across 4096 rows (multi-vreg along axis 0)
        o_ref[:] = jnp.take_along_axis(t_ref[:, :128][:8 * 512].reshape(8, -1),
                                       i_ref[:], axis=1)

    def k_flat_index(t_ref, i_ref, o_ref):
        flat = t_ref[:].reshape(-1)
        o_ref[:] = flat[i_ref[:]]

    def k_taa_multivreg(t_ref, i_ref, o_ref):
        # gather along a 4096-wide lane dim (32 vregs)
        tt = t_ref[:].reshape(128, 4096)
        ii = jnp.broadcast_to(i_ref[:].reshape(8, 128)[:1, :], (128, 128))
        o_ref[:] = jnp.take_along_axis(tt, ii, axis=1)[:8, :]

    try_kernel("flat_index table[idx]", k_flat_index,
               jax.ShapeDtypeStruct((8, 128), jnp.float32), table, idx_rows)
    try_kernel("taa multi-vreg lanes", k_taa_multivreg,
               jax.ShapeDtypeStruct((8, 128), jnp.float32), table, idx_rows)
    try_kernel("taa 512-wide rows", k_taa_axis0,
               jax.ShapeDtypeStruct((8, 128), jnp.float32), table,
               jnp.ones((8, 512), jnp.int32)[:, :128] * 3)
    for name, r in results.items():
        print(f"  mosaic {name}: {r}", flush=True)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [37376, 299520]
    print(f"backend: {jax.default_backend()} {jax.devices()}", flush=True)
    if jax.default_backend() != "tpu":
        print("chip-only probe (Mosaic lowering + MXU timing); exiting", flush=True)
        return
    sync_switch()
    print("--- Mosaic dynamic-gather probe ---", flush=True)
    probe_mosaic_gather()

    from volxel_tpu.render.mxu_gather import mxu_gather_f32, pack_gather_table

    n = 131072
    k = 16
    rng = np.random.default_rng(0)
    for t_sz in sizes:
        flat = jnp.asarray(rng.standard_normal(t_sz).astype(np.float32))
        packed = jax.jit(pack_gather_table)(flat)
        idx = jnp.asarray(rng.integers(0, t_sz, size=n).astype(np.int32))
        # coherent variant: sorted indices (march locality stand-in)
        idx_sorted = jnp.sort(idx)

        def xla_op(table, i):
            return table[i]

        def xla_sorted_hint(table, i):
            return jnp.take(table, i, indices_are_sorted=True)

        def mxu_op(table, i, _b=1024):
            return mxu_gather_f32(table, i, block=_b)

        jax.block_until_ready((flat, packed, idx))

        # correctness on hardware first
        got = mxu_gather_f32(packed, idx[:4096])
        want = flat[idx[:4096]]
        eq = np.asarray(got).view(np.uint32) == np.asarray(want).view(np.uint32)
        print(f"T={t_sz}: hw bit-exact: {bool(eq.all())}", flush=True)

        base = time_program(chained(lambda t, i: t[i] * 0.0 + 1.0, k),
                            idx, jnp.zeros((8, 128)))  # loop+rtt floor
        side = round(t_sz ** (1 / 3))
        cube = jnp.asarray(
            rng.standard_normal((side, side, side)).astype(np.float32)
        )
        iz = jnp.asarray(rng.integers(0, side, size=(3, n)).astype(np.int32))

        def xla_3d(table, i):
            return table[i[0], i[1], i[2]]

        def xla_3d_flat(table, i):
            return table.reshape(-1)[(i[0] * side + i[1]) * side + i[2]]

        for name, op, table, ii in [
            ("xla gather", xla_op, flat, idx),
            ("xla gather sorted-data", xla_op, flat, idx_sorted),
            ("xla gather sorted-hint", xla_sorted_hint, flat, idx_sorted),
            ("xla gather bf16", xla_op, flat.astype(jnp.bfloat16), idx),
            ("xla 3d-index", xla_3d, cube, iz),
            ("xla 3d-flattened", xla_3d_flat, cube, iz),
            ("mxu b1024", lambda t, i: mxu_op(t, i, 1024), packed, idx),
            ("mxu b512", lambda t, i: mxu_op(t, i, 512), packed, idx),
            ("mxu b2048", lambda t, i: mxu_op(t, i, 2048), packed, idx),
        ]:
            try:
                w = time_program(chained(op, k), ii, table)
                print(
                    f"T={t_sz} {name}: {(w - base) / k * 1e3:.3f} ms/eval "
                    f"(program {w:.3f}s, floor {base:.3f}s)",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(f"T={t_sz} {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)


if __name__ == "__main__":
    main()
