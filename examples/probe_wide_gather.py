"""Does XLA TPU price a WIDE-element gather as one access or per 4 bytes?

The r5 profile established gathers are latency-bound per ELEMENT (8-50
ns/elem regardless of table size), and the r9 x-pair packing (4x u32
instead of 8x bf16 for the trilinear taps) won a real -18.4% — so cost is
per ACCESS, not per byte, at least up to 4-byte elements. The next rung:
pack FOUR bf16 taps (the full xy-quad of a trilinear stencil at one z)
into ONE 8-byte element. TPU's only native 8-byte dtype is complex64
(lowered as interleaved f32 pairs); the open question is whether a
complex64 gather costs ~1 access (then the 8-tap decode becomes 2
gathers -> expect another ~-10% on the headline) or 2 (wash vs pair).

Arms (chained data-dependent gathers, k=24 vs k=4 to subtract loop
overhead; 131072 lanes; tables built on device):
  bf16   x1  : the unpacked unit
  u32    x1  : the shipped pair element
  c64    x1  : the candidate quad element
  u32row x2  : (N, 2) table row gather (slice_sizes=(1,2)) — alternative
               8-byte fetch; r7's vmap'd dynamic_slice pair was a wash,
               this probes the gather-with-window lowering instead.

Run in the honest sync mode (tiny fetch first). python -u.
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

    print("== sync-mode switch (tiny fetch)", flush=True)
    trivial(jnp.float32(1.0)).block_until_ready()
    t0 = time.perf_counter()
    float(np.asarray(trivial(jnp.float32(41.0))))
    print(f"   fetch: {time.perf_counter() - t0:.1f} s", flush=True)

    def timed(tag, fn, reps=3):
        try:
            xs = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn().block_until_ready()
                xs.append(time.perf_counter() - t0)
            print(f"   {tag}: {[round(x, 4) for x in xs]} s", flush=True)
            return min(xs)
        except Exception as e:  # noqa: BLE001
            print(f"   {tag}: FAILED {type(e).__name__}: {e}", flush=True)
            return None

    n_lanes = 131072
    rng = np.random.default_rng(0)
    idx0_host = rng.integers(0, 1 << 16, n_lanes).astype(np.int32)

    def make_chain(table_len, k, to_int):
        @jax.jit
        def g(tab, idx0):
            def body(i, idx):
                v = tab[idx]
                return (idx + to_int(v) + 7) % table_len

            return jax.lax.fori_loop(0, k, body, idx0)

        return g

    def run(label, build_tab, to_int, table_len):
        tab = jax.jit(build_tab)()
        tab.block_until_ready()
        i0 = jnp.asarray(idx0_host % table_len)
        g24 = make_chain(table_len, 24, to_int)
        g4 = make_chain(table_len, 4, to_int)
        t24 = timed(f"k=24 {label}", lambda: g24(tab, i0))
        t4 = timed(f"k=4  {label}", lambda: g4(tab, i0))
        if t24 is not None and t4 is not None:
            per = (t24 - t4) / 20.0 * 1000.0
            print(
                f"   -> {label}: {per:.2f} ms/gather "
                f"({per * 1e6 / n_lanes:.1f} ns/elem)",
                flush=True,
            )
        del tab

    for n, nm in ((1 << 24, "16M(256^3)"), ((1 << 27) + 0, "134M(512^3)")):
        print(f"== table {nm}", flush=True)
        run(
            f"bf16 {nm}",
            lambda n=n: (jnp.arange(n, dtype=jnp.int32) % 3).astype(jnp.bfloat16),
            lambda v: v.astype(jnp.int32),
            n,
        )
        run(
            f"u32  {nm}",
            lambda n=n: (jnp.arange(n, dtype=jnp.uint32) % 3),
            lambda v: (v & jnp.uint32(3)).astype(jnp.int32),
            n,
        )
        run(
            f"c64  {nm}",
            lambda n=n: (
                (jnp.arange(n, dtype=jnp.float32) % 3)
                + 1j * (jnp.arange(n, dtype=jnp.float32) % 5)
            ).astype(jnp.complex64),
            lambda v: jnp.real(v).astype(jnp.int32),
            n,
        )
        # (N, 2) row gather: one gather op with a trailing size-2 window
        run(
            f"u32x2row {nm}",
            lambda n=n: jnp.stack(
                [jnp.arange(n, dtype=jnp.uint32) % 3] * 2, axis=1
            ),
            lambda v: (v[..., 0] & jnp.uint32(3)).astype(jnp.int32),
            n,
        )


if __name__ == "__main__":
    main()
