"""REAL profile of the render path, in the tunnel's honest sync mode.

Every number here is true chip execution time (see NOTES.md "ROUND-5
DISCOVERY"): one tiny fetch at start switches the session to synchronous
per-program execution (~33 ms RTT floor per dispatch, subtract mentally);
the matmul-chain control in probe_truth2.py proved this mode times real
work at real speed.

Arms (960x540, 256^3 benchmark scene unless noted):
  gather microbench : per-gather cost at wavefront width vs table size —
                      the core "do XLA TPU gathers serialize?" question
  debug_hits        : ray-gen + box test + env floor (no traversal)
  default b=1       : the 9.6 s baseline
  default b=1 premul: halves march gathers — if ~2x faster, gathers rule
  no_dda b=1        : global-majorant tracking (fewer gathers/step, more
                      steps)
  raymarch b=1      : 64 fixed steps, stochastic tricubic
  default b=2       : trace-loop scaling
  unchunked         : chunking's real effect

Run with python -u. Each arm prints as it completes; a relay execution
deadline (~2 min/program) can fault long arms — order is cheap-first and
every arm is individually guarded.
"""

from __future__ import annotations

import os
import sys as _sys
import time

import numpy as np

_sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_atlas import _build_renderer  # noqa: E402


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

    def timed(tag, fn, reps=2):
        try:
            xs = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn().block_until_ready()
                xs.append(time.perf_counter() - t0)
            print(f"   {tag}: {[round(x, 3) for x in xs]} s", flush=True)
            return min(xs)
        except Exception as e:  # noqa: BLE001
            print(f"   {tag}: FAILED {type(e).__name__}: {e}", flush=True)
            return None

    # ---- gather microbench ----------------------------------------------
    print("== gather microbench (131072 lanes, k=24 chained gathers)", flush=True)
    n_lanes = 131072

    def make_gather(table_len, k):
        @jax.jit
        def g(tab, idx0):
            def body(i, idx):
                v = tab[idx]
                return (idx + v.astype(jnp.int32) + 7) % table_len

            return jax.lax.fori_loop(0, k, body, idx0)

        return g

    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, 128, n_lanes), jnp.int32)
    for table_len, label in (
        (128, "128 (LUT)"),
        (1 << 20, "1M (maj pyramid)"),
        (1 << 24, "16M (256^3 dense)"),
        (1 << 27, "134M (512^3 dense)"),
    ):
        # build the table ON DEVICE — post-fetch host->device uploads run
        # at relay speed and a 512 MB put would dominate the probe
        tab = jax.jit(
            lambda n=table_len: jnp.arange(n, dtype=jnp.int32) % 3
        )()
        tab.block_until_ready()
        g24 = make_gather(table_len, 24)
        g4 = make_gather(table_len, 4)
        i0 = idx0 % table_len
        t24 = timed(f"k=24 table={label}", lambda: g24(tab, i0), reps=2)
        t4 = timed(f"k=4  table={label}", lambda: g4(tab, i0), reps=2)
        if t24 is not None and t4 is not None:
            per = (t24 - t4) / 20.0 * 1000.0
            print(
                f"   -> {per:.2f} ms per {n_lanes}-lane gather "
                f"({per * 1e6 / n_lanes:.1f} ns/elem)",
                flush=True,
            )
        del tab

    # ---- render arms -----------------------------------------------------
    print("== render arms (960x540, 256^3)", flush=True)
    from volxel_tpu.render.pathtrace import render_sample

    r, _ = _build_renderer(256, width=960, height=540)
    r.render_frame()
    ops = list(r._cached_operands)
    config = ops[0]

    def arm(tag, cfg, fi=77):
        o = list(ops)
        o[0] = cfg
        return timed(tag, lambda: render_sample(*o, jnp.uint32(fi)))

    arm("debug_hits", config._replace(debug_hits=True))
    arm("default b=1", config)
    arm("default b=1 premul", config._replace(premul_majorant=True))
    arm("no_dda b=1", config._replace(mode="no_dda"))
    arm("raymarch b=1", config._replace(mode="raymarch"))
    arm("default b=2", config._replace(bounces=2))
    arm("default unchunked", config._replace(chunk_size=None, tile_chunks=False))


if __name__ == "__main__":
    main()
