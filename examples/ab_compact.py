"""Honest sync-mode A/B: DDA traversal structure variants.

Arms (960x540, 256^3 benchmark scene, current defaults premul +
compact_secondary ON as baseline):

  baseline       : two-phase DDA as shipped
  unroll2/4      : two-phase, inner march loop unrolled (bit-identical —
                   trades masked wasted sub-steps for while_loop dispatch
                   overhead)
  phase2         : two-phase with the phase-2 collision decode compacted
                   to the parked lanes (_compact_decode_rgba width ladder)
  loop           : single-loop DDA with per-iteration compacted decode
                   (sample_volume_dda_compact)
  phase2+unroll4 : both two-phase improvements together

Protocol (NOTES.md ROUND-5 DISCOVERY): one tiny fetch FIRST to flip the
relay into honest synchronous execution, then per-program walls with
compile excluded; arms interleaved across passes (per-executable drift
phases were observed — a single-pass ordering is not trustworthy).
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

    trivial(jnp.float32(1.0)).block_until_ready()
    t0 = time.perf_counter()
    float(np.asarray(trivial(jnp.float32(41.0))))
    print(f"fetch (sync-mode switch): {time.perf_counter() - t0:.1f} s", flush=True)

    from volxel_tpu.render.pathtrace import render_sample

    r, _ = _build_renderer(256, width=960, height=540)
    r.render_frame()
    ops = list(r._cached_operands)
    config = ops[0]

    arms = {
        "baseline": config,
        "unroll2": config._replace(dda_unroll=2),
        "unroll4": config._replace(dda_unroll=4),
        "phase2": config._replace(compact_decode="phase2"),
        "loop": config._replace(compact_decode="loop"),
        "phase2+unroll4": config._replace(
            compact_decode="phase2", dda_unroll=4
        ),
    }

    def run(cfg, fi):
        o = list(ops)
        o[0] = cfg
        return render_sample(*o, jnp.uint32(fi))

    print("== compiling all arms (excluded from timing)", flush=True)
    for tag, cfg in arms.items():
        t0 = time.perf_counter()
        run(cfg, 77).block_until_ready()
        print(f"  {tag}: first run {time.perf_counter() - t0:.1f} s", flush=True)

    times: dict[str, list[float]] = {t: [] for t in arms}
    passes = 3
    for p in range(passes):
        print(f"== pass {p}", flush=True)
        for tag, cfg in arms.items():
            t0 = time.perf_counter()
            run(cfg, 100 + p).block_until_ready()
            dt = time.perf_counter() - t0
            times[tag].append(dt)
            print(f"  {tag}: {dt:.2f} s", flush=True)

    print("== medians", flush=True)
    base = sorted(times["baseline"])[passes // 2]
    for tag, xs in times.items():
        med = sorted(xs)[len(xs) // 2]
        print(
            f"  {tag}: med {med:.2f} s  best {min(xs):.2f}  "
            f"({(med - base) / base * 100:+.1f}% vs baseline)",
            flush=True,
        )


if __name__ == "__main__":
    main()
