"""Same-process fetch-free A/B: premultiplied alpha-majorant pyramid vs the
inline two-gather DDA majorant chain.

build_premul_majorant (render/modes.py) folds vol_maj * transfer_alpha(...)
into the stacked pyramid at operand-prep time, so the DDA inner march does
ONE gather per step instead of pyramid + transfer-LUT. Renders are
bit-identical (tests/test_render.py::test_premul_majorant_bit_identity);
this script decides the perf default.

Protocol (NOTES.md measurement hygiene): one process, tightly interleaved
variants, multiple passes, block_until_ready only — NEVER a device->host
fetch (the first fetch poisons the session: +33 ms per dispatch forever).

Usage: python examples/ab_premul.py [size] [frames] [passes]
"""

from __future__ import annotations

import sys
import time

import os
import sys as _sys

import numpy as np

_sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_atlas import _build_renderer  # noqa: E402


def main() -> None:
    import jax.numpy as jnp

    from volxel_tpu.render.pathtrace import render_sample

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    results: dict[str, list[float]] = {}

    def timed(tag, fn, fi0):
        fn(jnp.uint32(fi0)).block_until_ready()  # compile/warm
        t0 = time.perf_counter()
        for i in range(frames):
            out = fn(jnp.uint32(fi0 + 1 + i))
        out.block_until_ready()
        ms = (time.perf_counter() - t0) / frames * 1000.0
        results.setdefault(tag, []).append(ms)
        print(f"  {tag}: {ms:.3f} ms/sample", flush=True)

    import jax

    from volxel_tpu.render.modes import build_premul_majorant

    r, _ = _build_renderer(size)
    r.render_frame()  # primes operands
    ops = list(r._cached_operands)
    config = ops[0]

    def make_cfg(flag):
        o = list(ops)
        o[0] = config._replace(premul_majorant=flag)
        return lambda fi: render_sample(*o, fi)

    # third arm: the pyramid built by a SEPARATE jit and attached as an
    # operand — measured 3x SLOWER than inline on the first A/B pass
    # (suspect: operand layout / side-built table pathology); kept to
    # confirm the in-graph build dodges it.
    g = ops[1]
    g_op = g._replace(
        maj_alpha=jax.jit(build_premul_majorant, static_argnums=(3,))(
            g.maj_mips, ops[2], ops[3], config.physical_majorant
        )
    )

    def make_operand():
        o = list(ops)
        o[1] = g_op
        return lambda fi: render_sample(*o, fi)

    variants = {
        "inline": make_cfg(False),
        "ingraph": make_cfg(True),
        "operand": make_operand(),
    }
    for p in range(passes):
        print(f"pass {p}:", flush=True)
        for tag, fn in variants.items():
            timed(tag, fn, fi0=1000 * p)

    print("\n== medians / bests ==")
    for tag, xs in results.items():
        print(
            f"{tag}: median {np.median(xs):.3f} best {min(xs):.3f} "
            f"runs {[round(x, 3) for x in xs]}"
        )


if __name__ == "__main__":
    main()
