"""Price the march loop's per-iteration COST STRUCTURE on the chip.

profile_final measured the sample loop at 80-90% of both bench framings
and the first partition micro-arms showed jnp.sum costing the same
~0.65 ms/iteration as cumsum at 129600 lanes — either every full-width
vector PASS costs ~5 ns/element (absurd for a VPU) or a fori/while
ITERATION carries a large width-independent fixed cost. This probe
separates the two with a width sweep and op-mix arms, all chained K
deep inside ONE program (inner iterations pay no relay RTT — NOTES.md
ROUND-5 DISCOVERY).

Arms per width (129600, 32400, 16200, 8100, 2048):
  noop      — fori body: roll(mask) only (the chain's floor)
  sum       — + jnp.sum reduce (every ladder cond pays one)
  cumsum    — jnp.cumsum scan (partition first half)
  cumsum_mxu— triangular-dot form
  partition — _partition_perm (cumsum + scatter)
  body      — a gather-free march-body op mix (t/tau/mip wheres + two
              rng_where draws) — the iteration's elementwise cost
  gather    — one premul-majorant pyramid gather per lane (the march's
              single serialized fetch)
  decode    — _compact_decode_rgba engagement at ~4% live (partition +
              prefix gathers + octo row-gather decode + scatter-back)

Usage: python examples/probe_partition.py [size]
"""

from __future__ import annotations

import os
import sys as _sys
import time

import numpy as np

_sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_atlas import _build_renderer  # noqa: E402


def cumsum_mxu_probe(x):
    import jax
    import jax.numpy as jnp

    n = x.shape[0]
    if n <= 256:
        return jnp.cumsum(x)
    pad = (-n) % 128
    xp = jnp.pad(x, (0, pad)).reshape(-1, 128)
    tri = (jnp.arange(128)[:, None] <= jnp.arange(128)[None, :]).astype(
        jnp.float32
    )
    pre = jnp.dot(xp, tri, precision=jax.lax.Precision.HIGHEST)
    rows = pre[:, -1]
    offs = cumsum_mxu_probe(rows) - rows
    return (pre + offs[:, None]).reshape(-1)[:n]


def run_probe(grid, params, lut) -> None:
    import jax
    import jax.numpy as jnp

    from volxel_tpu.render import modes
    from volxel_tpu.render.rng import rng_where

    if (
        getattr(grid, "maj_mips", None) is not None
        and getattr(grid, "maj_alpha", None) is None
        and hasattr(grid, "_replace")
    ):
        grid = grid._replace(
            maj_alpha=modes.build_premul_majorant(grid.maj_mips, params, lut)
        )

    key = jax.random.PRNGKey(0)
    K = 40

    def timed(tag, g, args, reps=3):
        jax.block_until_ready(g(*args))
        xs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(g(*args))
            xs.append(time.perf_counter() - t0)
        med = sorted(xs)[len(xs) // 2]
        print(f"  {tag}: K={K} total {med*1e3:.1f} ms -> {med/K*1e3:.3f} "
              f"ms/iter", flush=True)

    for n in (129600, 32400, 16200, 8100, 2048):
        print(f"== width {n}", flush=True)
        mask0 = jax.random.uniform(key, (n,)) < 0.04
        pos0 = (
            jax.random.uniform(key, (n, 3), jnp.float32)
            * (jnp.asarray(grid.extent).astype(jnp.float32) - 2.0) + 1.0
        )
        state0 = jax.random.randint(
            key, (n, 4), 1, 2**31 - 1, dtype=jnp.int32
        ).astype(jnp.uint32)

        def chain(step):
            """step(mask, aux...) -> scalar-ish; threaded K deep."""

            @jax.jit
            def g(mask0, pos, state, grid, params, lut):
                def body(i, mask):
                    s = step(mask, pos, state, grid, params, lut)
                    return jnp.roll(mask, 1) ^ (s % 7.0 == 6.5)

                mask = jax.lax.fori_loop(0, K, body, mask0)
                return jnp.sum(mask.astype(jnp.int32))

            return g

        args = (mask0, pos0, state0, grid, params, lut)

        noop = chain(lambda m, *a: jnp.float32(0.0))
        timed("noop", noop, args)
        timed("sum", chain(
            lambda m, *a: jnp.sum(m.astype(jnp.int32)).astype(jnp.float32)),
            args)
        timed("cumsum", chain(
            lambda m, *a: jnp.cumsum(m.astype(jnp.int32))[-1].astype(
                jnp.float32)), args)
        timed("cumsum_mxu", chain(
            lambda m, *a: cumsum_mxu_probe(m.astype(jnp.float32))[-1]), args)
        timed("partition", chain(
            lambda m, *a: modes._partition_perm(m)[0][0].astype(jnp.float32)),
            args)

        def body_mix(m, pos, state, grid, params, lut):
            # march-body op mix, no gathers: t/tau updates, masked draws
            t = pos[:, 0]
            majorant = pos[:, 1] * 0.25 + 1.0
            dt = jnp.min(jnp.floor(pos) * 0.5 - pos, axis=-1)
            t_new = t + dt
            tau_new = t - majorant * dt
            collided = tau_new <= 0.0
            coll = m & collided
            t2 = jnp.where(coll, t_new, jnp.where(m, t, t_new))
            st, xi1 = rng_where(coll, state)
            real = xi1 * majorant < t2
            st, xi2 = rng_where(coll & ~real, st)
            tau = jnp.where(coll & ~real, -jnp.log(1.0 - xi2), tau_new)
            return jnp.sum(tau) * 0.0 + xi1[0]

        timed("body", chain(body_mix), args)

        from volxel_tpu.render.sampling import lookup_majorant_premul

        def gather_arm(m, pos, state, grid, params, lut):
            mip_i = jnp.zeros((n,), jnp.int32) + 2
            maj = lookup_majorant_premul(grid, pos, mip_i)
            return maj[0]

        if getattr(grid, "maj_alpha", None) is not None:
            timed("gather", chain(gather_arm), args)

        def decode_arm(m, pos, state, grid, params, lut):
            rgba = modes._compact_decode_rgba(grid, params, lut, pos, m)
            return rgba[0, 3]

        timed("decode", chain(decode_arm), args)


def main() -> None:
    import jax
    import jax.numpy as jnp

    size = int(_sys.argv[1]) if len(_sys.argv) > 1 else 512

    @jax.jit
    def trivial(x):
        return x + 1.0

    trivial(jnp.float32(1.0)).block_until_ready()
    t0 = time.perf_counter()
    float(np.asarray(trivial(jnp.float32(41.0))))
    print(f"fetch (sync-mode switch): {time.perf_counter() - t0:.1f} s", flush=True)

    r, _ = _build_renderer(size, width=1920, height=1080)
    r.render_frame()
    ops = list(r._cached_operands)
    grid, params, lut = ops[1], ops[2], ops[3]
    run_probe(grid, params, lut)


if __name__ == "__main__":
    main()
