"""Same-process A/B of the traversal while_loop cond across rounds.

VERDICT r2 item 2: the headline default-mode number regressed 0.126 ->
0.271 ms/sample between rounds 1 and 2. Candidate cause: round 2 changed
every loop cond from `steps[0] < CAP` (scalar pick from a uniformly
incremented array) to `jnp.max(steps) < CAP` over per-lane personal step
counts — an n-lane reduction evaluated every iteration. Round 3 uses a
scalar iteration counter. This script times all three variants on the
bench scene IN ONE PROCESS (NOTES.md measurement hygiene: cross-process
comparisons on the tunneled chip are meaningless), interleaved A-B-C-A to
expose drift.

Usage: python examples/ab_loop_cond.py [size] [frames]
"""

from __future__ import annotations

import importlib.util
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _load_modes_at(rev: str):
    """Import volxel_tpu/render/modes.py as of a git revision, as a
    standalone module (its imports resolve against the CURRENT package —
    the sampling/rng helpers it uses are stable across these revisions)."""
    src = subprocess.run(
        ["git", "show", f"{rev}:volxel_tpu/render/modes.py"],
        capture_output=True,
        text=True,
        cwd=REPO,
        check=True,
    ).stdout
    f = tempfile.NamedTemporaryFile(
        "w", suffix=f"_modes_{rev}.py", delete=False
    )
    f.write(src)
    f.close()
    spec = importlib.util.spec_from_file_location(f"modes_{rev}", f.name)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _build_renderer(size: int):
    from volxel_tpu import Renderer
    from volxel_tpu.grid import construct_brick_grid
    from volxel_tpu.utils.fixtures import synthetic_ct_volume

    vol = synthetic_ct_volume((size, size, size), bits_stored=12)
    grid = construct_brick_grid(
        vol.astype(np.float32) / vol.max(), transform=np.eye(4, dtype=np.float32)
    )
    r = Renderer(width=1920, height=1080)
    r.restart_from_grid(grid)
    r.camera.rotate_around_view(0.6, 0.4)
    r.camera.zoom(2.0)
    r.settings.bounces = 1
    r.settings.max_samples = 10**9
    r.set_transfer_colors(
        [
            {"color": [0.5686, 0.2549, 0.6745, 0.54], "stop": 0.0},
            {"color": [0.9725, 0.8941, 0.3608, 1.0], "stop": 0.1782},
            {"color": [0.0, 1.0, 1.0, 0.17], "stop": 0.3985},
        ]
    )
    r.settings.sample_range = [0.0564, 1.0]
    return r


def main() -> None:
    import jax

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    import volxel_tpu.render.pathtrace as pt

    variants = {
        "r3_scalar_counter": pt.get_mode_functions,  # HEAD
        "r2_max_per_lane": _load_modes_at("625d1c4").get_mode_functions,
        "r1_steps0_array": _load_modes_at("bb77956").get_mode_functions,
    }

    r = _build_renderer(size)
    results: dict[str, list[float]] = {k: [] for k in variants}

    def time_default(gmf) -> float:
        pt.get_mode_functions = gmf
        jax.clear_caches()
        r.restart_rendering()
        for _ in range(2):
            r.render_frame().block_until_ready()
        times = []
        for _ in range(frames):
            t0 = time.perf_counter()
            r.render_frame().block_until_ready()
            times.append(time.perf_counter() - t0)
        return float(np.median(times) * 1000.0)

    # tight interleave over several passes: chip/tunnel throughput drifts
    # within one session (observed 0.14 -> 0.24 ms for identical code), so
    # only adjacent-in-time comparisons count; report per-variant medians
    # and the pass-by-pass trace.
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    for p in range(passes):
        for name in variants:
            ms = time_default(variants[name])
            results[name].append(ms)
            print(f"pass {p}  {name:22s} {ms:7.3f} ms/sample", flush=True)

    ref = min(np.median(v) for v in results.values())
    print("\nsummary (default mode, median over passes):")
    for name, vals in results.items():
        med = float(np.median(vals))
        print(
            f"  {name:22s} {med:7.3f} ms/sample  ({med / ref:.2f}x best)"
            f"   runs: {[round(v, 3) for v in vals]}"
        )


if __name__ == "__main__":
    main()
