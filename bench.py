"""Benchmark entry point — run by the driver on real TPU hardware.

Prints ONE JSON line whose required keys are
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
plus the reference-protocol sweep the driver/judge can inspect:
  "sweep":  ms/sample for {default, no_dda, raymarch} — mirroring the
            reference's performance.txt 4-way comparison and
            public/benchmark.json's 3-mode protocol
  "mrays_per_s": primary rays per second in the default mode
  "steps":  per-ray traversal step percentiles + caps (default mode),
            evidencing that the static loop caps never bind
  "ingest_s": 512^3 DICOM-ZIP -> brick grid wall time (reference claims
            "in excess of 2 minutes", README.md:12)

Protocol (BASELINE.md): 1080p, 512^3 volume, bounces=1, the benchmark
transfer function from public/benchmark.json. Baseline: the reference's
DDA mode at ~5.8 ms/sample (performance.txt:28-35). vs_baseline > 1 means
faster than the reference.

TIMING INTEGRITY (round-5 discovery, NOTES.md): on the axon tunnel,
fetch-free block_until_ready returns at relay-ack WITHOUT waiting for
execution — the 0.09-0.27 ms/sample values recorded in BENCH_r01-r03
measured the relay's speculative ack rate, not the chip. The honest
protocol: one tiny device->host fetch switches the session into
synchronous per-program execution (each dispatch then pays ~33 ms relay
RTT but truly blocks); frames are timed there. Both numbers are
reported — "value"/"sweep_ms_per_sample" are HONEST sync-mode times;
"relay_ack_ms_per_sample" preserves the old fiction for cross-round
continuity.

Structure rule (BENCH_r02 post-mortem): the required JSON line must print
even when optional instrumentation fails — every non-essential stage is
individually guarded, and its failure degrades to an "error" field in the
payload instead of an rc!=0 round.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# Real 1080p/512^3 frames are ~10-120 s in honest sync mode. A frame
# beyond this budget is aborted so one pathological mode cannot eat the
# driver's whole round (the per-mode guard catches the TimeoutError).
FRAME_BUDGET_S = 600.0


class FrameBudgetError(RuntimeError):
    def __init__(self, frame_s: float):
        super().__init__(f"frame exceeded budget: {frame_s:.0f}s")
        self.frame_s = frame_s


def _sync_mode_switch() -> float:
    """ONE tiny deliberate device->host fetch — flips the tunnel session
    into its honest synchronous mode (NOTES.md ROUND-5 DISCOVERY: without
    it, block_until_ready returns at relay-ack and wall times are
    fiction). Returns the switch wall time (observed 0.3-390 s on the
    tunnel; ~0 on CPU)."""
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(np.asarray(jax.jit(lambda x: x + 1.0)(jnp.float32(1.0))))
    return time.perf_counter() - t0


def _time_mode(r, warmup: int = 1, timed: int = 2, blocks: int = 1) -> float:
    """Median honest ms/frame over `timed` frames (best of `blocks`).

    Call AFTER _sync_mode_switch: each render_frame().block_until_ready()
    then waits for true execution (plus ~33 ms relay RTT — negligible
    against multi-second real frames). The warmup frame absorbs compile.
    """
    for _ in range(warmup):
        r.render_frame().block_until_ready()
    best = []
    for _ in range(blocks):
        times = []
        for _ in range(timed):
            t0 = time.perf_counter()
            r.render_frame().block_until_ready()
            dt = time.perf_counter() - t0
            if dt > FRAME_BUDGET_S:
                raise FrameBudgetError(dt)
            times.append(dt)
        best.append(np.median(times))
    return float(min(best) * 1000.0)


def _time_mode_relay_ack(r, warmup: int = 2, timed: int = 6) -> float:
    """The PRE-switch fetch-free protocol of BENCH_r01-r03 — measures the
    relay's speculative ack rate, NOT execution (kept for cross-round
    continuity; see module docstring). Must run before _sync_mode_switch."""
    for _ in range(warmup):
        r.render_frame().block_until_ready()
    times = []
    for _ in range(timed):
        t0 = time.perf_counter()
        r.render_frame().block_until_ready()
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1000.0)


def _err(e: BaseException) -> str:
    return f"{type(e).__name__}: {e}"[:300]


def _mxu_status(r) -> dict:
    """Whether the MXU one-hot gather engaged for this run (attribution:
    a driver bench where the kernel probe failed should say so)."""
    try:
        from volxel_tpu.render.mxu_gather import preferred_pack_dtype

        return {
            "engaged": bool(r._resolve_mxu_gather()),
            "pack_dtype": preferred_pack_dtype(),
        }
    except Exception as e:  # noqa: BLE001 — attribution only, never fatal
        return {"error": _err(e)}


def _frame_filled(r) -> None:
    """Reframe to the VOLUME-FILLING protocol (VERDICT r3 item 3): camera
    close enough that the unit-cube AABB covers ~the whole 16:9 viewport
    — at distance 0.8 a measured 97.5% of camera rays enter the AABB
    (ray_box_intersection probe at 192x108; the default wide framing at
    distance 2.0 measures 18%) — plus the reference's 3x density
    (BASELINE.md:5, its 'body donor at 3x density' run). Almost no ray
    can be an empty background pixel for free here, so the headline
    can't be discounted as empty-pixel throughput."""
    from volxel_tpu.scene.camera import Camera

    r.camera = Camera(1.0)
    r.camera.rotate_around_view(0.6, 0.4)
    r.camera.zoom(0.8)
    r.settings.density_multiplier = 3.0
    r.restart_rendering()


def _build_benchmark_renderer(size: int, width: int, height: int, stages=None,
                              vol=None, filled: bool = False):
    """The benchmark scene (shared by the sweep and the --steps-only
    subprocess so both measure the same state). `stages`, when given, is a
    dict that receives per-stage wall times so BENCH setup time is
    attributable line-item by line-item (BENCH_r02 carried 348 s of
    unattributed setup). `vol` reuses an already-synthesized volume
    (the 512^3 synth costs ~13-50 s; the driver run measured it twice).
    `filled` applies the volume-filling framing instead of the default
    wide framing."""
    def stage(name):
        if stages is not None:
            stages[name] = round(time.time() - stage.t0, 2)
        stage.t0 = time.time()

    stage.t0 = time.time()
    import jax

    jax.devices()  # backend/tunnel handshake, attributed separately
    stage("backend_init_s")
    from volxel_tpu import Renderer
    from volxel_tpu.grid import construct_brick_grid
    from volxel_tpu.scene.environment import default_environment
    from volxel_tpu.utils.fixtures import synthetic_ct_volume

    if vol is None:
        vol = synthetic_ct_volume((size, size, size), bits_stored=12)
    stage("volume_synth_s")
    grid = construct_brick_grid(
        vol.astype(np.float32) / vol.max(), transform=np.eye(4, dtype=np.float32)
    )
    stage("brick_build_s")
    # the env importance-pyramid jit is the bulk of renderer init
    # (BENCH_r03 carried it as 13.6 unattributed seconds); building one
    # throwaway default env here caches the compile so the ctor's own
    # build is cheap and the cost shows up on its own line
    default_environment().state.imp_mips[0].block_until_ready()
    stage("env_importance_build_s")
    r = Renderer(width=width, height=height)
    stage("renderer_init_s")
    r.restart_from_grid(grid)
    stage("grid_device_upload_s")
    if filled:
        _frame_filled(r)
    else:
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


def _steps_only(
    size: int, width: int = 1920, height: int = 1080, filled: bool = False,
    vol_path: str | None = None,
) -> None:
    """Subprocess entry: print the step-statistics JSON for the scene.

    Runs at the SAME resolution as the parent bench (the driver's 1080p
    by default) — at contract-test scale (64x36) the instrumented 1080p
    march cost minutes on CPU and blew the subprocess deadline.
    `vol_path` reuses the parent's synthesized volume (an .npy dump) —
    re-synthesizing 512^3 costs 30+ s in the VM's slow phases and was
    eating into the subprocess deadline."""
    from volxel_tpu.utils.stepstats import step_statistics

    vol = np.load(vol_path) if vol_path else None
    r = _build_benchmark_renderer(size, width, height, filled=filled, vol=vol)
    r.render_mode = "default"
    print(json.dumps(step_statistics(r, "default")))


def main() -> None:
    """Guarded entry: even a failure BEFORE any timing (e.g. the TPU
    tunnel refusing the backend handshake — observed as
    'UNAVAILABLE: TPU backend setup/compile error' at jax.devices())
    still prints the required JSON line, with the failure in an "error"
    field and a nonzero exit marking the round red with an explanation
    instead of a bare traceback."""
    try:
        _main()
    except SystemExit:
        raise
    except BaseException as e:  # noqa: BLE001 — the JSON line survives anything
        print(
            json.dumps(
                {
                    "metric": "ms/frame (bench failed before timing)",
                    "value": 0,
                    "unit": "ms",
                    "vs_baseline": 0,
                    "error": _err(e),
                }
            )
        )
        sys.exit(1)


def _main() -> None:
    t_setup = time.time()
    from volxel_tpu.utils.fixtures import synthetic_ct_volume

    if len(sys.argv) > 1 and sys.argv[1] == "--steps-only":
        rest = [a for a in sys.argv[2:] if a != "--filled"]
        _steps_only(
            int(rest[0]),
            int(rest[1]) if len(rest) > 1 else 1920,
            int(rest[2]) if len(rest) > 2 else 1080,
            filled="--filled" in sys.argv,
            vol_path=rest[3] if len(rest) > 3 else None,
        )
        return

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    height = int(sys.argv[3]) if len(sys.argv) > 3 else 1080

    setup_stages: dict[str, object] = {}
    t0 = time.time()
    vol = synthetic_ct_volume((size, size, size), bits_stored=12)
    setup_stages["ingest_volume_synth_s"] = round(time.time() - t0, 2)

    # ingest timing: DICOM ZIP -> grid, the reference's ">2 minutes" path
    # (README.md:12). Sliced at the benchmark volume size. Optional: any
    # failure degrades to an error string, never a crashed bench.
    ingest_s = None
    if size >= 256:  # only meaningful at real scale
        try:
            import io
            import zipfile

            from volxel_tpu.ingest.ziploader import read_zip_to_grid
            from volxel_tpu.utils.fixtures import write_dicom_series

            blobs_vol = vol[: min(size, 512)]
            buf = io.BytesIO()
            t0 = time.time()
            with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
                for i, blob in enumerate(write_dicom_series(blobs_vol, bits_stored=12)):
                    zf.writestr(f"series/slice_{i:04d}.dcm", blob)
            zip_bytes = buf.getvalue()
            setup_stages["zip_write_s"] = round(time.time() - t0, 2)
            del buf
            t0 = time.time()
            read_zip_to_grid(zip_bytes)
            ingest_s = round(time.time() - t0, 2)
            del zip_bytes
        except Exception as e:  # noqa: BLE001 — never kill the bench
            ingest_s = {"error": _err(e)}

    r = _build_benchmark_renderer(
        size, width, height, stages=setup_stages, vol=vol
    )
    # park the synthesized volume on disk for the step-stats subprocesses
    # (re-synthesizing 512^3 costs 30+ s in the VM's slow phases)
    vol_path = None
    try:
        import tempfile

        f = tempfile.NamedTemporaryFile(suffix=".npy", delete=False)
        np.save(f, vol)
        f.close()
        vol_path = f.name
    except Exception:  # noqa: BLE001 — subprocess will re-synthesize
        vol_path = None
    del vol

    setup_s = time.time() - t_setup
    print(
        f"# setup {setup_s:.1f}s (ingest {ingest_s}s, stages {setup_stages}), compiling...",
        file=sys.stderr,
    )

    # at sub-benchmark scale (the contract tests run size 16) a short
    # timing protocol suffices
    small = size < 256
    modes = ("default", "no_dda", "raymarch")

    # PASS A (pre-switch, fetch-free): compiles every mode and records the
    # relay-ack continuity numbers — the protocol BENCH_r01-r03 used.
    # These are NOT execution times (module docstring).
    relay_ack: dict[str, object] = {}
    for mode in modes:
        try:
            r.render_mode = mode  # resets accumulation + respecializes
            t0 = time.time()
            ms = round(_time_mode_relay_ack(r), 3)
            relay_ack[mode] = ms
            print(
                f"# relay-ack {mode}: {ms} ms/sample "
                f"(incl. compile {time.time() - t0:.0f}s) [NOT execution]",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001
            relay_ack[mode] = {"error": _err(e)}
            print(f"# relay-ack {mode}: FAILED {_err(e)}", file=sys.stderr)

    # Switch the session to honest synchronous execution. A wedged worker
    # can fault the switch — retry once after a pause.
    sync_switch_s: object
    try:
        sync_switch_s = round(_sync_mode_switch(), 1)
    except Exception as e:  # noqa: BLE001
        print(f"# sync switch failed ({_err(e)}), retrying in 60s", file=sys.stderr)
        time.sleep(60.0)
        try:
            sync_switch_s = round(_sync_mode_switch(), 1)
        except Exception as e2:  # noqa: BLE001
            sync_switch_s = {"error": _err(e2)}
    print(f"# sync-mode switch: {sync_switch_s}s", file=sys.stderr)

    # PASS B (honest): real per-frame execution times. Frames at this
    # scale are seconds-to-minutes; budgets keep one mode from eating the
    # round.
    tm = dict(warmup=1, timed=2, blocks=1)
    sweep: dict[str, object] = {}
    for mode in modes:
        try:
            r.render_mode = mode
            t0 = time.time()
            ms = round(_time_mode(r, **tm), 3)
            sweep[mode] = ms
            print(
                f"# honest {mode}: {ms} ms/sample ({time.time() - t0:.0f}s wall)",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001
            sweep[mode] = {"error": _err(e)}
            print(f"# honest {mode}: FAILED {_err(e)}", file=sys.stderr)

    # VOLUME-FILLING leg (VERDICT r3 item 3): camera framed so the AABB
    # covers ~the whole viewport + the reference's 3x density. All three
    # modes are timed (VERDICT r4 item 2 — the filled framing is the
    # realistic workload); the per-frame budget caps a pathological mode.
    filled_sweep: dict[str, object] = {}
    filled_modes = modes
    if any(isinstance(v, float) for v in sweep.values()):
        try:
            _frame_filled(r)
            for mode in filled_modes:
                try:
                    r.render_mode = mode
                    ms = round(_time_mode(r, warmup=1, timed=1, blocks=1), 3)
                    filled_sweep[mode] = ms
                    print(f"# filled {mode}: {ms} ms/sample", file=sys.stderr)
                except Exception as e:  # noqa: BLE001
                    filled_sweep[mode] = {"error": _err(e)}
                    print(f"# filled {mode}: FAILED {_err(e)}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            filled_sweep = {"error": _err(e)}

    # step-count study on the benchmark scene (default mode). Optional and
    # DOUBLY guarded: it runs in a subprocess with a hard deadline — on a
    # degraded chip the instrumented compile can take tens of minutes
    # (observed r3), and a hang would blow the driver's budget just as
    # surely as r2's kernel fault did.
    def _steps_subprocess(filled: bool) -> object:
        import os
        import subprocess

        import jax

        cmd = [
            sys.executable, "-u", __file__, "--steps-only",
            str(size), str(width), str(height),
        ]
        if vol_path:
            cmd.append(vol_path)
        if filled:
            cmd.append("--filled")
        # pin the subprocess to the parent's backend: with the parent on
        # CPU (the contract tests), inheriting PALLAS_AXON_POOL_IPS would
        # make sitecustomize register the tunneled TPU backend and the
        # "CPU" step stats nondeterministically ride (and stall on) the
        # tunnel — observed as 540 s subprocess timeouts under pytest
        env = dict(os.environ)
        if jax.default_backend() == "cpu":
            env["PALLAS_AXON_POOL_IPS"] = ""
            env["JAX_PLATFORMS"] = "cpu"
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=900, env=env
            )
            if proc.returncode == 0 and proc.stdout.strip():
                return json.loads(proc.stdout.strip().splitlines()[-1])
            return {"error": f"rc={proc.returncode}: {proc.stderr[-200:]}"}
        except subprocess.TimeoutExpired:
            print("# step stats: timed out, skipped", file=sys.stderr)
            return {"error": "step statistics timed out after 900s; skipped"}
        except Exception as e:  # noqa: BLE001
            print(f"# step stats: FAILED {_err(e)}", file=sys.stderr)
            return {"error": _err(e)}

    steps: object = None
    steps_filled: object = None
    if isinstance(sweep.get("default"), float) or isinstance(
        relay_ack.get("default"), float
    ):
        steps = _steps_subprocess(filled=False)
        if isinstance(filled_sweep.get("default"), float):
            steps_filled = _steps_subprocess(filled=True)
    if vol_path:
        import os

        try:
            os.unlink(vol_path)
        except OSError:
            pass

    timed = {m: v for m, v in sweep.items() if isinstance(v, float)}
    if not timed:
        # no honest number at all — emit an explicit failure record with
        # whatever relay-ack numbers exist; the nonzero exit marks the
        # round red, but the payload explains why
        print(json.dumps({"metric": "bench failed (no honest timing)",
                          "value": 0, "unit": "ms", "vs_baseline": 0,
                          "sweep_ms_per_sample": sweep,
                          "relay_ack_ms_per_sample": relay_ack,
                          "sync_mode_switch_s": sync_switch_s}))
        raise SystemExit(1)

    headline_mode = "default" if "default" in timed else next(iter(timed))
    ms_per_frame = timed[headline_mode]
    baseline_ms = 5.8  # reference DDA ms/sample (performance.txt:28-35)
    print(
        json.dumps(
            {
                "metric": (
                    f"ms/frame {width}x{height} {size}^3 volume, "
                    f"{headline_mode} path-traced sample "
                    f"(HONEST sync-mode execution; prior rounds' values "
                    f"were relay-ack fiction — see NOTES.md r5)"
                ),
                "value": ms_per_frame,
                "unit": "ms",
                "vs_baseline": round(baseline_ms / ms_per_frame, 6),
                "sweep_ms_per_sample": sweep,
                "filled_sweep_ms_per_sample": filled_sweep,
                "relay_ack_ms_per_sample": relay_ack,
                "sync_mode_switch_s": sync_switch_s,
                "timing_protocol": (
                    "sync-mode real execution (fetch-first); "
                    "relay_ack_* reproduces the void BENCH_r01-r03 protocol"
                ),
                "mrays_per_s": round(width * height / (ms_per_frame / 1000.0) / 1e6, 4),
                "mxu_gather": _mxu_status(r),
                "steps": steps,
                "steps_filled": steps_filled,
                "ingest_s": ingest_s,
                "setup_s": round(setup_s, 1),
                "setup_stages": setup_stages,
            }
        )
    )


if __name__ == "__main__":
    main()
