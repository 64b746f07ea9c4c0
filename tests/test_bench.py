"""bench.py contract tests: the driver-graded JSON line must ALWAYS print.

BENCH_r01 lost the dryrun and BENCH_r02 lost the bench to avoidable
crashes in optional instrumentation; these tests pin the structural fix —
every non-essential stage (step stats, ingest timing, individual sweep
modes) is guarded, so the required keys survive any of them failing.
"""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

import pytest

BENCH_PATH = Path(__file__).resolve().parent.parent / "bench.py"


def _load_bench():
    spec = importlib.util.spec_from_file_location("volxel_bench", BENCH_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_main(monkeypatch, capsys, argv):
    bench = _load_bench()
    monkeypatch.setattr(sys, "argv", argv)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in payload, f"required key {key} missing"
    return payload


def test_bench_emits_json(monkeypatch, capsys):
    payload = _run_main(monkeypatch, capsys, ["bench.py", "16", "64", "36"])
    assert isinstance(payload["value"], float)
    assert payload["value"] > 0
    sweep = payload["sweep_ms_per_sample"]
    assert set(sweep) == {"default", "no_dda", "raymarch"}
    assert all(isinstance(v, float) for v in sweep.values())
    # small volume skips the ingest study by design
    assert payload["ingest_s"] is None
    assert payload["steps"]["mode"] == "default"
    # volume-filling leg (VERDICT r3 item 3): all three modes timed at the
    # filled framing, with its own step percentiles
    filled = payload["filled_sweep_ms_per_sample"]
    assert set(filled) == {"default", "no_dda", "raymarch"}
    assert all(isinstance(v, float) for v in filled.values())
    assert payload["steps_filled"]["mode"] == "default"
    # timing-integrity fields (round-5 discovery): the honest sync-mode
    # protocol is the headline; the relay-ack continuity numbers and the
    # switch cost ride along
    relay = payload["relay_ack_ms_per_sample"]
    assert set(relay) == {"default", "no_dda", "raymarch"}
    assert all(isinstance(v, float) for v in relay.values())
    assert isinstance(payload["sync_mode_switch_s"], (int, float))
    assert "sync-mode" in payload["timing_protocol"]
    # setup attribution (VERDICT r3 item 6): env importance build and
    # backend init are their own line items
    for key in ("backend_init_s", "env_importance_build_s", "renderer_init_s"):
        assert key in payload["setup_stages"], key


def test_bench_survives_stepstats_crash(monkeypatch, capsys):
    """Killing step-stats by hand must still yield the JSON line
    (VERDICT r2 item 1). Step stats now run in a subprocess with a hard
    deadline (a degraded chip turned the instrumented compile into a
    >15-minute hang-then-fault in round 3); simulate both failure shapes."""
    import subprocess

    real_run = subprocess.run

    def faulting_run(cmd, **kw):
        if any("--steps-only" in str(c) for c in cmd):
            raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0))
        return real_run(cmd, **kw)

    monkeypatch.setattr(subprocess, "run", faulting_run)
    payload = _run_main(monkeypatch, capsys, ["bench.py", "16", "64", "36"])
    assert isinstance(payload["value"], float)
    assert "error" in payload["steps"]
    assert "timed out" in payload["steps"]["error"]

    def crashing_run(cmd, **kw):
        if any("--steps-only" in str(c) for c in cmd):
            return subprocess.CompletedProcess(
                cmd, returncode=139, stdout="", stderr="simulated kernel fault"
            )
        return real_run(cmd, **kw)

    monkeypatch.setattr(subprocess, "run", crashing_run)
    payload = _run_main(monkeypatch, capsys, ["bench.py", "16", "64", "36"])
    assert isinstance(payload["value"], float)
    assert "simulated kernel fault" in payload["steps"]["error"]


def test_bench_survives_mode_crash(monkeypatch, capsys):
    """One render mode crashing degrades that sweep entry, not the round."""
    from volxel_tpu.api import renderer as renderer_mod

    real_setter = renderer_mod.Renderer.render_mode.fset

    def flaky(self, mode):
        if mode == "no_dda":
            raise RuntimeError("simulated compile fault")
        real_setter(self, mode)

    monkeypatch.setattr(
        renderer_mod.Renderer,
        "render_mode",
        property(renderer_mod.Renderer.render_mode.fget, flaky),
    )
    payload = _run_main(monkeypatch, capsys, ["bench.py", "16", "64", "36"])
    assert isinstance(payload["value"], float)
    sweep = payload["sweep_ms_per_sample"]
    assert "error" in sweep["no_dda"]
    assert isinstance(sweep["default"], float)
    assert isinstance(sweep["raymarch"], float)


def test_bench_frame_budget_degrades_mode(monkeypatch, capsys):
    """A mode whose honest frames blow FRAME_BUDGET_S degrades to an
    error entry; with EVERY honest mode over budget the bench exits red
    but still prints a parseable record carrying the relay-ack numbers
    (an explained failure beats a hang — one pathological mode must not
    eat the driver's round)."""
    bench = _load_bench()

    def over_budget(r, **kw):
        raise bench.FrameBudgetError(1234.0)

    monkeypatch.setattr(bench, "_time_mode", over_budget)
    monkeypatch.setattr(sys, "argv", ["bench.py", "16", "64", "36"])
    with pytest.raises(SystemExit):
        bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    assert payload["value"] == 0
    sweep = payload["sweep_ms_per_sample"]
    assert all("frame exceeded budget" in v["error"] for v in sweep.values())
    # the fetch-free continuity pass ran before the honest pass died
    relay = payload["relay_ack_ms_per_sample"]
    assert all(isinstance(v, float) for v in relay.values())


def test_bench_sync_switch_failure_degrades(monkeypatch, capsys):
    """A faulting sync-mode switch (wedged worker) is retried once and
    then recorded as an error field — the honest sweep still runs (its
    numbers are then relay-paced, but the record says so)."""
    bench = _load_bench()

    calls: list[int] = []

    def failing_switch():
        calls.append(1)
        raise RuntimeError("simulated UNAVAILABLE")

    monkeypatch.setattr(bench, "_sync_mode_switch", failing_switch)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None, raising=True)
    monkeypatch.setattr(sys, "argv", ["bench.py", "16", "64", "36"])
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in payload, f"required key {key} missing"
    assert len(calls) == 2, "switch should be retried once"
    assert "error" in payload["sync_mode_switch_s"]
    assert isinstance(payload["value"], float)


def test_bench_setup_failure_still_prints(monkeypatch, capsys):
    """A failure BEFORE any timing (e.g. the TPU tunnel refusing the
    backend handshake at jax.devices()) still prints the required JSON
    line with an error field and exits nonzero — not a bare traceback."""
    bench = _load_bench()

    def dead(*a, **k):
        raise RuntimeError("UNAVAILABLE: TPU backend setup/compile error")

    monkeypatch.setattr(bench, "_build_benchmark_renderer", dead)
    monkeypatch.setattr(sys, "argv", ["bench.py", "16", "64", "36"])
    with pytest.raises(SystemExit):
        bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in payload
    assert "UNAVAILABLE" in payload["error"]


def test_bench_total_failure_still_prints(monkeypatch, capsys):
    """Even with every mode dead, a parseable JSON record prints (and the
    nonzero exit marks the round red with an explanation, not a traceback)."""
    bench = _load_bench()

    def dead(*a, **k):
        raise RuntimeError("all modes dead")

    monkeypatch.setattr(bench, "_time_mode", dead)
    monkeypatch.setattr(sys, "argv", ["bench.py", "16", "64", "36"])
    with pytest.raises(SystemExit):
        bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    assert payload["value"] == 0
    assert all("error" in v for v in payload["sweep_ms_per_sample"].values())
