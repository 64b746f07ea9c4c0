"""Driver-contract regression: __graft_entry__ must work in a BARE process.

Round-1 failure (MULTICHIP_r01.json rc=1): dryrun_multichip was invoked in a
process where sitecustomize latched a 1-chip TPU backend, and the mesh build
crashed with "mesh 2x4 != 1 devices". The entry point must self-force the
8-device virtual CPU platform — these tests run it in fresh subprocesses with
NO conftest env help to prove the driver's invocation path works.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_fresh(code: str, extra_env: dict | None = None):
    """Run `code` in a fresh interpreter without the conftest's CPU forcing."""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    # stay on CPU even in a bare process: pytest shouldn't grab the TPU tunnel
    env["PALLAS_AXON_POOL_IPS"] = ""
    if extra_env:
        env.update(extra_env)
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )


def test_dryrun_multichip_bare_process():
    res = _run_fresh(
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "dryrun_multichip ok" in res.stdout


def test_dryrun_multichip_driver_env():
    """The CLAUDE.md driver contract: env pre-set to an 8-device CPU mesh."""
    res = _run_fresh(
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)",
        extra_env={
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        },
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "dryrun_multichip ok" in res.stdout
