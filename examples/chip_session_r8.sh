#!/bin/bash
# Round-8 chip session: run the full measurement plan unattended once the
# axon tunnel is back. Logs to /tmp/chip_r8/*.log; each stage is
# individually time-bounded so one wedged stage can't eat the session.
set -u
mkdir -p /tmp/chip_r8
cd "$(dirname "$0")/.."

run() {
  name=$1; budget=$2; shift 2
  echo "=== $name ($(date)) budget ${budget}s" | tee -a /tmp/chip_r8/summary.log
  timeout "$budget" "$@" >"/tmp/chip_r8/$name.log" 2>&1
  rc=$?
  tail -25 "/tmp/chip_r8/$name.log" | tee -a /tmp/chip_r8/summary.log
  echo "--- $name rc=$rc" | tee -a /tmp/chip_r8/summary.log
}

# 0. liveness + sync-mode switch cost (cheap, fails fast if still down)
run liveness 420 python -c "
import time, numpy as np, jax, jax.numpy as jnp
print(jax.devices(), flush=True)
t0=time.perf_counter()
print(float(np.asarray(jax.jit(lambda x: x+1.0)(jnp.float32(1.0)))), flush=True)
print('sync switch', time.perf_counter()-t0, 's', flush=True)
"
grep -q "rc=0" /tmp/chip_r8/summary.log || exit 3

# 1. raw-op probe: Mosaic gather support sweep + MXU vs XLA gather costs
run probe_gather 1800 python examples/probe_mxu_gather.py

# 2. fresh Mosaic gather-surface probe (VERDICT item 9)
run gather_reprobe 900 python -m pytest tests/test_shearwarp.py::test_gather_probe -x -q -s

# 3. render-level A/B at 960x540/256^3 (all round-8 arms)
run ab_mxu_256 3600 python examples/ab_mxu.py 256 960 540

# 4. headline-scale spot A/B at 1080p/512^3 (slow frames — fewer arms
#    would need editing; accept the budget or kill at timeout)
run ab_mxu_512 5400 python examples/ab_mxu.py 512 1920 1080

echo "=== done ($(date))" | tee -a /tmp/chip_r8/summary.log
