#!/bin/bash
# One-command on-chip work queue for when the TPU tunnel returns.
#
# Runs, in order, everything round 3 has queued behind real hardware:
#   0. tunnel liveness check (fast fail if still down)
#   1. Mosaic pre-flight probes for the fused kernels (cos, grid scratch)
#   2. the TPU test suite                       -> TEST_TPU_RUN.txt
#   3. fused-vs-per-draw end-to-end A/B         -> AB_FUSED.json
#   4. headline benchmark (engine A/B inside)   -> /tmp/bench_headline_r03.log
#   5. full benchmark suite                     -> BENCH_SUITE.json
#
# Each step logs to /tmp/chip_return/ and the script continues past
# non-fatal failures (everything after the liveness check), so one flaky
# step doesn't cost the whole queue. Review the logs before committing
# artifacts.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_return
mkdir -p "$LOG"

step() { echo; echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step "0/7 tunnel liveness"
if ! timeout 180 python - <<'EOF'
import time, jax, jax.numpy as jnp
t0 = time.time()
x = jnp.ones((256, 256))
(x @ x).block_until_ready()
print("TPU OK", jax.devices(), "t=%.1fs" % (time.time() - t0))
EOF
then
    echo "TUNNEL STILL DOWN — aborting."
    exit 1
fi

step "1/7 Mosaic pre-flight probes (fused-kernel dependencies)"
timeout 600 python scripts/mosaic_probes.py 2>&1 | tee "$LOG/probes.log"
PROBES_RC=${PIPESTATUS[0]}
[ "$PROBES_RC" -ne 0 ] && echo "WARNING: Mosaic probes failed — fused \
kernels may not lower; the suite/bench will fall back per config."

step "2/7 TPU test suite -> TEST_TPU_RUN.txt"
timeout 5400 make test-tpu 2>&1 | tee "$LOG/test_tpu.log"
tail -40 "$LOG/test_tpu.log" > TEST_TPU_RUN.txt

step "3/7 fused vs per-draw e2e A/B -> AB_FUSED.json"
timeout 3600 python scripts/ab_fused.py 2>&1 | tee "$LOG/ab_fused.log"

step "4/7 headline bench (per-draw vs fused inside) -> bench log"
timeout 3600 python bench.py 2>&1 | tee "$LOG/bench_headline.log"

step "5/7 full benchmark suite -> BENCH_SUITE.json"
timeout 10800 python scripts/bench_suite.py 2>&1 | tee "$LOG/bench_suite.log"

step "6/7 metric-family study on chip -> LOWRANK_STUDY.json"
timeout 3600 python scripts/lowrank_study.py 2>&1 | tee "$LOG/lowrank_study.log"

step "7/7 fused-vs-per-draw engine equivalence (real Mosaic kernels)"
timeout 7200 python scripts/validate_fused_equivalence.py 2>&1 \
    | tee "$LOG/fused_equivalence.log"

step "done"
echo "Artifacts: TEST_TPU_RUN.txt AB_FUSED.json BENCH_SUITE.json"
echo "Logs in $LOG/. Review, update NOTES.md/README.md, then commit."
echo "Reminder: the no-swaps probe verdict is in test_tpu.log"
echo "  (test_probe_matrix_without_trace_time_swaps) — if all three rows"
echo "  lower, even the (context-safe) stable_substitute step is"
echo "  redundant and stable_swaps can default to False."
