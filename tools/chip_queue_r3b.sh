#!/bin/bash
# Round-3b re-measurement queue: items whose first round-3 run was either
# corrupted (headline apply-time hiccup), crashed (f32 k=64 px_update vmem
# OOM — fixed by _COMPILER_PARAMS in ops/fused.py), or never logged post-fix
# (config5 FULL, TPU smoke after the ops/vma fix, profile_tail import fix).
set -u
cd "$(dirname "$0")/.."
LOG=CHIP_QUEUE_r3b.log
step() { echo "=== $1 $(date +%H:%M:%S) ===" | tee -a "$LOG"; }

step "bench-headline"
timeout 1200 python bench.py 2>&1 | tee -a "$LOG"

step "preset-sbcgrq_3d_256-f32"   # was: compile-time scoped-vmem OOM
timeout 1200 python bench_cli.py --config sbcgrq_3d_256 --scale 0.25 2>&1 | tee -a "$LOG"

step "config5-capacity-FULL"      # post-fix full-size evidence for the log
timeout 3600 python bench_config5.py --scale 1.0 2>&1 | tee -a "$LOG"

step "probe-r3-regression"        # mixed-dtype apply + config-3 plan sweep
timeout 1800 python tools/probe_r3_regression.py 2>&1 | tee -a "$LOG"

step "profile-tail"
timeout 1500 python tools/profile_tail.py 23 2>&1 | tee -a "$LOG"

step "tpu-smoke"
timeout 2400 env BLOCKCG_TEST_TPU=1 python -m pytest tests/ -q 2>&1 | tail -5 | tee -a "$LOG"

step "done"
