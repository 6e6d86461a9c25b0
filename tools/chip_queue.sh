#!/bin/bash
# Round-3 chip measurement queue — run when the TPU tunnel is up.
# Each step is independently timeout-guarded; results append to
# CHIP_QUEUE_r3.log (JSON lines interleaved with step markers).
set -u
cd "$(dirname "$0")/.."
LOG=CHIP_QUEUE_r3.log
step() { echo "=== $1 $(date +%H:%M:%S) ===" | tee -a "$LOG"; }

step "verify-drive"
timeout 1200 python - <<'EOF' 2>&1 | tee -a "$LOG"
import jax, jax.numpy as jnp, numpy as np
import blockcg_tpu as bc
from blockcg_tpu.problems import laplacian_dia
op = laplacian_dia((32,32,32), dtype=jnp.float32)
B = jnp.asarray(np.random.default_rng(0).standard_normal((op.n, 32)), dtype=jnp.float32)
X, info = bc.solve_sbcgrq(op, B, tol=1e-6, max_iter=500)
jax.block_until_ready(X); print(info)
R = np.asarray(op(X) - B, dtype=np.float64)
print("true relres", (np.linalg.norm(R,axis=0)/np.linalg.norm(np.asarray(B,np.float64),axis=0)).max())
EOF

step "bench-headline"
timeout 1200 python bench.py 2>&1 | tee -a "$LOG"

step "config5-capacity-quarter"   # bf16 capacity composition, warm-up size
timeout 1800 python bench_config5.py --scale 0.25 --verify 2>&1 | tee -a "$LOG"

step "config5-capacity-FULL"      # 16.7M rows / k=64 / one chip (r3 item 3)
timeout 3600 python bench_config5.py --scale 1.0 2>&1 | tee -a "$LOG"

step "bench-scattered"
timeout 1800 python bench_scattered.py --n 32768 --k 32 2>&1 | tee -a "$LOG"

step "gather-bound"    # no-locality speed of light (r3 item 6)
timeout 1200 python tools/probe_gather_bound.py --n 16384 --deg 8 --k 32 2>&1 | tee -a "$LOG"

step "overlap-hlo"     # TPU topology compile + async-permute check (r3 item 5)
timeout 1200 python tools/overlap_hlo.py 2>&1 | tee -a "$LOG"

step "deflation-ab"    # wall-time A/B, not just column-passes (r2 weak 4)
timeout 1800 python tools/probe_deflation.py 2>&1 | tee -a "$LOG"

step "probe-links-mxu"
timeout 1200 python tools/probe_links_mxu.py --L 16 2>&1 | tee -a "$LOG"

step "profile-tail"
timeout 1500 python tools/profile_tail.py 23 2>&1 | tee -a "$LOG"

step "bench-presets"
timeout 1800 python bench_cli.py --config all --scale 0.25 2>&1 | tee -a "$LOG"

step "bench-presets-bf16"   # capacity mode throughput vs f32
timeout 1800 python bench_cli.py --config all --scale 0.25 --dtype bf16 2>&1 | tee -a "$LOG"

step "tpu-smoke"
timeout 1800 env BLOCKCG_TEST_TPU=1 python -m pytest tests/ -q 2>&1 | tail -5 | tee -a "$LOG"

step "done"
