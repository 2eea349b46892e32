#!/bin/bash
# Execute the whole TPU measurement runbook (scripts/TPU_RUNBOOK.md)
# sequentially, each item in a fresh process, logging to $OUT.
# Run ONLY when the axon tunnel is up and nothing heavy is running:
#     bash scripts/tpu_session.sh
OUT=${OUT:-/tmp/tpu_session_$(date +%H%M%S).log}
cd "$(dirname "$0")/.." || exit 1
echo "logging to $OUT"
run() {
    echo "=== $* ===" | tee -a "$OUT"
    timeout "${STEP_TIMEOUT:-3000}" env "$@" 2>&1 | tail -20 >> "$OUT"
    echo "--- rc=$? ---" >> "$OUT"
}

# 0. tunnel sanity (fast fail if the TPU is unreachable)
timeout 300 python - <<'EOF' || { echo "TPU unreachable"; exit 1; }
import jax
assert jax.devices()[0].platform != "cpu"
import jax.numpy as jnp
x = jnp.ones((256, 256))
float((x @ x)[0, 0])
print("tunnel ok")
EOF

# 1. CholeskyQR microbench: inverse (default) vs solve body vs 2 rounds
run python scripts/microbench_chqr.py
run PYTDSCF_CHQR_SOLVE=1 python scripts/microbench_chqr.py
run PYTDSCF_CHQR_ITERS=2 python scripts/microbench_chqr.py

# 1b. chi=1024 with 2-round CholeskyQR (populations must match run 2)
run BENCH_STEPS=10 PYTDSCF_CHQR_ITERS=2 python bench_chi.py

# 2. chi=1024 north star, CHQR-inverse only
run BENCH_STEPS=10 python bench_chi.py

# 3. relaxed Krylov A/B (populations must match run 2 to <=1e-5)
run BENCH_STEPS=10 BENCH_RELAX=1 python bench_chi.py

# 3b. pallas-fused relaxed matvec (may fail to lower in Mosaic — that is
#     itself the measurement; keep only if >=5% faster than run 3)
run BENCH_STEPS=10 BENCH_RELAX=1 BENCH_PALLAS=1 python bench_chi.py

# 4. chi=2048 with the round-3 config (add BENCH_RELAX=1 if 3 was clean)
run BENCH_CHI=2048 BENCH_RP_NUC=6 BENCH_KRYLOV=8 BENCH_SCAN=0 python bench_chi.py

# 5. 184-site driver bench (median-of-blocks)
run python bench.py

# 6. H2CO driver loop with the round-3c desync levers
run python scripts/h2co_bench.py
run H2CO_STRIDE=1 python scripts/h2co_bench.py

echo "done; results in $OUT"
