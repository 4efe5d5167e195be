#!/bin/bash
# One-shot hardware re-measure after the round-2 continuation changes
# (shared object tensor, masked luma, wide-accumulation path). Run when
# the dev-tunnel TPU returns; each step is bounded so a wedged device
# can't hang the batch. Results land in /tmp/hw_refresh/.
set -u
OUT=${1:-/tmp/hw_refresh}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

# bench.py's backend-init watchdog must fire BEFORE the outer timeouts
# kill the process, or the honest JSON error line is never written
# (default is 900 s; the smallest outer bound below is 420 s).
export ITPU_BACKEND_INIT_TIMEOUT_S=${ITPU_BACKEND_INIT_TIMEOUT_S:-300}

probe() {
  # cold-process backend warmup alone has measured 151 s, and the
  # tunnel's sluggish-evening mode pushed one past 300 s (it recovered;
  # a single-shot 300 s probe aborted a half-finished batch that day) —
  # so: one generous attempt, one retry, then give up.
  for bound in 420 420; do
    timeout "$bound" python -c "import jax, jax.numpy as jnp; print('tpu:', jax.jit(lambda v: (v*2).sum())(jnp.arange(8.0)))" && return 0
    echo "probe attempt timed out after ${bound}s; retrying" >&2
  done
  echo "TPU unreachable; aborting refresh"; exit 1
}

probe

# 1. headline at the default batch, twice (stability check)
timeout 600 python bench.py > "$OUT/bench_default_a.json" 2> "$OUT/bench_default_a.log"
timeout 600 python bench.py > "$OUT/bench_default_b.json" 2> "$OUT/bench_default_b.log"

# 2. the old resource wall: shared objects removed ~3.7 GB of duplicated
#    HBM, so 512 may now fit (and 640 beyond it). The phase watchdog
#    inside bench.py (240 s per device phase) fires FIRST and writes one
#    JSON line naming the stalled phase + the expected live-HBM model;
#    the outer timeout is only the belt over that.
ITPU_BENCH_DEADLINE_SCALE=0.6 timeout 1500 \
  python bench.py --batch 512 > "$OUT/bench_512.json" 2> "$OUT/bench_512.log"
ITPU_BENCH_DEADLINE_SCALE=0.6 timeout 1500 \
  python bench.py --batch 640 > "$OUT/bench_640.json" 2> "$OUT/bench_640.log"

probe  # 512/640 may wedge the tunnel; stop cleanly if so

# 3. the 4K sweep + multi-ratio configs on the items-15-24 kernel.
# Copy results.json only on success: a killed/failed run leaves the
# committed pre-refresh file in place, which must not masquerade as the
# re-measure.
if timeout 900 python benchmarks/run_all.py > "$OUT/run_all.log" 2>&1; then
  cp benchmarks/results.json "$OUT/results.json" 2>/dev/null || true
else
  echo "run_all.py failed or timed out; results.json NOT copied" >> "$OUT/run_all.log"
fi

# 4. identity workload + hardware numerics validation
timeout 600 python benchmarks/identity_bench.py --batch 64 > "$OUT/identity.log" 2>&1 || true
timeout 900 python benchmarks/validate_hw.py --random-trials 12 > "$OUT/validate_hw.log" 2>&1 || true

# 4b. the examples suite on the real chip (compiled, not interpret):
#     01/02 exercise the engine + fused batch paths end-to-end on hardware
timeout 420 python examples/01_compose.py > "$OUT/example01.log" 2>&1 || true
timeout 420 python examples/02_batch_ratios.py > "$OUT/example02.log" 2>&1 || true

# 5. serving load + streaming TTFB on the real device
if timeout 900 python benchmarks/serve_bench.py --out "$OUT/serving_results.json" > "$OUT/serve_bench.log" 2>&1; then
  cp "$OUT/serving_results.json" benchmarks/serving_results.json 2>/dev/null || true
else
  echo "serve_bench.py failed or timed out" >> "$OUT/serve_bench.log"
fi

echo "refresh complete: $OUT"
ls -la "$OUT"
