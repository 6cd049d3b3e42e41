#!/bin/bash
# Round-3 TPU measurement queue — run when the axon tunnel is back.
# ONE TPU process at a time (CLAUDE.md); everything below is sequential.
# Usage: bash scripts/tpu_measure_r3.sh [outdir]   (default /tmp/r3_measure)
set -u
OUT=${1:-/tmp/r3_measure}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name, timeout_s, cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "exit=$? tail:"; tail -3 "$OUT/$name.log"
}

# 1. Does the new kernel set COMPILE on real TPU at the entry shapes?
#    (chain kernels + planar links + fusedtrain have never met Mosaic.)
run entry_compile 1200 python -c "import __graft_entry__ as g; fn, args = g.entry(); import jax; print(jax.jit(fn).lower(*args).compile() and 'COMPILED')"

# 2. Inference: chain kernels A/B (per-HLO profile is the only valid
#    comparator) + headline bench.
run profile_chain   1200 python tools/profile_model.py --s2d
run profile_nochain 1200 python tools/profile_model.py --s2d --nochain
run bench           1200 python bench.py

# 3. Training: fusedtrain vs tap3 at the round-2 winner config (bf16 B=8).
#    AOT memory analysis (tools/aot_compile.py) estimates ~14.3GB temp for
#    fusedtrain at B=8 — near the v5e 16GB ceiling — so B=4 is queued as
#    the OOM fallback.
run train_tap3      1800 python bench_train.py --impl tap3 --b 8
run train_fused     1800 python bench_train.py --impl fusedtrain --b 8
run train_fused_b4  1800 python bench_train.py --impl fusedtrain --b 4
run profile_train_fused 1800 python tools/profile_train.py --impl fusedtrain --dtype bf16

echo "=== done; logs in $OUT ==="
