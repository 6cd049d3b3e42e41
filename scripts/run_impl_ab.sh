#!/bin/bash
# Task-metric impl A/B (docs/ACCURACY.md layer 4).
#
#   scripts/run_impl_ab.sh          # CPU tiny matrix (tap3-vs-xla train,
#                                   # f32-vs-bf16 serve, int8 titles)
#   scripts/run_impl_ab.sh --tpu    # real-model matrix on TPU (tap3 vs
#                                   # fused trunk train, int8 vision serve)
#
# Results: markdown table on stdout + impl_ab_{cpu,tpu}.json.
set -e
cd "$(dirname "$0")/.."
MODE=cpu
[ "$1" = "--tpu" ] && MODE=tpu
python tools/impl_ab_eval.py --root "/tmp/ab_corpus_$MODE" "$@" \
    --out_json "impl_ab_$MODE.json"
