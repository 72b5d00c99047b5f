#!/bin/bash
# Round-5 hardware measurement harvest (VERDICT r4 items 1,2,3,6,7,8).
# The axon tunnel wedges for 20min-5h at a time; when it is healthy,
# run phases back-to-back so one healthy window harvests everything.
# Each phase logs to /tmp/r5_<phase>.log and runs under a timeout that
# EXCEEDS the worst-case fresh compile (killing a worker mid-compile
# wedges the tunnel — CLAUDE.md round-4 notes).
#
# Usage: scripts/r5_harvest.sh <phase>   (phase: bench moments attn
#        roofline serving concurrent criteo)
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_deepfm
export PYTHONPATH=/root/.axon_site:.

phase="${1:?phase}"
log="/tmp/r5_${phase}.log"

case "$phase" in
  bench)
    # Live three-model bench; refreshes .bench_last_good.json so a
    # wedged driver window replays CURRENT-code numbers.
    DEEPFM_BENCH_BUDGET_S=3600 timeout 4000 python bench.py 2>&1 | tee "$log"
    ;;
  moments)
    timeout 3600 python scripts/bench_moments_ab.py \
      --json outputs/moments_step_ab/results.json 2>&1 | tee "$log"
    ;;
  attn)
    timeout 2400 python scripts/bench_attention_smajor_ab.py \
      --fields 8 16 \
      --json outputs/attention_smajor_ab/results.json 2>&1 | tee "$log"
    ;;
  roofline)
    timeout 2400 python scripts/profile_step.py --model deepfm \
      2>&1 | tee "$log"
    timeout 2400 python scripts/profile_step.py --model xdeepfm \
      2>&1 | tee -a "$log"
    ;;
  serving)
    # needs a trained experiment: outputs/deepfm_movielens (CPU-trained
    # is fine — checkpoints are backend-portable)
    timeout 1800 python scripts/serving_latency.py \
      --data-dir data/ml-100k --out-dir outputs/deepfm_movielens \
      --json outputs/serving_latency_r5/results.json 2>&1 | tee "$log"
    timeout 1800 python scripts/serving_latency.py --quantize int8 \
      --data-dir data/ml-100k --out-dir outputs/deepfm_movielens \
      --json outputs/serving_latency_r5/results_int8.json 2>&1 | tee -a "$log"
    ;;
  concurrent)
    timeout 1800 python scripts/serving_concurrent.py \
      --data-dir data/ml-100k --out-dir outputs/deepfm_movielens \
      --json outputs/serving_concurrent/results.json 2>&1 | tee "$log"
    ;;
  criteo)
    timeout 3600 python -m deepfm_tpu train \
      --config configs/deepfm_criteo_packed.yaml 2>&1 | tee "$log"
    ;;
  tputests)
    # on-hardware exactness suite (engagement-vs-lowered-HLO assertions)
    timeout 3600 python -m pytest tests_tpu/ -q -m tpu 2>&1 | tee "$log"
    ;;
  *)
    echo "unknown phase $phase" >&2; exit 2 ;;
esac
