#!/bin/bash
# Multi-seed protocol: the paper reports accuracies averaged over 5 optim
# seeds (reference README "Results"). Runs one MODEL/DATASET across seeds;
# results accumulate as JSONL lines in results_model_$MODEL.json.
PARADIGM="${1:-ssl}"
export VIS_ENCODER="${VIS_ENCODER:-ViT-B/32}"
export SPLIT_SEED="${SPLIT_SEED:-500}"
export MODEL="${MODEL:?set MODEL}"
export DATASET_NAME="${DATASET_NAME:?set DATASET_NAME}"
export DATASET_DIR="${DATASET_DIR:?set DATASET_DIR}"
# seeds share every program shape: persist compiles across the 5 runs
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-${TMPDIR:-/tmp}/menghini_tpu_jax_cache}"
# refuse to burn a whole seed grid on a misconfigured host (random weights,
# missing BPE merges, no accelerator, missing dataset dir). DOCTOR_SKIP=1
# bypasses the gate for deliberate throughput-only / CPU smoke runs.
if [ "${DOCTOR_SKIP:-0}" != "1" ]; then
  python -m menghini_neurips23_tpu.doctor --strict || {
    echo "doctor --strict failed; fix the host or set DOCTOR_SKIP=1" >&2
    exit 1
  }
fi
# the paper's grid is seeds 1-5; override with SEEDS="..." for smoke runs.
# set -f: no pathname expansion of the list; the non-empty check catches a
# set-but-blank SEEDS that would otherwise run zero iterations and exit 0.
set -f
SEEDS="${SEEDS:-1 2 3 4 5}"
if [ -z "${SEEDS//[[:space:]]/}" ]; then
  echo "SEEDS is set but empty; nothing to run" >&2
  exit 1
fi
for OPTIM_SEED in $SEEDS; do
  export OPTIM_SEED
  python "run_main_${PARADIGM}.py" --model_config "${MODEL}_config.yml" \
    --learning_paradigm "$PARADIGM"
done
