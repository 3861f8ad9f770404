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
# the paper's grid is seeds 1-5; override with SEEDS="..." for smoke runs
for OPTIM_SEED in ${SEEDS:-1 2 3 4 5}; do
  export OPTIM_SEED
  python "run_main_${PARADIGM}.py" --model_config "${MODEL}_config.yml" \
    --learning_paradigm "$PARADIGM"
done
