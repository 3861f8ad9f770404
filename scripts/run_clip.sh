#!/bin/bash
# Zero-shot CLIP eval over the FRAMED datasets (reference scripts/run_clip.sh).
export OPTIM_SEED="${OPTIM_SEED:-1}"
export VIS_ENCODER="${VIS_ENCODER:-ViT-B/32}"
export SPLIT_SEED="${SPLIT_SEED:-500}"
export MODEL=clip_baseline
export DATASET_DIR="${DATASET_DIR:?set DATASET_DIR}"
# reference loops the six FRAMED datasets; override with DATASETS="A B ...".
# set -f: no pathname expansion of the list; the non-empty check catches a
# set-but-blank DATASETS that would otherwise run zero iterations and exit 0.
set -f
DATASETS="${DATASETS:-Flowers102 RESICS45 FGVCAircraft MNIST EuroSAT DTD}"
if [ -z "${DATASETS//[[:space:]]/}" ]; then
  echo "DATASETS is set but empty; nothing to run" >&2
  exit 1
fi
for DATASET_NAME in $DATASETS; do
  export DATASET_NAME
  python run_main_clip.py --model_config clip_config.yml --learning_paradigm "${1:-ssl}"
done
