#!/bin/bash
# Prompt-tuning launcher (reference scripts/run_prompts_{ssl,ul,trzsl}.sh).
# Usage: MODEL=grip_textual DATASET_NAME=EuroSAT DATASET_DIR=... ./scripts/run_prompts.sh ssl
PARADIGM="${1:-ssl}"
export OPTIM_SEED="${OPTIM_SEED:-1}"
export VIS_ENCODER="${VIS_ENCODER:-ViT-B/32}"
export SPLIT_SEED="${SPLIT_SEED:-500}"
export MODEL="${MODEL:?set MODEL (e.g. textual_prompt, grip_visual)}"
export DATASET_NAME="${DATASET_NAME:?set DATASET_NAME}"
export DATASET_DIR="${DATASET_DIR:?set DATASET_DIR}"
case "$MODEL" in
  *textual*) CFG="${MODEL}_config.yml";;
  *visual*)  CFG="${MODEL}_config.yml";;
  *multimodal*) CFG="${MODEL}_config.yml";;
  grip_*) CFG="${MODEL}_config.yml";;
  *) CFG="${MODEL}_config.yml";;
esac
python "run_main_${PARADIGM}.py" --model_config "$CFG" --learning_paradigm "$PARADIGM"
