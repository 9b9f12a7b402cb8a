#!/bin/bash
# UC2 GQA fine-tune with semantic prior (+CDM via --code_mixing)
# Mirrors experiments/zero_shot/uc2/xgqa/train.dtu.sh of the reference.
MODEL_CONFIG=${MODEL_CONFIG:-configs/uc2_base.json}
TASK_CONFIG=${TASK_CONFIG:-configs/gqa_boxes36.yml}
PRETRAINED=${PRETRAINED:-checkpoints/uc2_pretrained.bin}
OUT=${OUT:-out/uc2_gqa}
python -m clg_vqa_tpu.cli train \
  --config_file "$MODEL_CONFIG" --tasks_config_file "$TASK_CONFIG" \
  --from_pretrained "$PRETRAINED" --output_dir "$OUT" \
  --grad_acc_steps 4 --adam_correct_bias --seed "${SEED:-0}" "$@"
