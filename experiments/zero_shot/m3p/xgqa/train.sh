#!/bin/bash
# UC2 GQA fine-tune with semantic prior (+CDM via --code_mixing)
# Mirrors experiments/zero_shot/m3p/xgqa/train.dtu.sh of the reference.
MODEL_CONFIG=${MODEL_CONFIG:-configs/m3p_base.json}
TASK_CONFIG=${TASK_CONFIG:-configs/gqa_X101.yml}
PRETRAINED=${PRETRAINED:-checkpoints/m3p_pretrained.bin}
OUT=${OUT:-out/m3p_gqa}
python -m clg_vqa_tpu.cli train \
  --config_file "$MODEL_CONFIG" --tasks_config_file "$TASK_CONFIG" \
  --from_pretrained "$PRETRAINED" --output_dir "$OUT" \
  --grad_acc_steps 8 --adam_correct_bias --is_m3p --seed "${SEED:-0}" "$@"
