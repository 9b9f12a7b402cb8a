#!/bin/bash
# IMP pruning round (mask_best.npz), mirrors train.dtu.pruned.sh
python -m clg_vqa_tpu.cli prune \
  --config_file "${MODEL_CONFIG:-configs/m3p_base.json}" \
  --tasks_config_file "${TASK_CONFIG:-configs/gqa_X101.yml}" \
  --from_pretrained "${PRETRAINED:-checkpoints/m3p_pretrained.bin}" \
  --output_dir "${OUT:-out/m3p_imp}" --grad_acc_steps 8 --adam_correct_bias --is_m3p "$@"
