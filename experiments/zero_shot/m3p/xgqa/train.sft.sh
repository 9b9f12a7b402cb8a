#!/bin/bash
# Sparse fine-tune from mask_best.npz, mirrors train.dtu.sft.sh
python -m clg_vqa_tpu.cli sft \
  --config_file "${MODEL_CONFIG:-configs/m3p_base.json}" \
  --tasks_config_file "${TASK_CONFIG:-configs/gqa_X101.yml}" \
  --from_pretrained "${PRETRAINED:-checkpoints/m3p_pretrained.bin}" \
  --mask_file "${MASK:-out/m3p_imp/mask_best.npz}" \
  --output_dir "${OUT:-out/m3p_sft}" --grad_acc_steps 8 --adam_correct_bias --is_m3p --code_mixing "$@"
