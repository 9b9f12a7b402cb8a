#!/bin/bash
# Sparse fine-tune from mask_best.npz, mirrors train.dtu.sft.sh
python -m clg_vqa_tpu.cli sft \
  --config_file "${MODEL_CONFIG:-configs/uc2_base.json}" \
  --tasks_config_file "${TASK_CONFIG:-configs/gqa_boxes36.yml}" \
  --from_pretrained "${PRETRAINED:-checkpoints/uc2_pretrained.bin}" \
  --mask_file "${MASK:-out/uc2_imp/mask_best.npz}" \
  --output_dir "${OUT:-out/uc2_sft}" --grad_acc_steps 4 --adam_correct_bias --code_mixing "$@"
