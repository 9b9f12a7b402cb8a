#!/bin/bash
# IMP pruning round (mask_best.npz), mirrors train.dtu.pruned.sh
python -m clg_vqa_tpu.cli prune \
  --config_file "${MODEL_CONFIG:-configs/uc2_base.json}" \
  --tasks_config_file "${TASK_CONFIG:-configs/gqa_boxes36.yml}" \
  --from_pretrained "${PRETRAINED:-checkpoints/uc2_pretrained.bin}" \
  --output_dir "${OUT:-out/uc2_imp}" --grad_acc_steps 4 --adam_correct_bias "$@"
