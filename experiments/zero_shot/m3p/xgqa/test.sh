#!/bin/bash
# Zero-shot xGQA eval across languages + scoring, mirrors test.dtu.sh
XGQA=${XGQA:-datasets/xGQA/annotations/few_shot}
for LANG in en bn de id ko pt ru zh; do
  python -m clg_vqa_tpu.cli eval \
    --config_file "${MODEL_CONFIG:-configs/m3p_base.json}" \
    --tasks_config_file "${TASK_CONFIG:-configs/gqa_test_X101.yml}" \
    --from_pretrained "${CKPT:-out/m3p_sft/params_best}" \
    --split "test_${LANG}" \
    --annotations_jsonpath "${XGQA}/${LANG}/test.json" \
    --output_dir "${OUT:-out/m3p_eval}" "$@"
  python -m clg_vqa_tpu.cli score \
    --preds_file "${OUT:-out/m3p_eval}/test_${LANG}_result.json" \
    --truth_file "${XGQA}/${LANG}/test.json"
done
