#!/bin/bash
# Full-scale rehearsal of the COMPLETE recipe on the TPU, through the CLI:
#   train -> IMP prune -> SFT -> eval -> score
# mirroring the reference composition train_task.py:141-389 ->
# train_task_prunning.py:548-877 -> train_task_sft.py:331-612 ->
# eval_task.py:96-213 -> scripts/GQA_score.py, at the real compute envelope
# (UC2 281M params, bs 256, 1842 labels, semantic prior lambda 10, MUSE CDM).
#
# The corpus is synthetic-at-real-scale (tools/make_rehearsal_corpus.py):
# real 1842-answer vocab + real MUSE dictionaries, templated English
# questions with the answer embedded (so train accuracy climbs), 36x2048
# region features in the exact extractor output format.
#
# Usage:  tools/rehearsal.sh            (full scale, on the TPU)
#         EPOCHS=2 tools/rehearsal.sh   (shorter)
#         MODEL_CONFIG=... CORPUS_ARGS="--n_train 2048 ..." for smoke runs
set -euo pipefail
cd "$(dirname "$0")/.."

CORPUS=${CORPUS:-/tmp/rehearsal_corpus}
OUT=${OUT:-/tmp/rehearsal_out}
EPOCHS=${EPOCHS:-5}
ACC=${ACC:-4}
MODEL_CONFIG=${MODEL_CONFIG:-configs/uc2_base.json}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}

if [ ! -f "$CORPUS/task.yml" ]; then
  python tools/make_rehearsal_corpus.py --out "$CORPUS" ${CORPUS_ARGS:-}
fi
TASK="$CORPUS/task.yml"
COMMON=(--config_file "$MODEL_CONFIG" --tasks_config_file "$TASK" --seed 0)

echo "=== stage 1/5: fine-tune (semantic prior + CDM) ==="
python -m clg_vqa_tpu.cli train "${COMMON[@]}" --output_dir "$OUT/train" \
  --grad_acc_steps "$ACC" --adam_correct_bias --num_epoch "$EPOCHS" --save_every "${SAVE_EVERY:-5}" --code_mixing 2>&1 \
  | tee "$OUT.train.log" || { mkdir -p "$OUT"; mv "$OUT.train.log" "$OUT/"; exit 1; }
mkdir -p "$OUT"; mv "$OUT.train.log" "$OUT/train.log"

echo "=== stage 2/5: IMP prune ==="
python -m clg_vqa_tpu.cli prune "${COMMON[@]}" --output_dir "$OUT/prune" \
  --grad_acc_steps "$ACC" --adam_correct_bias --num_epoch "$EPOCHS" --save_every "${SAVE_EVERY:-5}" --code_mixing 2>&1 \
  | tee "$OUT/prune.log"

echo "=== stage 3/5: SFT from mask_best ==="
python -m clg_vqa_tpu.cli sft "${COMMON[@]}" --output_dir "$OUT/sft" \
  --grad_acc_steps "$ACC" --adam_correct_bias --num_epoch "$EPOCHS" --save_every "${SAVE_EVERY:-5}" --code_mixing \
  --mask_file "$OUT/prune/mask_best.npz" 2>&1 | tee "$OUT/sft.log"

echo "=== stage 4/5: eval (SFT best checkpoint) ==="
python -m clg_vqa_tpu.cli eval --config_file "$MODEL_CONFIG" \
  --tasks_config_file "$TASK" --from_pretrained "$OUT/sft/params_best" \
  --split test --output_dir "$OUT/eval" 2>&1 | tee "$OUT/eval.log"

echo "=== stage 5/5: score ==="
python -m clg_vqa_tpu.cli score --preds_file "$OUT/eval/test_result.json" \
  --truth_file "$CORPUS/dataroot/testdev_balanced_questions.json" 2>&1 \
  | tee "$OUT/score.log"

echo "=== rehearsal complete; artifacts in $OUT ==="
