#!/bin/bash
# Full-scale rehearsal of the M3P/X101 flagship recipe on the TPU, through
# the CLI: train -> IMP prune -> SFT -> eval -> score, mirroring the
# reference composition experiments/zero_shot/m3p/xgqa/train.dtu.sh
# (grad-acc 8, 100-region X101 features, bs 256, 1842 labels, semantic
# prior lambda 10) -> train_task_prunning.py -> train_task_sft.py ->
# eval_task.py -> scripts/GQA_score.py, at M3P's real 377M-param envelope.
#
# The prune stage additionally validates the documented prunable-set
# divergence (PARITY.md #2: our M3P materializes only the live VQA path,
# so the global L1 threshold runs over the live subset) in vivo at scale.
#
# Corpus: synthetic-at-real-scale X101 format (100 x 2048 regions,
# tools/make_rehearsal_corpus.py --max_regions 100).
#
# Usage:  tools/rehearsal_m3p.sh            (full scale, on the TPU)
#         EPOCHS=2 tools/rehearsal_m3p.sh   (shorter)
set -euo pipefail
cd "$(dirname "$0")/.."

CORPUS=${CORPUS:-/tmp/rehearsal_corpus_m3p}
OUT=${OUT:-/tmp/rehearsal_out_m3p}
EPOCHS=${EPOCHS:-5}
ACC=${ACC:-8}
MODEL_CONFIG=${MODEL_CONFIG:-configs/m3p_base.json}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}

if [ ! -f "$CORPUS/task.yml" ]; then
  python tools/make_rehearsal_corpus.py --out "$CORPUS" --max_regions 100 \
    --eval_batch_size 1024 ${CORPUS_ARGS:-}
fi
TASK="$CORPUS/task.yml"
COMMON=(--config_file "$MODEL_CONFIG" --tasks_config_file "$TASK" \
        --is_m3p --seed 0)

mkdir -p "$OUT"
echo "=== stage 1/5: M3P fine-tune (semantic prior + CDM) ==="
python -m clg_vqa_tpu.cli train "${COMMON[@]}" --output_dir "$OUT/train" \
  --grad_acc_steps "$ACC" --adam_correct_bias --num_epoch "$EPOCHS" \
  --save_every "${SAVE_EVERY:-5}" --code_mixing 2>&1 | tee "$OUT/train.log"

echo "=== stage 2/5: IMP prune (live-subset threshold, PARITY.md #2) ==="
python -m clg_vqa_tpu.cli prune "${COMMON[@]}" --output_dir "$OUT/prune" \
  --grad_acc_steps "$ACC" --adam_correct_bias --num_epoch "$EPOCHS" \
  --save_every "${SAVE_EVERY:-5}" --code_mixing 2>&1 | tee "$OUT/prune.log"

echo "=== stage 3/5: SFT from mask_best ==="
python -m clg_vqa_tpu.cli sft "${COMMON[@]}" --output_dir "$OUT/sft" \
  --grad_acc_steps "$ACC" --adam_correct_bias --num_epoch "$EPOCHS" \
  --save_every "${SAVE_EVERY:-5}" --code_mixing \
  --mask_file "$OUT/prune/mask_best.npz" 2>&1 | tee "$OUT/sft.log"

echo "=== stage 4/5: eval (SFT best checkpoint, bs 1024 fused-attn path) ==="
python -m clg_vqa_tpu.cli eval --config_file "$MODEL_CONFIG" \
  --tasks_config_file "$TASK" --is_m3p \
  --from_pretrained "$OUT/sft/params_best" \
  --split test --output_dir "$OUT/eval" 2>&1 | tee "$OUT/eval.log"

echo "=== stage 5/5: score ==="
python -m clg_vqa_tpu.cli score --preds_file "$OUT/eval/test_result.json" \
  --truth_file "$CORPUS/dataroot/testdev_balanced_questions.json" 2>&1 \
  | tee "$OUT/score.log"

echo "=== M3P rehearsal complete; artifacts in $OUT ==="
