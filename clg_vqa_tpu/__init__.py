"""CLG-VQA-TPU: TPU-native cross-lingual VQA framework.

Public API surface (see README.md / PARITY.md):
  configs   — clg_vqa_tpu.config.{UC2Config, M3PConfig, TaskConfig, OptimConfig}
  models    — clg_vqa_tpu.models.{uc2, m3p, pretrain}, models.detector.*
  data      — clg_vqa_tpu.data.{cfs, gqa, code_mix, prior, pipeline,
              device_bank, convert_store}
  training  — clg_vqa_tpu.train.{driver, loop, optim, pruning, checkpoints}
  eval      — clg_vqa_tpu.eval.{runner, scorer, predictor}
  ops       — clg_vqa_tpu.ops.{nms, roi, roi_pallas, attention,
              semantic_prior, pretrain_losses}
  parallel  — clg_vqa_tpu.parallel.{mesh, distributed}
  CLI       — python -m clg_vqa_tpu.cli {train,prune,sft,eval,score,convert,
              extract,convert-store}
"""

__version__ = "0.1.0"
