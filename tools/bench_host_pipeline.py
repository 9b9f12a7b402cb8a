"""Host input-pipeline throughput: hash vs FULL 250k Unigram tokenizer.

Reproduces the docs/PERFORMANCE.md "Host input pipeline" measurement
(400-image CFS store, 20k QA, CDM code-mixing, background prefetch) and
answers the round-4 verdict risk directly: does host batch assembly still
outrun the device step when tokenization is real sentencepiece instead of
the FNV hash? Under CDM every epoch re-mixes the question text, so
GQADataset re-tokenizes per batch (data/gqa.py:135-143) — the tokenizer
is on the steady-state path, not just at load.

Host-only: drains TrainPipeline.epoch() with device_put=False (no chip
needed), reporting QA/s and ms/step-of-256 per tokenizer arm.

Usage: python tools/bench_host_pipeline.py [--corpus /tmp/tok_corpus]
       [--tok-dir /tmp/fullsize_xlmr_tok] [--steps 60]
"""
import argparse
import dataclasses
import os
import sys
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/tok_corpus")
    ap.add_argument("--tok-dir", default="/tmp/fullsize_xlmr_tok")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--acc", type=int, default=2)
    ap.add_argument("--mbs", type=int, default=128)
    args = ap.parse_args()

    from clg_vqa_tpu.config import UC2Config, TaskConfig
    from clg_vqa_tpu.cli import common as C
    from clg_vqa_tpu.data.pipeline import TrainPipeline

    cfg = UC2Config.from_json("configs/uc2_base.json")
    task_cfg = TaskConfig.from_yaml(os.path.join(args.corpus, "task.yml"))
    task_cfg = dataclasses.replace(task_cfg, code_mixing=True)

    arms = [("hash", "hash")]
    if os.path.isdir(args.tok_dir):
        arms.append(("full-250k-unigram", args.tok_dir))
    else:
        print(f"note: {args.tok_dir} missing — run "
              f"tools/make_fullsize_tokenizer.py first")

    qa = args.acc * args.mbs
    print(f"corpus {args.corpus}, {args.steps} steps of "
          f"{args.acc}x{args.mbs}, CDM on, with_features=True\n")
    print(f"{'tokenizer':20s} {'QA/s host':>10s} {'ms/step':>8s}")
    for label, tok in arms:
        ns = types.SimpleNamespace(tokenizer=tok, annotations_jsonpath="",
                                   val_annotations_jsonpath="")
        mixer = C.build_code_mixer(task_cfg, 0)
        ds = C.build_dataset(ns, cfg, task_cfg, task_cfg.train_split,
                             task_cfg.features_path_train, code_mixer=mixer)
        pipe = TrainPipeline(ds, micro_batch_size=args.mbs,
                             grad_acc_steps=args.acc, seed=0,
                             device_put=False)
        it = pipe.epoch(0)
        next(it)                                    # warm caches/threads
        t0 = time.perf_counter()
        n = 0
        for batch in it:
            n += 1
            if n >= args.steps:
                break
        dt = time.perf_counter() - t0
        qps = n * qa / dt
        print(f"{label:20s} {qps:10.0f} {qa / qps * 1e3 * 256 / qa:8.1f}")
        it.close()


if __name__ == "__main__":
    main()
