"""Zero-shot evaluation runner — the reference's eval_task.py flow
(eval_task.py:96-213 + task_utils.py:716-841 VL-classifier-GQA branch):
batched jitted forward, argmax over the answer space, write
``{split}_result.json`` records {"questionId", "prediction"}.
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def run_eval(forward: Callable, params, cfg, dataset, label2ans: list, *,
             batch_size: int = 256, compute_dtype=jnp.bfloat16,
             out_path: str | None = None, split: str = "test",
             log_every: int = 0, device_bank=None) -> dict:
    """Returns {"results": [...], "n": int, "qa_per_sec": float,
    "accuracy": float | None (if the dataset has labels)}.

    device_bank: optional data.device_bank.DeviceFeatureBank — features are
    then gathered on device by index (no per-batch feature upload)."""

    @jax.jit
    def step(params, batch):
        if device_bank is not None:
            f, l, m = device_bank.lookup(batch.pop("store_idx"))
            batch = {**batch, "features": f, "locs": l, "image_mask": m}
        logits = forward(params, cfg, batch, deterministic=True,
                         compute_dtype=compute_dtype)
        return jnp.argmax(logits, axis=-1)

    results = []
    n_total = 0
    n_correct = 0
    n_labeled = 0
    t0 = time.time()
    for batch in dataset.iter_batches(batch_size,
                                      with_features=device_bank is None):
        host_qids = batch.pop("question_id")
        valid = batch.pop("valid")
        has_label = batch.pop("has_label")
        labels = batch.pop("labels")
        preds = np.asarray(step(params, {
            k: jnp.asarray(v) for k, v in batch.items()}))
        for j in range(len(preds)):
            if valid[j] == 0:
                continue
            results.append({"questionId": str(host_qids[j]),
                            "prediction": label2ans[int(preds[j])]})
            n_total += 1
            if has_label[j]:
                n_correct += int(labels[j] == preds[j])
                n_labeled += 1
        if log_every and n_total % log_every < batch_size:
            print(f"  eval {n_total}/{len(dataset)}")
    dt = time.time() - t0

    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(results, f)
    return {
        "results": results, "n": n_total,
        "qa_per_sec": n_total / dt if dt > 0 else float("inf"),
        "accuracy": (n_correct / n_labeled) if n_labeled else None,
        "out_path": out_path,
    }
