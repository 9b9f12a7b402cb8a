"""Zero-shot evaluation runner — the reference's eval_task.py flow
(eval_task.py:96-213 + task_utils.py:716-841 VL-classifier-GQA branch):
batched jitted forward, argmax over the answer space, write
``{split}_result.json`` records {"questionId", "prediction"}.
"""
from __future__ import annotations

import json
import os
import time
from collections import deque
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def make_predict_step(forward: Callable, cfg, *, device_bank=None,
                      compute_dtype=jnp.bfloat16,
                      fused_attn: bool = False) -> Callable:
    """Jitted (params, batch) -> argmax predictions. Build ONCE and reuse
    across run_eval calls so compilation is paid a single time.

    Bank tensors are threaded as jit ARGUMENTS (not closure constants): a
    closed-over bank is embedded in the program and shipped with every
    remote-compile request — HTTP 413 at X101 bank sizes (328 MB).

    fused_attn: route attention through the Pallas VMEM kernel — wins at
    eval batch sizes (bs>=512) where the [B,H,S,S] probs otherwise ride HBM
    (docs/PERFORMANCE.md eval profile); keep off for small serving batches."""
    step = jax.jit(_predict_body(forward, cfg, compute_dtype, fused_attn))
    bank = device_bank.tensors() if device_bank is not None else None
    return lambda params, batch: step(params, batch, bank)


def _predict_body(forward, cfg, compute_dtype, fused_attn):
    """The one (params, batch, bank) -> argmax step body shared by the
    single-chip and sharded predict steps (divergent copies previously
    had to be edited in lockstep)."""

    def step(params, batch, bank):
        if bank is not None:
            from ..data.device_bank import DeviceFeatureBank
            f, l, m = DeviceFeatureBank.gather_from(
                bank, batch.pop("store_idx"))
            batch = {**batch, "features": f, "locs": l, "image_mask": m}
        kw = {"fused_attn": fused_attn} if fused_attn else {}
        logits = forward(params, cfg, batch, deterministic=True,
                         compute_dtype=compute_dtype, **kw)
        return jnp.argmax(logits, axis=-1)

    return step


def shard_predict_step(forward: Callable, cfg, mesh, params_example,
                       batch_example, *, device_bank=None,
                       compute_dtype=jnp.bfloat16,
                       fused_attn: bool = False) -> Callable:
    """Multi-chip make_predict_step: batch sharded over the mesh's dp axis,
    params laid out with the Megatron mp pspecs (parallel/mesh.py), so the
    same jitted step serves/evaluates across a pod slice. The reference's
    eval uses apex DDP replication (eval_task.py:164-173); here GSPMD
    shards one program instead. Predictions come back dp-sharded and are
    gathered on fetch.

    batch_example: a pytree with the final per-call batch structure (used
    only for sharding layout; ``store_idx`` batches work with device_bank
    the same as the single-chip step).

    fused_attn="flat" is supported under the mesh: the flat Pallas eval
    kernel shard_maps itself over (dp, mp-head-groups) whenever this step
    is traced — ops/attention.gspmd_attention, entered here around every
    call. The blocked kernel (fused_attn=True) stays single-chip-only."""
    if fused_attn and fused_attn != "flat":
        raise ValueError(
            "shard_predict_step supports fused_attn='flat' (shard_mapped "
            "over the mesh) or False; the blocked/hm/proj/sm kernels are "
            "single-chip opt-ins with no GSPMD partitioning rule.")
    from ..parallel import mesh as pm
    step = _predict_body(forward, cfg, compute_dtype, fused_attn)

    from jax.sharding import NamedSharding, PartitionSpec as P
    bank = device_bank.tensors() if device_bank is not None else None
    bank_sh = None if bank is None else tuple(
        pm.replicated(mesh) for _ in bank)
    jitted = jax.jit(
        step,
        in_shardings=(pm.param_shardings(mesh, params_example),
                      pm.batch_shardings(mesh, batch_example), bank_sh),
        out_shardings=NamedSharding(mesh, P("dp")))

    def call(params, batch):
        from ..ops.attention import gspmd_attention
        with gspmd_attention(mesh):
            return jitted(params, batch, bank)

    return call


def run_eval(forward: Callable, params, cfg, dataset, label2ans: list, *,
             batch_size: int = 256, compute_dtype=jnp.bfloat16,
             out_path: str | None = None, split: str = "test",
             log_every: int = 0, device_bank=None, depth: int = 2,
             step: Callable | None = None,
             fused_attn: bool | None = None) -> dict:
    """Returns {"results": [...], "n": int, "qa_per_sec": float,
    "accuracy": float | None (if the dataset has labels)}.

    device_bank: optional data.device_bank.DeviceFeatureBank — features are
    then gathered on device by index (no per-batch feature upload).
    step: optional prebuilt make_predict_step result (reuse avoids
    re-jitting across splits/languages).
    fused_attn: None = auto (Pallas attention for bf16 eval at bs>=512,
    where it measures +30% on M3P — docs/PERFORMANCE.md; XLA otherwise,
    incl. fp32 parity mode).

    Pipelined: jax dispatch is async, so up to ``depth`` batches stay in
    flight and host batch assembly (tokenize/gather) overlaps device
    compute; only the prediction fetch of the oldest batch blocks. The
    reference eval loop is fully synchronous (eval_task.py:183-201)."""
    if step is None:
        if fused_attn is None:
            # bf16 only: an explicit f32/f16 compute_dtype must take the
            # XLA parity path, not the Pallas kernel's numeric family.
            # "flat" = the flat-boundary kernel (heads looped in-kernel,
            # no split/merge transposes): same-day eval A/B at bs1024 —
            # M3P 3418 vs 2527 (blocked) vs 1951 (XLA) QA/s, UC2 5258 vs
            # 4365 vs 4254 (docs/PERFORMANCE.md round 4 eval table)
            fused_attn = ("flat" if (compute_dtype == jnp.bfloat16
                                     and batch_size >= 512
                                     and jax.default_backend() == "tpu")
                          else False)
        step = make_predict_step(forward, cfg, device_bank=device_bank,
                                 compute_dtype=compute_dtype,
                                 fused_attn=fused_attn)

    results = []
    n_total = 0
    n_correct = 0
    n_labeled = 0

    def consume(host_qids, valid, has_label, labels, preds_dev):
        nonlocal n_total, n_correct, n_labeled
        preds = np.asarray(preds_dev)
        keep = valid != 0
        lab = (has_label != 0) & keep
        n_total += int(keep.sum())
        n_labeled += int(lab.sum())
        n_correct += int((labels[lab] == preds[lab]).sum())
        results.extend(
            {"questionId": str(q), "prediction": label2ans[int(p)]}
            for q, p in zip(host_qids[keep], preds[keep]))
        if log_every and n_total % log_every < batch_size:
            print(f"  eval {n_total}/{len(dataset)}")

    t0 = time.time()
    inflight: deque = deque()
    for batch in dataset.iter_batches(batch_size,
                                      with_features=device_bank is None):
        host_qids = batch.pop("question_id")
        valid = batch.pop("valid")
        has_label = batch.pop("has_label")
        labels = batch.pop("labels")
        preds_dev = step(params, {k: jnp.asarray(v)
                                  for k, v in batch.items()})
        inflight.append((host_qids, valid, has_label, labels, preds_dev))
        if len(inflight) > depth:
            consume(*inflight.popleft())
    while inflight:
        consume(*inflight.popleft())
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
