"""Isolation probe for integrated-vs-probe train throughput gaps (M3P).

Round 4 (cont.) used this to show the M3P integrated loop adds ~nothing
over the raw jitted step: with the real 493 MB train bank and the
reference acc-8x32 config, a fixed device-resident batch, a fresh
np.int32 step_index per step, the probe-signature (step_index=None)
variant, and real CDM pipeline batches ALL measure within 0.6 ms/step of
each other — the apparent 11% "integrated gap" was the acc-8x32 vs
acc-2x128 config difference (docs/PERFORMANCE.md "M3P integrated ==
probe"). Keep this around for the next time an integrated number drifts
from a probe: it bisects pipeline / H2D / dispatch-arg / program cost in
one run.

Requires the rehearsal corpus (tools/make_rehearsal_corpus.py
--max_regions 100) at --corpus.

Usage: python tools/probe_integrated_residue.py [--corpus DIR] [--steps N]
       [--acc N] [--mbs N]
"""
import argparse
import dataclasses
import itertools
import os
import sys
import time
import types

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/rehearsal_corpus_m3p")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--acc", type=int, default=8)
    ap.add_argument("--mbs", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from clg_vqa_tpu.config import M3PConfig, TaskConfig
    from clg_vqa_tpu.cli import common as C
    from clg_vqa_tpu.data.pipeline import TrainPipeline
    from clg_vqa_tpu.models import m3p as mod
    from clg_vqa_tpu.train import loop as tl
    from clg_vqa_tpu.train.optim import (make_optimizer,
                                         warmup_linear_schedule)
    from clg_vqa_tpu.models.layers import unstack_layer_params
    from clg_vqa_tpu.data.device_bank import DeviceFeatureBank

    cfg = M3PConfig.from_json("configs/m3p_base.json")
    task_cfg = TaskConfig.from_yaml(os.path.join(args.corpus, "task.yml"))
    task_cfg = dataclasses.replace(task_cfg, code_mixing=True)
    ns = types.SimpleNamespace(tokenizer="hash", annotations_jsonpath="",
                               val_annotations_jsonpath="")
    mixer = C.build_code_mixer(task_cfg, 0)
    ds = C.build_dataset(ns, cfg, task_cfg, task_cfg.train_split,
                         task_cfg.features_path_train, code_mixer=mixer)
    bank = DeviceFeatureBank(ds.store, max_regions=task_cfg.max_region_num,
                             num_locs=cfg.num_locs)
    bt = bank.tensors()
    print(f"bank {bank.nbytes/1e6:.0f} MB", file=sys.stderr)

    params = mod.init_params(jax.random.key(0), cfg)
    D = jnp.asarray(np.random.RandomState(0).rand(
        task_cfg.num_labels, task_cfg.num_labels).astype(np.float32))
    opt = make_optimizer(unstack_layer_params(params, cfg.num_layers),
                         warmup_linear_schedule(4e-5, 100, 10000))
    state = tl.perlayer_state(
        tl.TrainState(params, opt.init(params), jnp.zeros((), jnp.int32)),
        cfg.num_layers)
    step_fn = jax.jit(
        tl.make_train_step(mod.forward, cfg, opt, D, semantic_lambda=10.0,
                           top_k=10, compute_dtype=jnp.bfloat16,
                           fused_attn="flat"),
        donate_argnums=(0,))
    rng = jax.random.key(0, impl="rbg")

    pipe = TrainPipeline(ds, micro_batch_size=args.mbs,
                         grad_acc_steps=args.acc, seed=0,
                         with_features=False)
    it = pipe.epoch(0)
    fixed = next(it)
    N = args.steps
    qa = args.acc * args.mbs

    # warm both program signatures so no arm pays a compile
    state, m = step_fn(state, fixed, rng, bt, None, np.int32(0))
    jax.block_until_ready(m["loss"])
    state, m = step_fn(state, fixed, rng, bt, None, None)
    jax.block_until_ready(m["loss"])

    def arm(label, batches, step_idx):
        nonlocal state
        inflight = []
        t0 = time.perf_counter()
        for i, b in enumerate(batches):
            state, m = step_fn(state, b, rng, bt, None, step_idx(i))
            inflight.append(m)
            if len(inflight) >= 20:          # the driver's bulk-drain cadence
                jax.device_get([mm["loss"] for mm in inflight])
                inflight.clear()
        jax.device_get([mm["loss"] for mm in inflight])
        dt = (time.perf_counter() - t0) / N
        print(f"{label}: {dt*1e3:.1f} ms/step -> {qa/dt:.0f} QA/s")

    one = jnp.asarray(np.int32(1))
    arm("A fixed batch, fixed device step_index", [fixed] * N, lambda i: one)
    arm("B fixed batch, fresh np.int32(i)", [fixed] * N, lambda i: np.int32(i))
    arm("C real pipeline batches", itertools.islice(it, N),
        lambda i: np.int32(i))
    arm("D fixed batch, step_index=None (probe signature)", [fixed] * N,
        lambda i: None)
    it.close()


if __name__ == "__main__":
    main()
