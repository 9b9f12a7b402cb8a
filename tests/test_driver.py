"""Integration: the three training recipes end-to-end on a tiny synthetic
world (finetune -> IMP prune -> SFT), checking artifacts and semantics."""
import glob
import json
import os

import numpy as np
import pytest

import jax

from clg_vqa_tpu.config import OptimConfig, TaskConfig, UC2Config
from clg_vqa_tpu.data.cfs import CfsReader, CfsWriter
from clg_vqa_tpu.data.features import RegionRecord
from clg_vqa_tpu.data.gqa import Entry, GQADataset
from clg_vqa_tpu.data.pipeline import TrainPipeline
from clg_vqa_tpu.data.tokenizer import HashTokenizer
from clg_vqa_tpu.models import uc2
from clg_vqa_tpu.train import pruning as pr
from clg_vqa_tpu.train.driver import FinetuneRunner


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("driver")
    r = np.random.RandomState(0)
    L, n_imgs, n_q = 6, 8, 64
    cfg = UC2Config(vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
                    intermediate_size=64, v_feature_size=16, num_locs=7,
                    pooler_size=32, clf_hidden_size=32, num_labels=L)
    store = str(tmp / "f.cfs")
    with CfsWriter(store) as w:
        for i in range(n_imgs):
            n = r.randint(3, 8)
            boxes = np.stack([r.rand(n) * 40, r.rand(n) * 40,
                              50 + r.rand(n) * 40, 50 + r.rand(n) * 40],
                             1).astype(np.float32)
            w.add(RegionRecord(f"i{i}", r.randn(n, 16).astype(np.float32),
                               boxes, 100.0, 100.0))
    # learnable task: answer depends on a token in the question
    entries = [Entry(question_id=i, image_id=f"i{i % n_imgs}",
                     question=f"marker{i % L} what is it ?",
                     labels=[i % L], scores=[1.0]) for i in range(n_q)]
    tok = HashTokenizer(128)
    ds = GQADataset(entries, CfsReader(store), tok, max_seq_length=8,
                    max_region_num=6, num_locs=7, num_labels=L)
    val = GQADataset(entries[:16], CfsReader(store), tok, max_seq_length=8,
                     max_region_num=6, num_locs=7, num_labels=L)
    params0 = uc2.init_params(jax.random.key(0), cfg)
    D = np.random.RandomState(1).rand(L, L).astype(np.float32)
    np.fill_diagonal(D, 0)
    task = TaskConfig(num_labels=L, max_seq_length=8, max_region_num=6,
                      batch_size=16, eval_batch_size=16, lr=5e-3, num_epoch=2,
                      semantic_lambda=1.0)
    opt = OptimConfig(lr=5e-3, grad_acc_steps=2, warmup_proportion=0.1)
    return tmp, cfg, params0, ds, val, D, task, opt


def _runner(world, sub, **kw):
    tmp, cfg, params0, ds, val, D, task, opt = world
    pipe = TrainPipeline(ds, micro_batch_size=8, grad_acc_steps=2, seed=0)
    out = str(tmp / sub)
    return FinetuneRunner(uc2.forward, cfg, params0, pipe, val, D,
                          task_cfg=task, optim_cfg=opt, output_dir=out,
                          compute_dtype=None, **kw), out


def test_finetune_recipe(world):
    runner, out = _runner(world, "ft")
    best = runner.finetune()
    assert 0.0 <= best <= 1.0
    assert os.path.isdir(os.path.join(out, "params_best"))
    assert os.path.exists(os.path.join(out, "meta.json"))
    lines = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    kinds = {l["kind"] for l in lines}
    assert kinds == {"train", "val"}
    tr = [l for l in lines if l["kind"] == "train"]
    # tiny task is learnable: loss at end well below start
    assert tr[-1]["loss"] < tr[0]["loss"]


def test_imp_prune_recipe(world):
    tmp, cfg, params0, *_ = world
    runner, out = _runner(world, "imp")
    res = runner.imp_prune(fraction=0.1)
    assert len(res["history"]) == 2
    np.testing.assert_allclose(res["history"][0]["sparsity"], 10.0, atol=0.1)
    np.testing.assert_allclose(res["history"][1]["sparsity"], 19.0, atol=0.1)
    assert os.path.exists(os.path.join(out, "mask_best.npz"))
    assert len(glob.glob(os.path.join(out, "mask_lt*.npz"))) == 2


def test_imp_selection_evaluates_rewound_mask(world):
    """Reference order (train_task_prunning.py:791-877): the score that picks
    mask_best is computed on the REWOUND weights theta_0 * mask, not on the
    trained weights."""
    tmp, cfg, params0, *_ = world
    runner, out = _runner(world, "imp_sel")
    seen = []
    orig_eval = runner.evaluate

    def spy(params, epoch):
        seen.append(jax.tree.map(np.asarray, params))
        return orig_eval(params, epoch)

    runner.evaluate = spy
    runner.imp_prune(fraction=0.1)
    assert len(seen) == 2
    theta0 = jax.tree.map(np.asarray, params0)
    for epoch, evald in enumerate(seen):
        mask = pr.load_mask(os.path.join(out, f"mask_lt{epoch}.npz"), params0)
        expect = jax.tree.map(np.asarray, pr.apply_mask(params0, mask))
        flat_e = dict(pr._walk(expect))
        flat_m = dict(pr._walk(mask))
        moved = False
        for p, got in pr._walk(evald):
            np.testing.assert_allclose(got, flat_e[p], atol=1e-6, err_msg=p)
            if flat_m.get(p) is not None:
                # distinguishable from trained*mask: surviving slots must
                # equal theta_0 exactly (training would have moved them)
                m = flat_m[p]
                t0 = dict(pr._walk(theta0))[p]
                if np.any(m == 0):
                    moved = True
                    assert np.array_equal(got[m == 1], t0[m == 1]), p
        assert moved


def test_sft_recipe(world):
    tmp, cfg, params0, *_ = world
    imp_out = str(tmp / "imp")
    if not os.path.exists(os.path.join(imp_out, "mask_best.npz")):
        runner, _ = _runner(world, "imp")
        runner.imp_prune(fraction=0.1)
    runner, out = _runner(world, "sft")
    best = runner.sft(os.path.join(imp_out, "mask_best.npz"))
    assert 0.0 <= best <= 1.0
    # exported torch bin is loadable and masked weights are zero
    import torch
    sd = torch.load(os.path.join(out, "model_best_sft.bin"),
                    weights_only=True)
    mask = pr.load_mask(os.path.join(imp_out, "mask_best.npz"), params0)
    q0 = sd["bert.encoder.layer.0.attention_self.query.weight"].numpy().T
    m0 = mask["encoder"]["attn"]["q"]["w"][0]
    assert np.all(q0[m0 == 0] == 0.0)
    assert (m0 == 0).sum() > 0


def test_schedule_horizon_and_lr_logging(world):
    """The lr schedule is sized by optim_train_epochs (reference
    train_task.py:86,271-274 — default 20), NOT by num_epoch: a short
    recipe trains inside the warmup ramp / early decay and never hits
    lr=0. The host-side lr table mirrors the schedule for metrics."""
    runner, _ = _runner(world, "sched")
    runner._build_opt()
    steps_ep = runner.pipe.steps_per_epoch()
    horizon = steps_ep * runner.optim_cfg.optim_train_epochs
    assert runner._total_steps() == horizon
    warmup = int(0.1 * horizon)
    base = runner.task_cfg.lr
    assert runner._lr_of(0) == 0.0                      # torch LambdaLR(0)
    assert abs(runner._lr_of(warmup) - base) < 1e-9     # ramp tops out
    # trained steps end well before the horizon -> lr never decays to 0
    n_trained = steps_ep * runner.task_cfg.num_epoch
    assert runner._lr_of(n_trained) > 0.5 * base


def test_train_fused_attn_resolution(world):
    """fused_attn='auto' enables the flat-boundary Pallas train attention
    only in bf16 on TPU (the measured win for both recipes —
    ops/attention.py); on the CPU test backend auto must resolve OFF, and
    the explicit 'on'/'off' overrides are honored as stated."""
    import pytest
    runner, _ = _runner(world, "fa_auto")
    assert runner.train_fused is False          # cpu backend -> XLA path
    runner, _ = _runner(world, "fa_on", fused_attn="on")
    assert runner.train_fused == "flat"
    runner, _ = _runner(world, "fa_off", fused_attn="off")
    assert runner.train_fused is False
    with pytest.raises(ValueError):
        _runner(world, "fa_bad", fused_attn="yes")
