"""Prune-recipe resume: SIGTERM in round k -> resume -> mask_best, per-round
masks and sparsity/score history identical to an uninterrupted run.

The reference's pruning entry carries the same --resume_file machinery as
train (train_task_prunning.py:609-789 mirrors train_task.py:279-280;
train_utils.py:488-510). Our imp_prune persists a cheap round-boundary
record (prune_meta.json) after every round and rides the standard
step-granular preemption checkpoint mid-round with the prune cursor merged
in, so resume is bit-exact at any interruption point.
"""
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
from clg_vqa_tpu.train.driver import FinetuneRunner


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("prune_resume")
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


def _runner(world, sub):
    tmp, cfg, params0, ds, val, D, task, opt = world
    pipe = TrainPipeline(ds, micro_batch_size=8, grad_acc_steps=2, seed=0)
    out = str(tmp / sub)
    return FinetuneRunner(uc2.forward, cfg, params0, pipe, val, D,
                          task_cfg=task, optim_cfg=opt, output_dir=out,
                          compute_dtype=None), out


def _preempt_after(runner, n_steps):
    count = {"n": 0}

    def hook(i):
        count["n"] += 1
        if count["n"] >= n_steps:
            runner._preempted = True

    runner._step_callback = hook


def _masks(out):
    """{file -> {path -> array}} for every saved mask artifact."""
    res = {}
    for f in sorted(os.listdir(out)):
        if f.startswith("mask_") and f.endswith(".npz"):
            with np.load(os.path.join(out, f)) as z:
                res[f] = {k: z[k].copy() for k in z.files}
    return res


# 4 steps/round x 2 rounds: kill mid round 0 / at round-0 train boundary
# (post-train, pre-prune) / mid round 1
@pytest.mark.parametrize("kill_at", [2, 4, 6])
def test_prune_resume_bit_identical(world, kill_at):
    runner_a, out_a = _runner(world, f"pa{kill_at}")
    want = runner_a.imp_prune(fraction=0.25)

    runner_b, out_b = _runner(world, f"pb{kill_at}")
    _preempt_after(runner_b, kill_at)
    with pytest.raises(SystemExit):
        runner_b.imp_prune(fraction=0.25)
    with open(os.path.join(out_b, "meta.json")) as f:
        meta = json.load(f)
    assert meta["prune"]["round"] == (kill_at - 1) // 4
    assert meta["mid_epoch_step"] == ((kill_at - 1) % 4) + 1

    runner_c, _ = _runner(world, f"pb{kill_at}")
    got = runner_c.imp_prune(fraction=0.25, resume=True)

    assert got == want
    masks_a, masks_b = _masks(out_a), _masks(out_b)
    assert masks_a.keys() == masks_b.keys()
    for f in masks_a:
        assert masks_a[f].keys() == masks_b[f].keys(), f
        for p in masks_a[f]:
            np.testing.assert_array_equal(masks_a[f][p], masks_b[f][p],
                                          err_msg=f"{f}:{p}")


def test_prune_resume_double_kill_and_completed_run(world):
    """Two interruptions (mid round 0, then mid round 1 after round 0's
    prune_meta record exists), each resumed — still bit-identical. A final
    resume on the COMPLETED run must ignore the stale mid-round state
    checkpoint (its round predates prune_meta's next_round) and retrain
    nothing."""
    runner_a, out_a = _runner(world, "pra")
    want = runner_a.imp_prune(fraction=0.25)

    runner_b, out_b = _runner(world, "prb")
    _preempt_after(runner_b, 2)            # mid round 0
    with pytest.raises(SystemExit):
        runner_b.imp_prune(fraction=0.25)
    runner_b2, _ = _runner(world, "prb")
    _preempt_after(runner_b2, 5)           # 2 finish round 0 + 3 into round 1
    with pytest.raises(SystemExit):
        runner_b2.imp_prune(fraction=0.25, resume=True)
    with open(os.path.join(out_b, "prune_meta.json")) as f:
        assert json.load(f)["next_round"] == 1     # round 0 recorded complete
    with open(os.path.join(out_b, "meta.json")) as f:
        meta = json.load(f)
    assert meta["prune"]["round"] == 1 and meta["mid_epoch_step"] == 3

    runner_c, _ = _runner(world, "prb")
    got = runner_c.imp_prune(fraction=0.25, resume=True)

    assert got == want
    masks_a, masks_b = _masks(out_a), _masks(out_b)
    assert masks_a.keys() == masks_b.keys()
    for f in masks_a:
        for p in masks_a[f]:
            np.testing.assert_array_equal(masks_a[f][p], masks_b[f][p],
                                          err_msg=f"{f}:{p}")

    # resume after full completion: nothing retrains (the stale round-1
    # mid-state is ignored because prune_meta says next_round == num_epoch)
    runner_d, _ = _runner(world, "prb")
    runner_d._step_callback = lambda i: (_ for _ in ()).throw(
        AssertionError("resume of a completed prune must not retrain"))
    again = runner_d.imp_prune(fraction=0.25, resume=True)
    assert again == want
