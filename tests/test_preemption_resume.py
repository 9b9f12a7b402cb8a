"""Step-granular preemption resume: interrupt mid-epoch, resume, and the
final state is BIT-identical to an uninterrupted run.

The reference's resume is epoch-granular (train_utils.py:488-510: resume
replays the whole interrupted epoch). Our driver checkpoints
(epoch, completed-steps) on SIGTERM/SIGINT; the pipeline order is a pure
function of (seed, epoch) and the dropout stream is folded by absolute step
index, so resuming at the recorded cursor replays nothing and loses nothing.
"""
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
    tmp = tmp_path_factory.mktemp("preempt")
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


def _final_params(out):
    from clg_vqa_tpu.train import checkpoints as ckpt
    return {p: np.asarray(v) for p, v in _walk(ckpt.load_params(
        out, _meta(out).get("state_dir", "state_latest"))["params"])}


def _walk(tree, prefix=""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _walk(tree[k], f"{prefix}/{k}")
    else:
        yield prefix, tree


def _preempt_after(runner, n_steps):
    """Flip the preemption flag after n_steps train-step dispatches (in lieu
    of a real SIGTERM — the handler just sets the same flag)."""
    count = {"n": 0}

    def hook(i):
        count["n"] += 1
        if count["n"] >= n_steps:
            runner._preempted = True

    runner._step_callback = hook


@pytest.mark.parametrize("kill_at", [2, 6])    # epoch 0 step 2 / epoch 1 step 2
def test_resume_bit_identical(world, kill_at):
    # uninterrupted reference run (4 steps/epoch x 2 epochs)
    runner_a, out_a = _runner(world, f"a{kill_at}")
    runner_a.finetune()
    want = _final_params(out_a)

    # interrupted at kill_at, then resumed in a fresh runner
    runner_b, out_b = _runner(world, f"b{kill_at}")
    _preempt_after(runner_b, kill_at)
    with pytest.raises(SystemExit):
        runner_b.finetune()
    meta = _meta(out_b)
    assert meta["mid_epoch_step"] == kill_at % 4 or meta["mid_epoch_step"] == 4
    runner_c, _ = _runner(world, f"b{kill_at}")
    runner_c.finetune(resume=True)
    got = _final_params(out_b)

    assert want.keys() == got.keys()
    for p in want:
        np.testing.assert_array_equal(want[p], got[p], err_msg=p)


def _meta(out):
    import json
    with open(os.path.join(out, "meta.json")) as f:
        return json.load(f)


def test_pipeline_start_step_is_exact_suffix(world):
    tmp, cfg, params0, ds, val, D, task, opt = world
    pipe = TrainPipeline(ds, micro_batch_size=8, grad_acc_steps=2, seed=0,
                         device_put=False)
    full = list(pipe.epoch(1))
    tail = list(pipe.epoch(1, start_step=2))
    assert len(full) == 4 and len(tail) == 2
    for a, b in zip(full[2:], tail):
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=k)
