"""Params-only (cheap) mid-run checkpoints: 1/3 of the full-state device
fetch — the overlapped-save epoch tax documented in docs/PERFORMANCE.md.
Mirrors the reference's split of cheap per-epoch weight files from the full
resume tar (train_utils.py:351-372).

Resume semantics: params bit-exact, optimizer moments reinitialized with the
schedule/bias-correction clock fast-forwarded to the saved step (never back
into warmup)."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clg_vqa_tpu.config import UC2Config
from clg_vqa_tpu.models import uc2
from clg_vqa_tpu.train import checkpoints as ckpt
from clg_vqa_tpu.train import loop as tl
from clg_vqa_tpu.train.optim import (AdamWState, fastforward_count,
                                     make_optimizer)


@pytest.fixture(scope="module")
def tiny():
    cfg = UC2Config(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                    intermediate_size=64, v_feature_size=16, num_locs=7,
                    pooler_size=32, clf_hidden_size=32, num_labels=8)
    params = uc2.init_params(jax.random.key(0), cfg)
    return cfg, params


def _adamw_state(opt_state):
    for s in opt_state:
        if isinstance(s, AdamWState):
            return s
    raise AssertionError("no AdamWState in chain")


def test_params_only_roundtrip(tiny, tmp_path):
    cfg, params = tiny
    opt = make_optimizer(params, 1e-3)
    # non-trivial moments so we can verify they are NOT persisted
    st0 = opt.init(params)
    moments = jax.tree.map(lambda p: jnp.ones_like(p) * 0.5, params)
    st0 = tuple(s._replace(mu=moments, count=jnp.asarray(7, jnp.int32))
                if isinstance(s, AdamWState) else s for s in st0)
    state = tl.TrainState(params, st0, jnp.asarray(7, jnp.int32))
    d = str(tmp_path / "ckpt")
    ckpt.save_state(d, state, epoch=2, best_score=0.41, params_only=True)

    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    assert meta["params_only"] is True

    like = tl.TrainState(jax.tree.map(jnp.zeros_like, params),
                         opt.init(params), jnp.zeros((), jnp.int32))
    restored, meta = ckpt.resume_state(d, like)
    assert meta["epoch"] == 2 and int(restored.step) == 7
    # params bit-exact
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # moments fresh (zero), clock fast-forwarded to step
    aw = _adamw_state(restored.opt_state)
    assert int(aw.count) == 7
    assert all(float(np.abs(np.asarray(m)).max()) == 0.0
               for m in jax.tree.leaves(aw.mu))


def test_params_only_fetches_one_third(tiny, tmp_path, monkeypatch):
    """The device->host FETCH (the real cost on a tunneled chip: 26-28 MB/s
    D2H, docs/PERFORMANCE.md) must shrink to ~params/full = 1/3 — disk size
    is not the metric (orbax compresses the zero moments at tiny scale)."""
    cfg, params = tiny
    opt = make_optimizer(params, 1e-3)
    state = tl.TrainState(params, opt.init(params), jnp.asarray(3, jnp.int32))
    fetched = []
    orig = ckpt._fetch

    def spy(tree):
        host = orig(tree)
        fetched.append(sum(np.asarray(a).nbytes
                           for a in jax.tree.leaves(host)))
        return host

    monkeypatch.setattr(ckpt, "_fetch", spy)
    ckpt.save_state(str(tmp_path / "full"), state, epoch=0, best_score=0.0)
    ckpt.save_state(str(tmp_path / "po"), state, epoch=0, best_score=0.0,
                    params_only=True)
    assert fetched[1] < 0.45 * fetched[0]


def test_fastforward_count_nested_chain(tiny):
    _, params = tiny
    opt = make_optimizer(params, 1e-3)
    st = fastforward_count(opt.init(params), 42)
    assert int(_adamw_state(st).count) == 42


def test_async_saver_params_only(tiny, tmp_path):
    cfg, params = tiny
    opt = make_optimizer(params, 1e-3)
    state = tl.TrainState(params, opt.init(params), jnp.asarray(5, jnp.int32))
    s = ckpt.AsyncSaver()
    d = str(tmp_path / "a")
    s.save_state(d, state, epoch=1, best_score=0.2, params_only=True)
    s.wait()
    like = tl.TrainState(jax.tree.map(jnp.zeros_like, params),
                         opt.init(params), jnp.zeros((), jnp.int32))
    restored, meta = ckpt.resume_state(d, like)
    assert meta["params_only"] and int(restored.step) == 5
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_runner_mid_save_params_gap_epochs(tmp_path):
    """Driver integration: with mid_save='params' and save_every past the
    horizon, gap epochs leave a params-only resume point; a resumed run
    continues at the next epoch (no retraining of epoch 0) and completes."""
    from clg_vqa_tpu.config import OptimConfig, TaskConfig
    from clg_vqa_tpu.data.cfs import CfsReader, CfsWriter
    from clg_vqa_tpu.data.features import RegionRecord
    from clg_vqa_tpu.data.gqa import Entry, GQADataset
    from clg_vqa_tpu.data.pipeline import TrainPipeline
    from clg_vqa_tpu.data.tokenizer import HashTokenizer
    from clg_vqa_tpu.train.driver import FinetuneRunner

    r = np.random.RandomState(0)
    L, n_imgs, n_q = 6, 8, 32
    cfg = UC2Config(vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
                    intermediate_size=64, v_feature_size=16, num_locs=7,
                    pooler_size=32, clf_hidden_size=32, num_labels=L)
    store = str(tmp_path / "f.cfs")
    with CfsWriter(store) as w:
        for i in range(n_imgs):
            n = r.randint(3, 8)
            boxes = np.stack([r.rand(n) * 40, r.rand(n) * 40,
                              50 + r.rand(n) * 40, 50 + r.rand(n) * 40],
                             1).astype(np.float32)
            w.add(RegionRecord(f"i{i}", r.randn(n, 16).astype(np.float32),
                               boxes, 100.0, 100.0))
    entries = [Entry(question_id=i, image_id=f"i{i % n_imgs}",
                     question=f"marker{i % L} what ?", labels=[i % L],
                     scores=[1.0]) for i in range(n_q)]
    tok = HashTokenizer(128)
    ds = GQADataset(entries, CfsReader(store), tok, max_seq_length=8,
                    max_region_num=6, num_locs=7, num_labels=L)
    task = TaskConfig(num_labels=L, max_seq_length=8, max_region_num=6,
                      batch_size=16, eval_batch_size=16, lr=5e-3, num_epoch=2,
                      semantic_lambda=1.0)
    ocfg = OptimConfig(lr=5e-3, grad_acc_steps=2, warmup_proportion=0.1)

    def mk(out):
        pipe = TrainPipeline(ds, micro_batch_size=8, grad_acc_steps=2, seed=0)
        return FinetuneRunner(uc2.forward, cfg, params0, pipe, None, None,
                              task_cfg=task, optim_cfg=ocfg, output_dir=out,
                              compute_dtype=None, async_ckpt=False,
                              save_every=99, mid_save="params")

    params0 = uc2.init_params(jax.random.key(0), cfg)
    out = str(tmp_path / "run")

    class Stop(Exception):
        pass

    runner = mk(out)
    n = {"d": 0}

    def hook(i):
        n["d"] += 1
        if n["d"] > 2:           # 2 steps/epoch -> raise inside epoch 1
            raise Stop()

    runner._step_callback = hook
    with pytest.raises(Stop):
        runner.finetune()
    with open(os.path.join(out, "meta.json")) as f:
        meta = json.load(f)
    assert meta["params_only"] is True and meta["epoch"] == 0

    resumed = mk(out)
    seen = []
    resumed._step_callback = seen.append
    resumed.finetune(resume=True)
    assert seen == [0, 1]        # one epoch's worth: epoch 0 not retrained
    with open(os.path.join(out, "meta.json")) as f:
        meta = json.load(f)
    assert meta["epoch"] == 1 and not meta.get("params_only")  # final = full
