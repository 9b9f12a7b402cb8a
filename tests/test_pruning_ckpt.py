"""IMP pruning semantics (compounding schedule vs torch), SFT gradient
masking, and checkpoint save/resume roundtrips."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clg_vqa_tpu.config import UC2Config
from clg_vqa_tpu.models import uc2
from clg_vqa_tpu.train import checkpoints as ckpt
from clg_vqa_tpu.train import loop as tl
from clg_vqa_tpu.train import pruning as pr
from clg_vqa_tpu.train.optim import make_optimizer


@pytest.fixture(scope="module")
def tiny():
    cfg = UC2Config(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                    intermediate_size=64, v_feature_size=16, num_locs=7,
                    pooler_size=32, clf_hidden_size=32, num_labels=8)
    params = uc2.init_params(jax.random.key(0), cfg)
    return cfg, params


def test_imp_compounding_schedule(tiny):
    """5 rounds of 10% must hit the torch-verified compounding points
    (10 / 19 / 27.1 / 34.39 / 40.95% of the prunable set)."""
    _, params = tiny
    mask = pr.init_mask(params)
    assert pr.sparsity(mask) == 0.0
    expect = [10.0, 19.0, 27.1, 34.39, 40.95]
    for e in expect:
        mask = pr.imp_prune_step(params, mask, 0.1)
        assert abs(pr.sparsity(mask) - e) < 0.15, (pr.sparsity(mask), e)


def test_imp_prunes_smallest_globally(tiny):
    _, params = tiny
    mask = pr.imp_prune_step(params, pr.init_mask(params), 0.1)
    # every zeroed weight must be <= every surviving weight in |.| (global)
    kept_min = np.inf
    killed_max = -np.inf
    for (pw, w), (_, m) in zip(pr._walk(params), pr._walk(mask)):
        if m is None:
            continue
        w = np.abs(np.asarray(w))
        kept = w[np.asarray(m) > 0]
        killed = w[np.asarray(m) == 0]
        if kept.size:
            kept_min = min(kept_min, kept.min())
        if killed.size:
            killed_max = max(killed_max, killed.max())
    assert killed_max <= kept_min + 1e-12


def test_imp_two_rounds_match_torch_global_unstructured(tiny):
    """Two full IMP rounds (train-perturb -> prune -> rewind) produce the
    exact same masks as torch prune.global_unstructured(L1Unstructured)
    applied to the same weights (train_task_prunning.py:45-91,791-877)."""
    import torch
    import torch.nn.utils.prune as prune

    _, params = tiny
    paths = sorted(pr.prunable_paths(params))
    theta0 = {p: np.asarray(w, np.float32)
              for p, w in pr._walk(params) if p in paths}

    # torch side: one module per prunable leaf (stacked layers are one tensor
    # here and per-layer modules in torch; global topk makes that equivalent)
    mods = {}
    for p in paths:
        m = torch.nn.Module()
        m.weight = torch.nn.Parameter(torch.from_numpy(theta0[p].copy()))
        mods[p] = m

    mask = pr.init_mask(params)
    for rnd in range(2):
        # "training": deterministic perturbation of theta0, masked slots
        # pinned to zero (test_sft_masked_weights_stay_zero semantics)
        r = np.random.RandomState(100 + rnd)
        trained = {p: theta0[p] + 0.05 * r.randn(*theta0[p].shape)
                   .astype(np.float32) for p in paths}

        full_trained = jax.tree.map(lambda x: x, params)

        def put(tree, path=()):
            if isinstance(tree, dict):
                return {k: put(v, path + (k,)) for k, v in tree.items()}
            key = "/".join(path)
            return trained[key] if key in trained else tree

        full_trained = put(params)
        full_trained = pr.apply_mask(full_trained, mask)
        mask = pr.imp_prune_step(full_trained, mask, 0.1)

        for p in paths:
            if rnd == 0:
                mods[p].weight.data = torch.from_numpy(trained[p].copy())
            else:
                mods[p].weight_orig.data = torch.from_numpy(trained[p].copy())
                # refresh the reparametrized .weight (in the reference the
                # forward pre-hook does this on every training forward)
                for hook in mods[p]._forward_pre_hooks.values():
                    hook(mods[p], None)
        prune.global_unstructured(
            [(mods[p], "weight") for p in paths],
            pruning_method=prune.L1Unstructured, amount=0.1)

    ours = {p: m for p, m in pr._walk(mask) if m is not None}
    for p in paths:
        theirs = mods[p].weight_mask.detach().numpy()
        np.testing.assert_array_equal(ours[p], theirs, err_msg=p)


def test_mask_save_load_roundtrip(tiny, tmp_path):
    _, params = tiny
    mask = pr.imp_prune_step(params, pr.init_mask(params), 0.2)
    p = str(tmp_path / "mask.npz")
    pr.save_mask(p, mask)
    mask2 = pr.load_mask(p, params)
    for (_, a), (_, b) in zip(pr._walk(mask), pr._walk(mask2)):
        if a is None:
            assert b is None
        else:
            np.testing.assert_array_equal(a, b)


def test_sft_masked_weights_stay_zero(tiny):
    """SFT: masked weights start at 0 and remain exactly 0 through training
    steps (CustomFromMask parity: no grad, no decay drift)."""
    cfg, params0 = tiny
    mask = pr.imp_prune_step(params0, pr.init_mask(params0), 0.3)
    params = pr.apply_mask(params0, mask)
    gmask = pr.grad_mask_tree(mask)

    opt = make_optimizer(params, 1e-3, weight_decay=1e-2)
    state = tl.TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    D = jnp.asarray(np.random.RandomState(0).rand(8, 8), jnp.float32)
    step = jax.jit(tl.make_train_step(
        uc2.forward, cfg, opt, D, semantic_lambda=10.0, top_k=4,
        compute_dtype=None, grad_mask=gmask, use_dropout=False))

    r = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(r.randint(3, 64, (1, 8, 6)), jnp.int32),
        "input_mask": jnp.ones((1, 8, 6), jnp.int32),
        "features": jnp.asarray(r.randn(1, 8, 4, 16), jnp.float32),
        "locs": jnp.asarray(r.rand(1, 8, 4, 7), jnp.float32),
        "image_mask": jnp.ones((1, 8, 4), jnp.int32),
        "labels": jnp.asarray(r.randint(0, 8, (1, 8)), jnp.int32),
    }
    for i in range(3):
        state, m = step(state, batch, jax.random.key(i))
    for (pw, w), (_, mk) in zip(pr._walk(state.params), pr._walk(mask)):
        if mk is None:
            continue
        w = np.asarray(w)
        assert np.all(w[np.asarray(mk) == 0] == 0.0), pw
        # surviving weights must have moved
        assert np.any(w[np.asarray(mk) == 1]
                      != np.asarray(dict(pr._walk(params))[pw])[np.asarray(mk) == 1])


def test_rewind_restores_theta0(tiny):
    cfg, params0 = tiny
    mask = pr.imp_prune_step(params0, pr.init_mask(params0), 0.1)
    # training moved params; rewind = restore theta0 wholesale, mask persists
    moved = jax.tree.map(lambda x: x + 0.1, params0)
    rewound = params0     # our rewind is literally theta0 (see docstring)
    assert pr.sparsity(mask) > 9.0
    for (_, a), (_, b) in zip(pr._walk(rewound), pr._walk(params0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    del moved


def test_checkpoint_roundtrip(tiny, tmp_path):
    cfg, params = tiny
    opt = make_optimizer(params, 1e-3)
    state = tl.TrainState(params, opt.init(params),
                          jnp.asarray(7, jnp.int32))
    d = str(tmp_path / "ckpt")
    ckpt.save_state(d, state, epoch=2, best_score=0.41)
    like = tl.TrainState(jax.tree.map(jnp.zeros_like, params),
                         opt.init(params), jnp.zeros((), jnp.int32))
    restored, meta = ckpt.resume_state(d, like)
    assert meta["epoch"] == 2 and abs(meta["best_score"] - 0.41) < 1e-9
    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ckpt.save_params(d, "params_best", state.params)
    p2 = ckpt.load_params(d, "params_best", like=params)
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_torch_bin(tiny, tmp_path):
    cfg, params = tiny
    path = str(tmp_path / "model.bin")
    ckpt.export_torch_bin(path, params, model="uc2")
    import torch
    sd = torch.load(path, weights_only=True)
    assert "bert.encoder.layer.0.attention_self.query.weight" in sd
    assert "bert.encoder.layer.0.attention_self.v_query.weight" in sd
    np.testing.assert_allclose(
        sd["bert.t_pooler.dense.weight"].numpy().T,
        np.asarray(params["pooler"]["w"]))


def test_async_saver_roundtrip(tmp_path):
    """AsyncSaver writes the same checkpoint as the sync path, snapshots
    before returning (later state mutations can't corrupt it), and
    serializes queued saves."""
    from clg_vqa_tpu.train import checkpoints as ckpt
    from clg_vqa_tpu.train.loop import TrainState
    import jax.numpy as jnp
    d = str(tmp_path / "async")
    params = {"w": jnp.arange(8.0), "encoder": {"q": jnp.ones((2, 3))}}
    state = TrainState(params, {"mu": jax.tree.map(jnp.zeros_like, params)},
                       jnp.zeros((), jnp.int32))
    saver = ckpt.AsyncSaver()
    saver.save_state(d, state, epoch=0, best_score=0.5)
    saver.save_params(d, "params_best", params)    # queued behind the first
    saver.wait()
    like = TrainState(params, {"mu": jax.tree.map(jnp.zeros_like, params)},
                      jnp.zeros((), jnp.int32))
    restored, meta = ckpt.resume_state(d, like)
    assert meta["epoch"] == 0 and meta["best_score"] == 0.5
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.arange(8.0))
    best = ckpt.load_params(d, "params_best")
    np.testing.assert_array_equal(np.asarray(best["w"]), np.arange(8.0))


def test_async_saver_reraises_background_failure(tmp_path):
    """A failed background save must surface on the next wait()/submit —
    not vanish in the daemon thread (a full disk would otherwise end the
    run 'successfully' with no usable checkpoint)."""
    import pytest
    from clg_vqa_tpu.train import checkpoints as ckpt
    import jax.numpy as jnp
    saver = ckpt.AsyncSaver()
    # unwritable target: save_params will raise in the background thread
    bad_dir = str(tmp_path / "file_not_dir")
    with open(bad_dir, "w") as f:
        f.write("x")
    saver.save_params(bad_dir, "params_best", {"w": jnp.ones(3)})
    with pytest.raises(RuntimeError, match="async checkpoint save failed"):
        saver.wait()
    # the error is consumed: the saver is reusable afterwards
    good = str(tmp_path / "ok")
    saver.save_params(good, "params_best", {"w": jnp.ones(3)})
    saver.wait()
    assert ckpt.load_params(good, "params_best")["w"].shape == (3,)


def test_save_state_versioned_pointer_swap(tmp_path):
    """save_state never rewrites the live checkpoint in place: each save
    writes a fresh dir, swaps the meta.json pointer atomically, then
    removes the superseded dir — so a crash mid-save can never destroy
    the only resume checkpoint (reference keeps a single in-place
    pytorch_ckpt_latest.tar, train_utils.py:351-372)."""
    import json
    import os
    from clg_vqa_tpu.train import checkpoints as ckpt
    from clg_vqa_tpu.train.loop import TrainState
    import jax.numpy as jnp
    d = str(tmp_path / "ck")

    def mk(v):
        p = {"w": jnp.full((4,), float(v))}
        return TrainState(p, {"mu": jax.tree.map(jnp.zeros_like, p)},
                          jnp.asarray(v, jnp.int32))

    ckpt.save_state(d, mk(0), epoch=0, best_score=0.1)
    meta0 = json.load(open(os.path.join(d, "meta.json")))
    assert meta0["state_dir"] == "state_e0_s0"
    # simulate a stale partial dir left by a crashed save at the NEXT name
    os.makedirs(os.path.join(d, "state_e1_s5"))
    ckpt.save_state(d, mk(5), epoch=1, best_score=0.2)
    meta1 = json.load(open(os.path.join(d, "meta.json")))
    assert meta1["state_dir"] == "state_e1_s5"
    assert not os.path.exists(os.path.join(d, "state_e0_s0"))  # superseded
    restored, meta = ckpt.resume_state(d, mk(0))
    assert int(restored.step) == 5 and meta["epoch"] == 1
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.full((4,), 5.0))
    # re-saving at the same (epoch, step) must not rewrite the live dir
    ckpt.save_state(d, mk(5), epoch=1, best_score=0.3)
    meta2 = json.load(open(os.path.join(d, "meta.json")))
    assert meta2["state_dir"] == "state_e1_s5b"
    assert not os.path.exists(os.path.join(d, "state_e1_s5"))
