"""Training-stack tests: optimizer semantics, loss parity with the reference
formula, grad-accumulation equivalence, and the sharded multi-chip step on
the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from clg_vqa_tpu.config import UC2Config
from clg_vqa_tpu.models import uc2
from clg_vqa_tpu.ops.semantic_prior import (gqa_train_loss,
                                            semantic_prior_loss)
from clg_vqa_tpu.train import loop as tl
from clg_vqa_tpu.train.optim import (adamw_pt, make_optimizer, no_decay_mask,
                                     warmup_linear_schedule)


# ---------------------------------------------------------------------------
# AdamW: independent numpy replica of the pytorch_transformers update rule
# (the one the reference trains with; see train/optim.py docstring).
# ---------------------------------------------------------------------------

def _ref_adamw_step(p, g, m, v, t, lr, b1, b2, eps, wd, correct_bias):
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    denom = np.sqrt(v) + eps
    step_size = lr * (np.sqrt(1 - b2 ** t) / (1 - b1 ** t) if correct_bias else 1.0)
    p = p - step_size * m / denom
    p = p - lr * wd * p
    return p, m, v


@pytest.mark.parametrize("correct_bias", [True, False])
def test_adamw_matches_reference_rule(correct_bias):
    rng = np.random.RandomState(0)
    p0 = rng.randn(4, 3).astype(np.float32)
    params = {"w": jnp.asarray(p0)}
    opt = adamw_pt(1e-3, b1=0.9, b2=0.999, eps=1e-6, weight_decay=0.01,
                   correct_bias=correct_bias)
    state = opt.init(params)

    p_np, m_np, v_np = p0.copy(), np.zeros_like(p0), np.zeros_like(p0)
    for t in range(1, 6):
        g = rng.randn(4, 3).astype(np.float32)
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
        p_np, m_np, v_np = _ref_adamw_step(
            p_np, g, m_np, v_np, t, 1e-3, 0.9, 0.999, 1e-6, 0.01, correct_bias)
        np.testing.assert_allclose(np.asarray(params["w"]), p_np,
                                   rtol=1e-5, atol=1e-7)


def test_warmup_linear_schedule_shape():
    s = warmup_linear_schedule(4e-5, warmup_steps=10, total_steps=100)
    assert float(s(0)) == 0.0                     # first update at factor 0
    assert np.isclose(float(s(5)), 4e-5 * 0.5)
    assert np.isclose(float(s(10)), 4e-5)
    assert np.isclose(float(s(55)), 4e-5 * 0.5)
    assert float(s(100)) == 0.0
    assert float(s(150)) == 0.0                   # clamped at 0 past t_total


def test_no_decay_mask():
    cfg = UC2Config(vocab_size=50, hidden_size=16, num_layers=2, num_heads=2,
                    intermediate_size=32, v_feature_size=8, num_locs=7,
                    pooler_size=16, clf_hidden_size=16, num_labels=5)
    params = uc2.init_params(jax.random.key(0), cfg)
    mask = no_decay_mask(params)
    assert mask["encoder"]["attn"]["q"]["w"] is True
    assert mask["encoder"]["attn"]["q"]["b"] is False
    assert mask["encoder"]["ln1"]["scale"] is False
    assert mask["embeddings"]["ln"]["bias"] is False
    assert mask["embeddings"]["word"] is True
    assert mask["classifier"]["fc1"]["w"] is True
    assert mask["classifier"]["ln"]["scale"] is False


# ---------------------------------------------------------------------------
# Semantic prior loss vs the reference's torch formula (task_utils.py:415-425)
# ---------------------------------------------------------------------------

def test_semantic_loss_matches_reference_formula():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(3)
    B, L, K = 6, 30, 10
    logits = rng.randn(B, L).astype(np.float32)
    labels = rng.randint(0, L, B)
    D = rng.rand(L, L).astype(np.float32)
    np.fill_diagonal(D, 0)
    distances = D[labels]           # per-sample rows, as the loader builds

    # reference computation
    tl_ = torch.from_numpy(logits)
    p_top_k, idx_top_k = torch.topk(F.softmax(tl_, dim=-1), k=K)
    sem = p_top_k * torch.from_numpy(distances)[
        torch.arange(B).unsqueeze(1), idx_top_k]
    sem_ref = torch.mean(torch.sum(sem, dim=-1), dim=0).item()
    ce_ref = F.cross_entropy(tl_, torch.from_numpy(labels)).item()
    loss_ref = ce_ref * L + (10.0 * sem_ref) * L

    sem_ours = float(semantic_prior_loss(jnp.asarray(logits),
                                         jnp.asarray(labels), jnp.asarray(D),
                                         top_k=K))
    loss_ours = float(gqa_train_loss(jnp.asarray(logits), jnp.asarray(labels),
                                     jnp.asarray(D), semantic_lambda=10.0,
                                     top_k=K))
    np.testing.assert_allclose(sem_ours, sem_ref, rtol=1e-5)
    np.testing.assert_allclose(loss_ours, loss_ref, rtol=1e-5)


# ---------------------------------------------------------------------------
# Train step: grad-accum equivalence, convergence, multi-chip sharding
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny():
    cfg = UC2Config(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                    intermediate_size=64, v_feature_size=16, num_locs=7,
                    pooler_size=32, clf_hidden_size=32, num_labels=8)
    params = uc2.init_params(jax.random.key(0), cfg)
    D = jnp.asarray(np.random.RandomState(0).rand(8, 8).astype(np.float32))

    def make_batch(rng, acc, mbs):
        r = np.random.RandomState(rng)
        T, R = 6, 4
        return {
            "input_ids": jnp.asarray(
                r.randint(3, 64, (acc, mbs, T)), jnp.int32),
            "input_mask": jnp.ones((acc, mbs, T), jnp.int32),
            "features": jnp.asarray(r.randn(acc, mbs, R, 16), jnp.float32),
            "locs": jnp.asarray(r.rand(acc, mbs, R, 7), jnp.float32),
            "image_mask": jnp.ones((acc, mbs, R), jnp.int32),
            "labels": jnp.asarray(r.randint(0, 8, (acc, mbs)), jnp.int32),
        }

    return cfg, params, D, make_batch


def _make_state_and_step(cfg, params, D, *, acc_batch, use_dropout=False,
                         compute_dtype=None, lr=1e-3):
    opt = make_optimizer(params, lr, weight_decay=1e-4, clip_norm=1.0)
    state = tl.TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step = tl.make_train_step(uc2.forward, cfg, opt, D, semantic_lambda=10.0,
                              top_k=4, compute_dtype=compute_dtype,
                              use_dropout=use_dropout)
    return state, step


def test_grad_accum_equivalence(tiny):
    """acc=4 x mbs=2 must equal acc=1 x bs=8 (sum of loss/acc grads ==
    mean-batch grads for equal micro sizes)."""
    cfg, params, D, make_batch = tiny
    batch_a = make_batch(1, 4, 2)
    batch_b = jax.tree.map(lambda x: x.reshape(1, 8, *x.shape[2:]), batch_a)

    state_a, step = _make_state_and_step(cfg, params, D, acc_batch=batch_a)
    state_b, _ = _make_state_and_step(cfg, params, D, acc_batch=batch_b)
    rng = jax.random.key(0)
    sa, ma = jax.jit(step)(state_a, batch_a, rng)
    sb, mb = jax.jit(step)(state_b, batch_b, rng)
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-5)
    for pa, pb in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=2e-4, atol=2e-6)


def test_loss_decreases(tiny):
    cfg, params, D, make_batch = tiny
    batch = make_batch(2, 1, 16)
    state, step = _make_state_and_step(cfg, params, D, acc_batch=batch,
                                       lr=5e-3)
    step = jax.jit(step)
    losses = []
    for i in range(12):
        state, m = step(state, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses


def test_multichip_sharded_step_matches_single(tiny):
    """dp=4 x mp=2 over the virtual 8-device CPU mesh: the sharded step must
    produce the same updated params as the unsharded one (fp32, no dropout)."""
    from clg_vqa_tpu.parallel import mesh as pm
    cfg, params, D, make_batch = tiny
    batch = make_batch(3, 2, 8)
    state, step = _make_state_and_step(cfg, params, D, acc_batch=batch)

    mesh = pm.make_mesh(n_dp=4, n_mp=2)
    sharded = tl.shard_train_step(step, mesh, state, batch, donate=False)
    rng = jax.random.key(0)
    s1, m1 = jax.jit(step)(state, batch, rng)
    s2, m2 = sharded(state, batch, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for pa, pb in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=2e-4, atol=1e-5)


def test_multichip_sharded_step_flat_kernel_matches_single(tiny):
    """dp=4 x mp=2 with the flat Pallas attention kernel (fused_attn='flat',
    interpret mode): the kernel shard_maps itself over the mesh — batch on
    dp, in-kernel head loop split over Megatron-mp head groups — and the
    sharded step must match the single-device flat step. use_dropout=True
    keeps the production custom-VJP kernel on the grad path; attention
    dropout is zeroed because interpret mode emulates the kernel PRNG with
    an ORDERED io_callback that the SPMD partitioner rejects (real-TPU
    Mosaic has no callback — the dropout path is only interp-blocked)."""
    import dataclasses
    from jax.experimental.pallas import tpu as pltpu
    from clg_vqa_tpu.parallel import mesh as pm
    cfg, params, D, make_batch = tiny
    cfg = dataclasses.replace(cfg, hidden_dropout_prob=0.0,
                              attention_probs_dropout_prob=0.0,
                              clf_dropout_prob=0.0)
    batch = make_batch(3, 2, 8)
    opt = make_optimizer(params, 1e-3, weight_decay=1e-4, clip_norm=1.0)
    state = tl.TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step = tl.make_train_step(uc2.forward, cfg, opt, D, semantic_lambda=10.0,
                              top_k=4, fused_attn="flat", use_dropout=True,
                              compute_dtype=None)

    mesh = pm.make_mesh(n_dp=4, n_mp=2)
    rng = jax.random.key(0)
    with pltpu.force_tpu_interpret_mode():
        sharded = tl.shard_train_step(step, mesh, state, batch, donate=False)
        s1, m1 = jax.jit(step)(state, batch, rng)
        s2, m2 = sharded(state, batch, rng)
        jax.block_until_ready((s2.params, m2))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for pa, pb in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=2e-4, atol=1e-5)


def test_train_step_with_feature_bank(tiny):
    """Training with a device-resident feature bank == host-feature path."""
    import tempfile, os
    from clg_vqa_tpu.data.cfs import CfsReader, CfsWriter
    from clg_vqa_tpu.data.device_bank import DeviceFeatureBank
    from clg_vqa_tpu.data.features import RegionRecord
    cfg, params, D, make_batch = tiny
    batch = make_batch(5, 2, 8)

    # materialize the batch's features into a store; indices point back
    r = np.random.RandomState(0)
    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "b.cfs")
    feats = np.asarray(batch["features"]).reshape(-1, 4, 16)
    locs = np.asarray(batch["locs"]).reshape(-1, 4, 7)
    # invert the loc processing is unnecessary: write a store whose gather
    # reproduces exactly these padded tensors by choosing boxes that map to
    # the stored locs is complex — instead test equivalence directly via
    # bank.lookup == stored arrays
    with CfsWriter(path) as w:
        for i in range(6):
            boxes = np.stack([r.rand(4) * 40, r.rand(4) * 40,
                              50 + r.rand(4) * 40, 50 + r.rand(4) * 40],
                             1).astype(np.float32)
            w.add(RegionRecord(f"i{i}", r.randn(4, 16).astype(np.float32),
                               boxes, 100.0, 100.0))
    rd = CfsReader(path)
    bank = DeviceFeatureBank(rd, max_regions=4, num_locs=7)
    idx = np.array([[0, 1, 2, 3, 4, 5, 0, 1], [2, 3, 4, 5, 0, 1, 2, 3]],
                   np.int32)
    f, l, m = rd.gather(idx.reshape(-1), max_regions=4, num_locs=7)
    bank_batch = dict(batch)
    bank_batch.pop("features"); bank_batch.pop("locs")
    bank_batch.pop("image_mask")
    bank_batch["store_idx"] = jnp.asarray(idx)
    host_batch = dict(batch)
    host_batch["features"] = jnp.asarray(f.reshape(2, 8, 4, 16))
    host_batch["locs"] = jnp.asarray(l.reshape(2, 8, 4, 7))
    host_batch["image_mask"] = jnp.asarray(m.reshape(2, 8, 4))

    opt = make_optimizer(params, 1e-3)
    state_a = tl.TrainState(jax.tree.map(jnp.array, params),
                            opt.init(params), jnp.zeros((), jnp.int32))
    state_b = tl.TrainState(jax.tree.map(jnp.array, params),
                            opt.init(params), jnp.zeros((), jnp.int32))
    step_host = jax.jit(tl.make_train_step(
        uc2.forward, cfg, opt, D, semantic_lambda=1.0, top_k=4,
        compute_dtype=None, use_dropout=False))
    step_bank = jax.jit(tl.make_train_step(
        uc2.forward, cfg, opt, D, semantic_lambda=1.0, top_k=4,
        compute_dtype=None, use_dropout=False))
    rng = jax.random.key(0)
    sa, ma = step_host(state_a, host_batch, rng)
    sb, mb = step_bank(state_b, bank_batch, rng, bank.tensors())
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                               rtol=1e-6)

    # the bank tensors must enter the program as jit ARGUMENTS, not closure
    # constants (a closed-over bank rides every axon remote-compile request;
    # see train/loop.make_loss_fn). in_avals must contain the bank feature
    # shape, and no constant may be bank-sized.
    jaxpr = jax.make_jaxpr(tl.make_train_step(
        uc2.forward, cfg, opt, D, semantic_lambda=1.0, top_k=4,
        compute_dtype=None, use_dropout=False))(
            state_b, bank_batch, rng, bank.tensors())
    bank_shape = tuple(bank.features.shape)
    assert any(tuple(getattr(a, "shape", ())) == bank_shape
               for a in jaxpr.in_avals), \
        f"bank features not a jit input: {bank_shape}"
    assert all(np.asarray(c).nbytes < bank.features.nbytes
               for c in jaxpr.consts if hasattr(c, "nbytes"))


def test_freeze_mask_blocks_updates(tiny):
    from clg_vqa_tpu.train.optim import freeze_mask
    cfg, params, D, make_batch = tiny
    gmask = freeze_mask(params, ["embeddings/word", "pooler"])
    assert gmask["embeddings"]["word"] is not None       # frozen -> zeros
    assert gmask["encoder"]["attn"]["q"]["w"] is None    # trainable
    batch = make_batch(4, 1, 8)
    opt = make_optimizer(params, 1e-2)
    state = tl.TrainState(jax.tree.map(jnp.array, params), opt.init(params),
                          jnp.zeros((), jnp.int32))
    step = jax.jit(tl.make_train_step(
        uc2.forward, cfg, opt, D, semantic_lambda=1.0, top_k=4,
        compute_dtype=None, use_dropout=False, grad_mask=gmask))
    state, _ = step(state, batch, jax.random.key(0))
    np.testing.assert_array_equal(
        np.asarray(state.params["embeddings"]["word"]),
        np.asarray(params["embeddings"]["word"]))
    np.testing.assert_array_equal(np.asarray(state.params["pooler"]["w"]),
                                  np.asarray(params["pooler"]["w"]))
    assert not np.allclose(np.asarray(state.params["encoder"]["attn"]["q"]["w"]),
                           np.asarray(params["encoder"]["attn"]["q"]["w"]))


def test_radam_matches_reference_rule():
    """RAdam vs an independent numpy replica of volta/volta/optimization.py:
    rectification warmup (SGDM fallback while rho <= 5) + pre-update decay."""
    from clg_vqa_tpu.train.optim import radam
    rng = np.random.RandomState(1)
    p0 = rng.randn(5, 4).astype(np.float32)
    lr, b1, b2, eps, wd = 1e-3, 0.9, 0.999, 1e-8, 0.01
    params = {"w": jnp.asarray(p0)}
    opt = radam(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)
    state = opt.init(params)
    rho_inf = 2 / (1 - b2) - 1
    p, m, v = p0.copy(), np.zeros_like(p0), np.zeros_like(p0)
    for t in range(1, 12):
        g = rng.randn(5, 4).astype(np.float32)
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        beta2_t = b2 ** t
        rho = rho_inf - 2 * t * beta2_t / (1 - beta2_t)
        base = p - lr * wd * p
        if rho > 5:
            rect = np.sqrt(((rho - 4) * (rho - 2) * rho_inf)
                           / ((rho_inf - 4) * (rho_inf - 2) * rho))
            step_size = lr * rect * np.sqrt(1 - beta2_t) / (1 - b1 ** t)
            p = base - step_size * m / (np.sqrt(v) + eps)
        else:
            p = base - lr / (1 - b1 ** t) * m
        np.testing.assert_allclose(np.asarray(params["w"]), p,
                                   rtol=2e-5, atol=1e-7)


def test_unrolled_unstacked_matches_rolled_scan(tiny):
    """The training path differentiates per-layer encoder leaves (python
    loop over layers.unstack_layer_params) and restacks grads; it must be
    numerically identical to the rolled lax.scan over stacked weights."""
    cfg, params, D, make_batch = tiny
    batch = make_batch(4, 2, 4)
    opt = make_optimizer(params, 1e-3, weight_decay=1e-4, clip_norm=1.0)
    state = tl.TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    rng = jax.random.key(7)
    outs = []
    for unroll in (False, True):
        step = tl.make_train_step(uc2.forward, cfg, opt, D,
                                  semantic_lambda=10.0, top_k=4,
                                  compute_dtype=None, use_dropout=False,
                                  unroll=unroll)
        s, m = jax.jit(step)(state, batch, rng)
        outs.append((s, m))
    (sa, ma), (sb, mb) = outs
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(ma["grad_norm"]),
                               float(mb["grad_norm"]), rtol=1e-5)
    assert jax.tree.structure(sa.params) == jax.tree.structure(sb.params)
    for pa, pb in zip(jax.tree.leaves(sa.params),
                      jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-5, atol=1e-7)


def test_perlayer_state_matches_stacked(tiny):
    """A perlayer_state (per-layer params + mu/nu, the single-chip training
    layout) must produce the same training trajectory as the stacked state,
    and stacked_state() must round-trip back to the stacked layout."""
    cfg, params, D, make_batch = tiny
    batch = make_batch(2, 2, 4)
    rng = jax.random.key(3)

    opt_s = make_optimizer(params, 1e-3, weight_decay=1e-4, clip_norm=1.0)
    state_s = tl.TrainState(params, opt_s.init(params),
                            jnp.zeros((), jnp.int32))
    step_s = jax.jit(tl.make_train_step(
        uc2.forward, cfg, opt_s, D, semantic_lambda=10.0, top_k=4,
        compute_dtype=None, use_dropout=False))

    from clg_vqa_tpu.models.layers import unstack_layer_params
    opt_p = make_optimizer(unstack_layer_params(params, cfg.num_layers),
                           1e-3, weight_decay=1e-4, clip_norm=1.0)
    state_p = tl.perlayer_state(
        tl.TrainState(params, opt_p.init(params), jnp.zeros((), jnp.int32)),
        cfg.num_layers)
    step_p = jax.jit(tl.make_train_step(
        uc2.forward, cfg, opt_p, D, semantic_lambda=10.0, top_k=4,
        compute_dtype=None, use_dropout=False))

    for i in range(2):
        state_s, ms = step_s(state_s, batch, rng)
        state_p, mp_ = step_p(state_p, batch, rng)
        np.testing.assert_allclose(float(ms["loss"]), float(mp_["loss"]),
                                   rtol=1e-6)
    back = tl.stacked_state(state_p)
    assert jax.tree.structure(back.params) == \
        jax.tree.structure(state_s.params)
    for pa, pb in zip(jax.tree.leaves(state_s.params),
                      jax.tree.leaves(back.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-5, atol=1e-7)
    for va, vb in zip(jax.tree.leaves(state_s.opt_state),
                      jax.tree.leaves(back.opt_state)):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=1e-5, atol=1e-7)


def test_multichip_sharded_step_matches_single_m3p():
    """Same dp4 x mp2 sharded==single check for the M3P model family: the
    path-based Megatron pspecs (parallel/mesh._pspec_for) must cover M3P's
    param tree (same encoder/attn, ffn/w1-w2, embeddings/word,
    classifier/fc2 naming) too."""
    from clg_vqa_tpu.config import M3PConfig
    from clg_vqa_tpu.models import m3p
    from clg_vqa_tpu.parallel import mesh as pm
    cfg = M3PConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                    intermediate_size=64, v_feature_size=16, num_locs=5,
                    pooler_size=32, clf_hidden_size=64, num_labels=8,
                    max_boxes=4)
    params = m3p.init_params(jax.random.key(1), cfg)
    D = jnp.asarray(np.random.RandomState(1).rand(8, 8).astype(np.float32))
    r = np.random.RandomState(2)
    acc, mbs, T, R = 2, 8, 6, 4
    batch = {
        "input_ids": jnp.asarray(r.randint(3, 64, (acc, mbs, T)), jnp.int32),
        "input_mask": jnp.ones((acc, mbs, T), jnp.int32),
        "features": jnp.asarray(r.randn(acc, mbs, R, 16), jnp.float32),
        "locs": jnp.asarray(r.rand(acc, mbs, R, 5), jnp.float32),
        "image_mask": jnp.ones((acc, mbs, R), jnp.int32),
        "labels": jnp.asarray(r.randint(0, 8, (acc, mbs)), jnp.int32),
    }
    opt = make_optimizer(params, 1e-3, weight_decay=1e-4, clip_norm=1.0)
    state = tl.TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step = tl.make_train_step(m3p.forward, cfg, opt, D, semantic_lambda=10.0,
                              top_k=4, compute_dtype=None, use_dropout=False)
    mesh = pm.make_mesh(n_dp=4, n_mp=2)
    sharded = tl.shard_train_step(step, mesh, state, batch, donate=False)
    rng = jax.random.key(0)
    s1, m1 = jax.jit(step)(state, batch, rng)
    s2, m2 = sharded(state, batch, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for pa, pb in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=2e-4, atol=1e-5)


def test_make_mesh_rejects_non_tiling_shapes():
    import pytest
    from clg_vqa_tpu.parallel import mesh as pm
    with pytest.raises(ValueError, match="does not tile"):
        pm.make_mesh(n_dp=2, n_mp=3)        # 6 != 8 devices
    with pytest.raises(ValueError, match="does not tile"):
        pm.make_mesh(n_mp=16)               # n_dp == 0


def test_shard_opt_state_covers_radam():
    """RAdam moments must mirror the param shardings like AdamW's — a
    replicated fallback would hold full fp32 moments per chip under mp."""
    from clg_vqa_tpu.parallel import mesh as pm
    from clg_vqa_tpu.train import loop as tl
    from clg_vqa_tpu.train.optim import make_optimizer, radam
    import jax.numpy as jnp
    mesh = pm.make_mesh(n_dp=4, n_mp=2)
    params = {"encoder": {"attn": {"q": {"w": jnp.zeros((8, 8)),
                                         "b": jnp.zeros((8,))}}}}
    opt = radam(lambda s: 1e-4)
    state = tl.TrainState(params, opt.init(params),
                          jnp.zeros((), jnp.int32))
    sh = tl._shard_opt_state_like(mesh, state)
    p_sh = pm.param_shardings(mesh, params)

    def leaves(t):
        return jax.tree.leaves(t, is_leaf=lambda x: hasattr(x, "spec"))

    q_w_param = p_sh["encoder"]["attn"]["q"]["w"]
    q_w_mu = sh.opt_state.mu["encoder"]["attn"]["q"]["w"]
    assert q_w_mu.spec == q_w_param.spec
