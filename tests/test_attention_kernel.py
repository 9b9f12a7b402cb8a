"""Pallas fused attention vs the XLA reference path (CPU interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clg_vqa_tpu.models import layers as L


def xla_attention(q, k, v, bias, num_heads):
    """The layers.multi_head_attention core, on pre-projected q/k/v."""
    B, S, HD = q.shape
    D = HD // num_heads
    qh = q.reshape(B, S, num_heads, D)
    kh = k.reshape(B, S, num_heads, D)
    vh = v.reshape(B, S, num_heads, D)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(D)
    probs = jax.nn.softmax(scores + bias, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(B, S, HD)


@pytest.mark.parametrize("entry", ["blocked", "flat"])
@pytest.mark.parametrize("S", [76, 140, 64])
def test_fused_attention_matches_xla(S, entry):
    from jax.experimental.pallas import tpu as pltpu
    from clg_vqa_tpu.ops import attention as A
    kernel = (A.fused_attention if entry == "blocked"
              else A.fused_attention_flat)
    r = np.random.RandomState(0)
    B, H, D = 3, 4, 32
    q = jnp.asarray(r.randn(B, S, H * D), jnp.float32)
    k = jnp.asarray(r.randn(B, S, H * D), jnp.float32)
    v = jnp.asarray(r.randn(B, S, H * D), jnp.float32)
    mask = np.ones((B, S), np.float32)
    mask[1, -9:] = 0
    bias = jnp.asarray(((1 - mask) * -10000.0)[:, None, None, :])
    ref = np.asarray(xla_attention(q, k, v, bias, H))
    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(kernel(q, k, v, bias, H))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("model", ["uc2", "m3p"])
@pytest.mark.parametrize("variant", [True, "flat"])
def test_forward_fused_attn_matches(model, variant):
    """forward(fused_attn=True) — the Pallas eval attention path — must
    match the XLA formulation through the whole model (logits close in
    fp32; the paths differ only in scale placement fp rounding)."""
    from jax.experimental.pallas import tpu as pltpu
    r = np.random.RandomState(1)
    if model == "uc2":
        from clg_vqa_tpu.config import UC2Config
        from clg_vqa_tpu.models import uc2 as mod
        cfg = UC2Config(vocab_size=120, num_layers=2, hidden_size=64,
                        num_heads=4, intermediate_size=128, num_labels=17,
                        pooler_size=64, clf_hidden_size=32)
        nl = 7
    else:
        from clg_vqa_tpu.config import M3PConfig
        from clg_vqa_tpu.models import m3p as mod
        cfg = M3PConfig(vocab_size=120, num_layers=2, hidden_size=64,
                        num_heads=4, intermediate_size=128, num_labels=17,
                        pooler_size=64, clf_hidden_size=32)
        nl = 5
    B, T, R = 3, 8, 5
    params = mod.init_params(jax.random.key(0), cfg)
    im = np.ones((B, T), np.int32)
    im[1, -3:] = 0
    batch = {
        "input_ids": jnp.asarray(r.randint(3, cfg.vocab_size, (B, T))),
        "input_mask": jnp.asarray(im),
        "features": jnp.asarray(r.randn(B, R, 2048), jnp.float32),
        "locs": jnp.asarray(r.rand(B, R, nl), jnp.float32),
        "image_mask": jnp.ones((B, R), jnp.int32),
    }
    ref = np.asarray(mod.forward(params, cfg, batch, deterministic=True))
    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(mod.forward(params, cfg, batch,
                                      deterministic=True,
                                      fused_attn=variant))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(ours.argmax(-1), ref.argmax(-1))


# ---------------------------------------------------------------------------
# Training kernel (custom VJP + in-kernel dropout)
# ---------------------------------------------------------------------------

def _mk_inputs(S, B=3, H=4, D=32, seed=0):
    r = np.random.RandomState(seed)
    q = jnp.asarray(r.randn(B, S, H * D), jnp.float32)
    k = jnp.asarray(r.randn(B, S, H * D), jnp.float32)
    v = jnp.asarray(r.randn(B, S, H * D), jnp.float32)
    mask = np.ones((B, S), np.float32)
    mask[1, -9:] = 0
    bias = jnp.asarray(((1 - mask) * -10000.0)[:, None, None, :])
    w = jnp.asarray(r.randn(B, S, H * D), jnp.float32)   # cotangent seed
    return q, k, v, bias, w, H


@pytest.mark.parametrize("entry", ["blocked", "flat"])
@pytest.mark.parametrize("S", [76, 140, 64])
def test_fused_train_matches_xla_values_and_grads(S, entry):
    """rate=0: value AND (dq, dk, dv, dbias) must match the XLA path —
    for both the head-blocked kernel and the flat-boundary variant
    (heads looped in-kernel over 64-aligned lane slices)."""
    from jax.experimental.pallas import tpu as pltpu
    from clg_vqa_tpu.ops import attention as A
    kernel = (A.fused_attention_train if entry == "blocked"
              else A.fused_attention_train_flat)
    q, k, v, bias, w, H = _mk_inputs(S)

    def ref_loss(q, k, v, bias):
        return jnp.sum(xla_attention_b(q, k, v, bias, H) * w)

    def ker_loss(q, k, v, bias):
        return jnp.sum(kernel(q, k, v, bias, H) * w)

    ref_val, ref_grads = jax.value_and_grad(ref_loss, (0, 1, 2, 3))(
        q, k, v, bias)
    with pltpu.force_tpu_interpret_mode():
        val, grads = jax.value_and_grad(ker_loss, (0, 1, 2, 3))(q, k, v, bias)
    np.testing.assert_allclose(float(val), float(ref_val), rtol=2e-5)
    for g, rg, name in zip(grads, ref_grads, "qkvb"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(rg),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def xla_attention_b(q, k, v, bias, num_heads):
    """xla_attention with a differentiable bias argument."""
    B, S, HD = q.shape
    D = HD // num_heads
    qh = q.reshape(B, S, num_heads, D)
    kh = k.reshape(B, S, num_heads, D)
    vh = v.reshape(B, S, num_heads, D)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(D)
    probs = jax.nn.softmax(scores + bias, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(B, S, HD)


def test_fused_train_dropout_deterministic_and_unbiased():
    from jax.experimental.pallas import tpu as pltpu
    from clg_vqa_tpu.ops.attention import fused_attention_train
    q, k, v, bias, _, H = _mk_inputs(48)
    rng = jax.random.key(7)
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(fused_attention_train(q, k, v, bias, H,
                                             dropout_rate=0.5, rng=rng))
        b = np.asarray(fused_attention_train(q, k, v, bias, H,
                                             dropout_rate=0.5, rng=rng))
        c = np.asarray(fused_attention_train(q, k, v, bias, H,
                                             dropout_rate=0.5,
                                             rng=jax.random.key(8)))
        base = np.asarray(fused_attention_train(q, k, v, bias, H))
    np.testing.assert_array_equal(a, b)          # same rng -> same mask
    if jax.default_backend() == "tpu":
        # interpret mode's prng_seed ignores the seed VALUE (fixed stream,
        # verified empirically) — seed sensitivity is TPU-only testable
        assert np.abs(a - c).max() > 1e-6        # different rng -> differs
    assert np.abs(a - base).max() > 1e-6         # dropout actually applied


def test_fused_train_dropout_realized_mask_semantics():
    """Extract the realized dropped-prob matrix via linearity in v (H=1,
    v=I -> out[b,s,:S] == Pd[b,s,:]) and check layers.dropout semantics:
    every entry is either exactly 0 or P * 256/keep_t, and the realized
    drop fraction is near the requested rate."""
    from jax.experimental.pallas import tpu as pltpu
    from clg_vqa_tpu.ops.attention import fused_attention_train
    r = np.random.RandomState(5)
    B, S, H = 4, 16, 1          # D = 16 so v can carry the identity
    rate = 0.3
    t = int(round((1.0 - rate) * 256.0))
    q = jnp.asarray(r.randn(B, S, S), jnp.float32)
    k = jnp.asarray(r.randn(B, S, S), jnp.float32)
    v = jnp.broadcast_to(jnp.eye(S, dtype=jnp.float32), (B, S, S))
    bias = jnp.zeros((B, 1, 1, S), jnp.float32)
    probs = np.asarray(jax.nn.softmax(
        (q @ jnp.swapaxes(k, 1, 2)) / np.sqrt(S), axis=-1))
    with pltpu.force_tpu_interpret_mode():
        pd = np.asarray(fused_attention_train(
            q, k, v, bias, H, dropout_rate=rate, rng=jax.random.key(3)))
    kept = pd != 0.0
    # kept entries = probs * 256/t exactly (up to f32 rounding)
    np.testing.assert_allclose(pd[kept], (probs * (256.0 / t))[kept],
                               rtol=1e-5, atol=1e-7)
    frac = 1.0 - kept.mean()
    if jax.default_backend() == "tpu":
        # realized drop fraction near the (u8-quantized) rate: 1 - t/256
        want = 1.0 - t / 256.0
        assert abs(frac - want) < 0.08, (frac, want)
    else:
        # interpret mode's prng_random_bits returns ALL ZEROS (verified
        # empirically): every element passes the keep threshold, so the
        # kernel degenerates to keep-all + rescale here. The kept-value
        # identity above and the VJP/gradcheck tests stay fully valid;
        # the drop-fraction statistic is TPU-only testable.
        assert frac == 0.0


def test_fused_train_dropout_gradcheck_finite_difference():
    """With a FIXED rng the dropout mask is input-independent, so the
    custom VJP must match finite differences (and in particular the
    backward must replay the forward's exact mask)."""
    from jax.experimental.pallas import tpu as pltpu
    from clg_vqa_tpu.ops.attention import fused_attention_train
    r = np.random.RandomState(3)
    B, S, H, D = 2, 16, 2, 8
    q = jnp.asarray(r.randn(B, S, H * D), jnp.float32)
    k = jnp.asarray(r.randn(B, S, H * D), jnp.float32)
    v = jnp.asarray(r.randn(B, S, H * D), jnp.float32)
    bias = jnp.zeros((B, 1, 1, S), jnp.float32)
    w = jnp.asarray(r.randn(B, S, H * D), jnp.float32)
    rng = jax.random.key(11)

    def loss(q):
        return jnp.sum(fused_attention_train(
            q, k, v, bias, H, dropout_rate=0.3, rng=rng) * w)

    with pltpu.force_tpu_interpret_mode():
        g = np.asarray(jax.grad(loss)(q))
        # FD on a handful of coordinates
        eps = 3e-3
        rr = np.random.RandomState(0)
        for _ in range(8):
            i, j, l = rr.randint(B), rr.randint(S), rr.randint(H * D)
            dq = np.zeros(q.shape, np.float32)
            dq[i, j, l] = eps
            f1 = float(loss(q + dq))
            f2 = float(loss(q - dq))
            fd = (f1 - f2) / (2 * eps)
            assert abs(fd - g[i, j, l]) < 5e-2 * max(1.0, abs(fd)), \
                (fd, g[i, j, l])


def test_train_step_fused_attn_integration():
    """make_train_step(fused_attn=True) end-to-end on a tiny UC2: the
    custom-VJP kernel runs inside the fused train step (grad path,
    accumulation scan, optimizer) and produces finite, updating state."""
    from jax.experimental.pallas import tpu as pltpu
    from clg_vqa_tpu.config import UC2Config
    from clg_vqa_tpu.models import uc2
    from clg_vqa_tpu.train import loop as tl
    from clg_vqa_tpu.train.optim import make_optimizer
    r = np.random.RandomState(0)
    cfg = UC2Config(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                    intermediate_size=64, v_feature_size=16, num_locs=7,
                    pooler_size=32, clf_hidden_size=32, num_labels=6)
    params = uc2.init_params(jax.random.key(0), cfg)
    D = jnp.asarray(r.rand(6, 6), jnp.float32)
    opt = make_optimizer(params, 1e-3)
    step = tl.make_train_step(uc2.forward, cfg, opt, D, semantic_lambda=1.0,
                              compute_dtype=None, fused_attn=True)
    acc, mbs, T, R = 2, 4, 8, 5
    batch = {
        "input_ids": jnp.asarray(r.randint(3, 64, (acc, mbs, T)), jnp.int32),
        "input_mask": jnp.ones((acc, mbs, T), jnp.int32),
        "features": jnp.asarray(r.randn(acc, mbs, R, 16), jnp.float32),
        "locs": jnp.asarray(r.rand(acc, mbs, R, 7), jnp.float32),
        "image_mask": jnp.ones((acc, mbs, R), jnp.int32),
        "labels": jnp.asarray(r.randint(0, 6, (acc, mbs)), jnp.int32),
    }
    state = tl.TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    with pltpu.force_tpu_interpret_mode():
        state2, m = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
    moved = any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
                for a, b in zip(jax.tree.leaves(state.params),
                                jax.tree.leaves(state2.params)))
    assert moved and int(state2.step) == 1


def test_fused_hm_matches_flat_and_xla():
    """fused='hm' (head-major projections -> kernel -> head-major output
    proj) must match the XLA MHA path in values AND grads at rate 0: the
    layout change moves transposes, never numerics (f32, rtol-level —
    einsum tiling may differ from jnp.dot's)."""
    from jax.experimental.pallas import tpu as pltpu
    from clg_vqa_tpu.models.layers import multi_head_attention
    r = np.random.RandomState(3)
    B, S, H, hd = 2, 20, 4, 8
    D = H * hd
    x = jnp.asarray(r.randn(B, S, D), jnp.float32)
    p = {k: {"w": jnp.asarray(r.randn(D, D) / np.sqrt(D), jnp.float32),
             "b": jnp.asarray(r.randn(D) * 0.1, jnp.float32)}
         for k in ("q", "k", "v", "o")}
    mask = np.ones((B, S), np.float32)
    mask[1, -5:] = 0
    bias = jnp.asarray(((1 - mask) * -10000.0)[:, None, None, :])
    w = jnp.asarray(r.randn(B, S, D), jnp.float32)
    rng = jax.random.key(0)

    def loss(params, fused):
        y = multi_head_attention(x, x, params, H, bias, dropout_rate=0.0,
                                 rng=rng, deterministic=False, fused=fused)
        return jnp.sum(y * w)

    ref_val, ref_g = jax.value_and_grad(loss)(p, False)
    with pltpu.force_tpu_interpret_mode():
        val, g = jax.value_and_grad(loss)(p, "hm")
    np.testing.assert_allclose(float(val), float(ref_val), rtol=2e-5)
    for k in ("q", "k", "v", "o"):
        for leaf in ("w", "b"):
            np.testing.assert_allclose(
                np.asarray(g[k][leaf]), np.asarray(ref_g[k][leaf]),
                rtol=3e-4, atol=3e-4, err_msg=f"{k}.{leaf}")


def test_fused_hm_dropout_applies():
    """rate>0 through fused='hm' actually drops (and is rng-deterministic)."""
    from jax.experimental.pallas import tpu as pltpu
    from clg_vqa_tpu.models.layers import multi_head_attention
    r = np.random.RandomState(4)
    B, S, H, hd = 2, 16, 2, 8
    D = H * hd
    x = jnp.asarray(r.randn(B, S, D), jnp.float32)
    p = {k: {"w": jnp.asarray(r.randn(D, D) / np.sqrt(D), jnp.float32),
             "b": jnp.zeros((D,), jnp.float32)} for k in ("q", "k", "v", "o")}
    bias = jnp.zeros((B, 1, 1, S), jnp.float32)
    kw = dict(dropout_rate=0.5, deterministic=False, fused="hm")
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(multi_head_attention(x, x, p, H, bias,
                                            rng=jax.random.key(1), **kw))
        b = np.asarray(multi_head_attention(x, x, p, H, bias,
                                            rng=jax.random.key(1), **kw))
        base = np.asarray(multi_head_attention(
            x, x, p, H, bias, dropout_rate=0.0, rng=jax.random.key(1),
            deterministic=False, fused="hm"))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - base).max() > 1e-6


def test_fused_train_step_matches_xla_step():
    """Full make_train_step integration of the kernel (the M3P bf16 TPU
    default): with attention dropout at 0, one fused step must track the
    XLA step's loss and updated params (f32 compute, interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu
    from clg_vqa_tpu.config import M3PConfig
    from clg_vqa_tpu.models import m3p
    from clg_vqa_tpu.train import loop as tl
    from clg_vqa_tpu.train.optim import (make_optimizer,
                                         warmup_linear_schedule)
    from clg_vqa_tpu.models.layers import unstack_layer_params
    r = np.random.RandomState(0)
    cfg = M3PConfig(num_layers=2, hidden_size=32, num_heads=4,
                    vocab_size=80, v_feature_size=16, num_labels=8,
                    attention_dropout=0.0, dropout=0.0,
                    clf_dropout_prob=0.0)
    params = m3p.init_params(jax.random.key(0), cfg)
    D = jnp.zeros((8, 8), jnp.float32)
    opt = make_optimizer(unstack_layer_params(params, 2),
                         warmup_linear_schedule(1e-3, 2, 100))
    batch = {"input_ids": jnp.asarray(r.randint(3, 80, (2, 4, 6)), jnp.int32),
             "input_mask": jnp.ones((2, 4, 6), jnp.int32),
             "features": jnp.asarray(r.randn(2, 4, 5, 16), jnp.float32),
             "locs": jnp.asarray(r.rand(2, 4, 5, 5), jnp.float32),
             "image_mask": jnp.ones((2, 4, 5), jnp.int32),
             "labels": jnp.asarray(r.randint(0, 8, (2, 4)), jnp.int32)}
    rng = jax.random.key(0, impl="rbg")

    def one_step(fused):
        step = tl.make_train_step(m3p.forward, cfg, opt, D,
                                  semantic_lambda=0.0, compute_dtype=None,
                                  fused_attn=fused)
        st = tl.perlayer_state(
            tl.TrainState(params, opt.init(params), jnp.zeros((), jnp.int32)),
            2)
        return step(st, batch, rng, None, None, jnp.int32(0))

    st_ref, m_ref = one_step(False)
    with pltpu.force_tpu_interpret_mode():
        st_k, m_k = one_step(True)
    np.testing.assert_allclose(float(m_k["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(st_k.params),
                    jax.tree.leaves(st_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# Projected-boundary kernel (fused="proj"): whole attention block in Pallas
# ---------------------------------------------------------------------------

def test_fused_proj_matches_xla_values_and_grads():
    """fused='proj' (q/k/v projections + attention core + output projection
    all inside Pallas) must match the XLA MHA path in value AND grads —
    including x and every weight/bias — at rate 0."""
    from jax.experimental.pallas import tpu as pltpu
    from clg_vqa_tpu.models.layers import multi_head_attention
    r = np.random.RandomState(3)
    B, S, H, hd = 3, 20, 4, 8
    D = H * hd
    x = jnp.asarray(r.randn(B, S, D), jnp.float32)
    p = {k: {"w": jnp.asarray(r.randn(D, D) / np.sqrt(D), jnp.float32),
             "b": jnp.asarray(r.randn(D) * 0.1, jnp.float32)}
         for k in ("q", "k", "v", "o")}
    mask = np.ones((B, S), np.float32)
    mask[1, -5:] = 0
    bias = jnp.asarray(((1 - mask) * -10000.0)[:, None, None, :])
    w = jnp.asarray(r.randn(B, S, D), jnp.float32)
    rng = jax.random.key(0)

    def loss(xx, params, fused):
        y = multi_head_attention(xx, xx, params, H, bias, dropout_rate=0.0,
                                 rng=rng, deterministic=False, fused=fused)
        return jnp.sum(y * w)

    ref_val, ref_g = jax.value_and_grad(loss, (0, 1))(x, p, False)
    with pltpu.force_tpu_interpret_mode():
        val, g = jax.value_and_grad(loss, (0, 1))(x, p, "proj")
    np.testing.assert_allclose(float(val), float(ref_val), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(ref_g[0]),
                               rtol=3e-4, atol=3e-4, err_msg="dx")
    for k in ("q", "k", "v", "o"):
        for leaf in ("w", "b"):
            np.testing.assert_allclose(
                np.asarray(g[1][k][leaf]), np.asarray(ref_g[1][k][leaf]),
                rtol=3e-4, atol=3e-4, err_msg=f"{k}.{leaf}")


def test_fused_proj_dropout_applies_and_replays():
    """rate>0 through fused='proj': rng-deterministic forward, dropout
    actually applied, and the custom VJP's in-kernel mask replay matches
    finite differences on x (mask fixed by the rng)."""
    from jax.experimental.pallas import tpu as pltpu
    from clg_vqa_tpu.models.layers import multi_head_attention
    r = np.random.RandomState(4)
    B, S, H, hd = 2, 16, 2, 8
    D = H * hd
    x = jnp.asarray(r.randn(B, S, D), jnp.float32)
    p = {k: {"w": jnp.asarray(r.randn(D, D) / np.sqrt(D), jnp.float32),
             "b": jnp.zeros((D,), jnp.float32)} for k in ("q", "k", "v", "o")}
    bias = jnp.zeros((B, 1, 1, S), jnp.float32)
    kw = dict(dropout_rate=0.5, deterministic=False, fused="proj")
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(multi_head_attention(x, x, p, H, bias,
                                            rng=jax.random.key(1), **kw))
        b = np.asarray(multi_head_attention(x, x, p, H, bias,
                                            rng=jax.random.key(1), **kw))
        base = np.asarray(multi_head_attention(
            x, x, p, H, bias, dropout_rate=0.0, rng=jax.random.key(1),
            deterministic=False, fused="proj"))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - base).max() > 1e-6

    wsum = jnp.asarray(r.randn(B, S, D), jnp.float32)

    def loss(xx):
        return jnp.sum(multi_head_attention(
            xx, xx, p, H, bias, rng=jax.random.key(1), **kw) * wsum)

    with pltpu.force_tpu_interpret_mode():
        g = np.asarray(jax.grad(loss)(x))
        eps = 3e-3
        rr = np.random.RandomState(0)
        for _ in range(6):
            i, j, l = rr.randint(B), rr.randint(S), rr.randint(D)
            dx = np.zeros(x.shape, np.float32)
            dx[i, j, l] = eps
            fd = (float(loss(x + dx)) - float(loss(x - dx))) / (2 * eps)
            assert abs(fd - g[i, j, l]) < 5e-2 * max(1.0, abs(fd)), \
                (fd, g[i, j, l])


def test_fused_proj_train_step_matches_xla_step():
    """make_train_step(fused_attn='proj') tracks the XLA step bit-for-bit
    at zero dropout on a tiny M3P (same harness as the flat-kernel
    integration test): loss equal and every updated param leaf close."""
    from jax.experimental.pallas import tpu as pltpu
    from clg_vqa_tpu.config import M3PConfig
    from clg_vqa_tpu.models import m3p
    from clg_vqa_tpu.train import loop as tl
    from clg_vqa_tpu.train.optim import (make_optimizer,
                                         warmup_linear_schedule)
    from clg_vqa_tpu.models.layers import unstack_layer_params
    r = np.random.RandomState(0)
    cfg = M3PConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                    intermediate_size=64, v_feature_size=16, num_locs=5,
                    pooler_size=32, clf_hidden_size=32, num_labels=6,
                    dropout=0.0, attention_dropout=0.0, clf_dropout_prob=0.0)
    params = m3p.init_params(jax.random.key(0), cfg)
    D = jnp.asarray(r.rand(6, 6), jnp.float32)
    opt = make_optimizer(unstack_layer_params(params, 2),
                         warmup_linear_schedule(1e-3, 2, 100))
    acc, mbs, T, R = 2, 4, 8, 5
    batch = {
        "input_ids": jnp.asarray(r.randint(3, 64, (acc, mbs, T)), jnp.int32),
        "input_mask": jnp.ones((acc, mbs, T), jnp.int32),
        "features": jnp.asarray(r.randn(acc, mbs, R, 16), jnp.float32),
        "locs": jnp.asarray(r.rand(acc, mbs, R, 5), jnp.float32),
        "image_mask": jnp.ones((acc, mbs, R), jnp.int32),
        "labels": jnp.asarray(r.randint(0, 6, (acc, mbs)), jnp.int32),
    }
    rng = jax.random.key(0, impl="rbg")

    def one_step(fused):
        step = tl.make_train_step(m3p.forward, cfg, opt, D,
                                  semantic_lambda=0.0, compute_dtype=None,
                                  fused_attn=fused)
        st = tl.perlayer_state(
            tl.TrainState(params, opt.init(params), jnp.zeros((), jnp.int32)),
            2)
        return step(st, batch, rng, None, None, jnp.int32(0))

    st_ref, m_ref = one_step(False)
    with pltpu.force_tpu_interpret_mode():
        st_k, m_k = one_step("proj")
    np.testing.assert_allclose(float(m_k["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(st_k.params),
                    jax.tree.leaves(st_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# S-major-boundary training kernel ("sm")
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("S", [76, 140, 64])
def test_fused_sm_matches_xla_values_and_grads(S):
    """rate=0: value AND (dq, dk, dv, dbias) must match the XLA path for
    the S-major-boundary kernel (batch on sublanes, heads in 128-lane
    groups, per-sample 2D mats)."""
    from jax.experimental.pallas import tpu as pltpu
    from clg_vqa_tpu.ops import attention as A
    q, k, v, bias, w, H = _mk_inputs(S, B=8)

    def ref_loss(q, k, v, bias):
        return jnp.sum(xla_attention_b(q, k, v, bias, H) * w)

    def ker_loss(q, k, v, bias):
        return jnp.sum(A.fused_attention_train_smajor(q, k, v, bias, H) * w)

    ref_val, ref_grads = jax.value_and_grad(ref_loss, (0, 1, 2, 3))(
        q, k, v, bias)
    with pltpu.force_tpu_interpret_mode():
        val, grads = jax.value_and_grad(ker_loss, (0, 1, 2, 3))(q, k, v, bias)
    np.testing.assert_allclose(float(val), float(ref_val), rtol=2e-5)
    for g, rg, name in zip(grads, ref_grads, "qkvb"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(rg),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_fused_sm_eval_forward_matches_xla():
    from jax.experimental.pallas import tpu as pltpu
    from clg_vqa_tpu.ops.attention import fused_attention_smajor
    q, k, v, bias, _, H = _mk_inputs(76, B=8)
    ref = xla_attention_b(q, k, v, bias, H)
    with pltpu.force_tpu_interpret_mode():
        out = fused_attention_smajor(q, k, v, bias, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_sm_dropout_deterministic_and_applies():
    from jax.experimental.pallas import tpu as pltpu
    from clg_vqa_tpu.ops.attention import fused_attention_train_smajor
    q, k, v, bias, _, H = _mk_inputs(48, B=8)
    rng = jax.random.key(7)
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(fused_attention_train_smajor(
            q, k, v, bias, H, dropout_rate=0.5, rng=rng))
        b = np.asarray(fused_attention_train_smajor(
            q, k, v, bias, H, dropout_rate=0.5, rng=rng))
        base = np.asarray(fused_attention_train_smajor(q, k, v, bias, H))
    np.testing.assert_array_equal(a, b)          # same rng -> same mask
    # interpret mode's prng_random_bits returns all zeros -> every prob is
    # "kept" and rescaled by 256/keep_t; the output must therefore differ
    # from the rate=0 path (rescale applied) — proves the mask path runs
    assert np.abs(a - base).max() > 1e-6


def test_fused_sm_rejects_bad_batch():
    from clg_vqa_tpu.ops.attention import fused_attention_train_smajor
    q, k, v, bias, _, H = _mk_inputs(48, B=3)
    with pytest.raises(ValueError, match="batch"):
        fused_attention_train_smajor(q, k, v, bias, H)
