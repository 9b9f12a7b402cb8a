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


@pytest.mark.parametrize("S", [76, 140, 64])
def test_fused_attention_matches_xla(S):
    from jax.experimental.pallas import tpu as pltpu
    from clg_vqa_tpu.ops.attention import fused_attention
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
        ours = np.asarray(fused_attention(q, k, v, bias, H))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("model", ["uc2", "m3p"])
def test_forward_fused_attn_matches(model):
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
                                      deterministic=True, fused_attn=True))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(ours.argmax(-1), ref.argmax(-1))
