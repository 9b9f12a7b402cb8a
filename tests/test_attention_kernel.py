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
