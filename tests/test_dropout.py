"""Unit tests for the u8-bits inverted dropout (models/layers.dropout).

The reference uses torch.nn.Dropout (u32-equivalent bernoulli); ours
generates 8-bit random bits and rescales by the ACTUAL quantized keep
probability t/256 so the estimator stays exactly unbiased (see the
dropout docstring for the TPU rationale).
"""
import jax
import jax.numpy as jnp
import numpy as np

from clg_vqa_tpu.models.layers import dropout


def _key():
    return jax.random.key(7, impl="rbg")


def test_deterministic_and_zero_rate_passthrough():
    x = jnp.arange(12.0).reshape(3, 4)
    assert (dropout(x, 0.3, _key(), True) == x).all()
    assert (dropout(x, 0.0, _key(), False) == x).all()
    # rate below the u8 granularity floor (1/512) keeps everything
    assert (dropout(x, 0.0005, _key(), False) == x).all()


def test_unbiased_and_quantized_keep_rate():
    x = jnp.ones((2048, 513))
    for rate in (0.1, 0.5, 0.9):
        y = jax.jit(lambda k: dropout(x, rate, k, False))(_key())
        t = int(round((1.0 - rate) * 256.0))
        keep = float((y != 0).mean())
        assert abs(keep - t / 256.0) < 3e-3, (rate, keep)
        # inverted-dropout rescale uses the actual keep prob -> unbiased
        assert abs(float(y.mean()) - 1.0) < 5e-3, (rate, float(y.mean()))
        nz = np.unique(np.asarray(y)[np.asarray(y) != 0.0])
        assert nz.size == 1 and abs(nz[0] - 256.0 / t) < 1e-6


def test_same_key_reproducible_different_keys_differ():
    x = jnp.ones((64, 64))
    a = dropout(x, 0.2, _key(), False)
    b = dropout(x, 0.2, _key(), False)
    c = dropout(x, 0.2, jax.random.key(8, impl="rbg"), False)
    assert (np.asarray(a) == np.asarray(b)).all()
    assert (np.asarray(a) != np.asarray(c)).any()
