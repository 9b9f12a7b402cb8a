"""Golden-logit parity: our M3P jointfwd vs the reference torch
implementation (fixture from tools/make_golden_m3p.py), including the
prefix-length mask quirk."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from clg_vqa_tpu.config import M3PConfig
from clg_vqa_tpu.models import m3p
from clg_vqa_tpu.utils.convert import volta_m3p_to_pytree, pytree_to_volta_m3p

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "m3p_golden.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(FIXTURE):
        pytest.skip("run tools/make_golden_m3p.py first")
    return np.load(FIXTURE)


@pytest.fixture(scope="module")
def cfg(golden):
    return M3PConfig(
        vocab_size=500, hidden_size=96, num_layers=int(golden["n_layers"]),
        num_heads=4, intermediate_size=384, v_feature_size=2048, num_locs=5,
        pooler_size=96, clf_hidden_size=192, num_labels=50, max_boxes=8)


@pytest.fixture(scope="module")
def params(golden, cfg):
    sd = {k[len("sd::"):]: golden[k] for k in golden.files if k.startswith("sd::")}
    return volta_m3p_to_pytree(sd, cfg)


@pytest.fixture(scope="module")
def batch(golden):
    return {
        "input_ids": jnp.asarray(golden["input_ids"], jnp.int32),
        "input_mask": jnp.asarray(golden["input_mask"], jnp.int32),
        "features": jnp.asarray(golden["features"]),
        "locs": jnp.asarray(golden["locs"]),
        "image_mask": jnp.asarray(golden["image_mask"], jnp.int32),
    }


def test_sequence_parity(golden, cfg, params, batch):
    seq, _ = m3p.encode(params, cfg, batch)
    np.testing.assert_allclose(np.asarray(seq), golden["sequence"],
                               rtol=2e-4, atol=2e-5)


def test_pooled_parity(golden, cfg, params, batch):
    _, pooled = m3p.encode(params, cfg, batch)
    np.testing.assert_allclose(np.asarray(pooled), golden["pooled"],
                               rtol=2e-4, atol=2e-5)


def test_logits_parity(golden, cfg, params, batch):
    logits = m3p.forward(params, cfg, batch)
    np.testing.assert_allclose(np.asarray(logits), golden["logits"],
                               rtol=2e-4, atol=5e-5)


def test_roundtrip_export(golden, cfg, params, batch):
    sd2 = pytree_to_volta_m3p(params)
    params2 = volta_m3p_to_pytree(sd2, cfg)
    logits1 = np.asarray(m3p.forward(params, cfg, batch))
    logits2 = np.asarray(m3p.forward(params2, cfg, batch))
    np.testing.assert_array_equal(logits1, logits2)
