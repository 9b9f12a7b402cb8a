"""Golden parity for the M3P generation surface (models/m3p_gen.py) vs
the reference M3PTransformerModel run in-process by
tools/make_golden_m3p_gen.py: crossfwd (plain + causal-with-source), the
AoA-refined ImageEmbedding, the predict() head family, the VAE latents,
and token-exact greedy/beam generation."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from clg_vqa_tpu.config import M3PConfig
from clg_vqa_tpu.models import m3p_gen
from clg_vqa_tpu.utils.convert import (m3p_gen_components_to_pytree,
                                       volta_m3p_to_pytree)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "m3p_gen_golden.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE),
    reason="run tools/make_golden_m3p_gen.py first")


@pytest.fixture(scope="module")
def world():
    g = np.load(FIXTURE, allow_pickle=False)
    nL = int(g["n_layers"])
    rl = int(g["refine_layers"])
    sd = {k[len("sd::"):]: np.asarray(g[k]) for k in g.files
          if k.startswith("sd::")}
    H = sd["embeddings.weight"].shape[1]
    cfg = M3PConfig(vocab_size=sd["embeddings.weight"].shape[0],
                    hidden_size=H, num_layers=nL,
                    num_heads=4, intermediate_size=4 * H, num_locs=5,
                    pooler_size=H, clf_hidden_size=2 * H, pad_token_id=1)
    base = volta_m3p_to_pytree(
        {"bert.encoder." + k: v for k, v in sd.items()}, cfg)
    base["gen"] = m3p_gen_components_to_pytree(sd, cfg, refine_layers=rl)
    return g, cfg, base


def test_crossfwd_plain(world):
    g, cfg, params = world
    h = m3p_gen.crossfwd(params, cfg, jnp.asarray(g["x"], jnp.int32),
                         jnp.asarray(g["lengths"], jnp.int32), causal=False)
    np.testing.assert_allclose(np.asarray(h), g["t_plain"],
                               rtol=2e-4, atol=2e-5)


def test_crossfwd_causal_with_source(world):
    g, cfg, params = world
    h = m3p_gen.crossfwd(params, cfg, jnp.asarray(g["x"], jnp.int32),
                         jnp.asarray(g["lengths"], jnp.int32), causal=True,
                         src_enc=jnp.asarray(g["src_enc"]),
                         src_len=jnp.asarray(g["src_len"], jnp.int32))
    np.testing.assert_allclose(np.asarray(h), g["t_causal"],
                               rtol=2e-4, atol=2e-5)


def test_image_embedding_aoa_refined(world):
    g, cfg, params = world
    feats = jnp.asarray(g["feats"]).transpose(1, 0, 2)   # [B, R, 2048]
    locs = jnp.asarray(g["locs"]).transpose(1, 0, 2)
    t, _ = m3p_gen.image_embed_refined(params, cfg, feats, locs,
                                       jnp.asarray(g["img_len"], jnp.int32))
    np.testing.assert_allclose(np.asarray(t), g["img_refined"],
                               rtol=2e-4, atol=2e-5)


def test_predict_heads(world):
    g, cfg, params = world
    t = jnp.asarray(g["t_causal"])                        # [B, T, H]
    np.testing.assert_allclose(
        np.asarray(m3p_gen.predict(params, cfg, t, head="relation")),
        g["rel"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(m3p_gen.predict(params, cfg, t, head="clcm")),
        g["clcm"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(m3p_gen.predict(params, cfg, t, head="mrfr")),
        g["mrfr"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(m3p_gen.predict(params, cfg, t, head="obj")),
        g["obj_scores"], rtol=2e-4, atol=3e-5)

    # MLM: scores at the masked positions + mean CE, matching the
    # reference's (slen, bs)-ordered boolean selection
    scores = m3p_gen.predict(params, cfg, t, head="mlm")   # [B, T, V]
    pm = np.asarray(g["pred_mask"], bool)                  # [T, B]
    ours_sel = np.asarray(scores).transpose(1, 0, 2)[pm]
    np.testing.assert_allclose(ours_sel, g["mlm_scores"],
                               rtol=2e-4, atol=2e-5)
    y_full = np.zeros(pm.shape, np.int32)
    y_full[pm] = g["mlm_y"]
    loss = m3p_gen.mlm_loss(jnp.asarray(np.asarray(scores).transpose(1, 0, 2)),
                            jnp.asarray(y_full), jnp.asarray(pm))
    np.testing.assert_allclose(float(loss), float(g["mlm_loss"]), rtol=2e-5)


def test_vae_and_latent_decoder(world):
    g, cfg, params = world
    out, kld = m3p_gen.vae_encode(params["gen"], jnp.asarray(g["vae_x"]),
                                  jnp.asarray(g["vae_c"]))
    assert kld is None
    np.testing.assert_allclose(np.asarray(out), g["vae_out"],
                               rtol=2e-4, atol=2e-5)
    ld = m3p_gen.latent_decode(params["gen"], jnp.asarray(g["ld_in"]))
    np.testing.assert_allclose(np.asarray(ld), g["ld_out"],
                               rtol=2e-4, atol=2e-5)


def test_greedy_generation_token_exact(world):
    """The compiled fixed-shape decode loop reproduces the reference's
    greedy generate() TOKEN FOR TOKEN (and length for length)."""
    g, cfg, params = world
    gen, gen_len = m3p_gen.generate_greedy(
        params, cfg, jnp.asarray(g["src_enc"]),
        jnp.asarray(g["src_len"], jnp.int32), max_len=12)
    ref = np.asarray(g["gen"])                           # [cur_len, B]
    np.testing.assert_array_equal(np.asarray(gen)[:ref.shape[0]], ref)
    np.testing.assert_array_equal(np.asarray(gen_len), g["gen_len"])
    # rows past the reference's cur_len are PAD by construction
    assert (np.asarray(gen)[ref.shape[0]:] == cfg.pad_token_id).all() or \
        ref.shape[0] == 12


def test_beam_generation_token_exact(world):
    """The fixed-shape beam search reproduces the reference's
    generate_beam (beam 3, length_penalty 1.0) token for token, including
    hypothesis bookkeeping and final best-hypothesis selection."""
    g, cfg, params = world
    dec, tgt_len = m3p_gen.generate_beam(
        params, cfg, jnp.asarray(g["src_enc"]),
        jnp.asarray(g["src_len"], jnp.int32), beam_size=3,
        length_penalty=1.0, early_stopping=False, max_len=12, lang_id=0)
    ref = np.asarray(g["beam"])                           # [tgt_max, B]
    np.testing.assert_array_equal(np.asarray(tgt_len), g["beam_len"])
    np.testing.assert_array_equal(np.asarray(dec)[:ref.shape[0]], ref)
    assert (np.asarray(dec)[ref.shape[0]:] == cfg.pad_token_id).all() or \
        ref.shape[0] == 12
