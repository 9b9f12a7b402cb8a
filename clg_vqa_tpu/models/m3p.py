"""M3P cross-modal encoder (XLM-style flat transformer), TPU-native.

Re-implements exactly the ``jointfwd`` path the reference uses for VQA
(volta/volta/m3p_transformer.py:877-964 via M3PModel/M3PForVLTasks,
volta/volta/encoders.py:1024-1042, 1262-1352):

 - image embeddings: Linear(2048->d) + Linear(5->d), LN(eps=1e-12), dropout
   (BertImageEmbeddings, m3p_transformer.py:231-271; the 1600-d distribution
   embedding input is always None on this path)
 - sequence = [image(100); text(40)] concat, shared position embeddings over
   the concatenated length
 - **prefix-length mask quirk**: validity is ``pos < len_img + len_text``
   over the *concatenated* sequence (get_masks, m3p_transformer.py:59-79).
   When an image has fewer than max_boxes regions, padding image slots "steal"
   validity from trailing text positions. This is a faithful reproduction of
   the reference's behavior, kept deliberately (it is what the released M3P
   checkpoints were fine-tuned with).
 - hidden*=mask, LN_emb(eps=1e-12), dropout
 - 12 post-norm blocks: MHA (q pre-scaled by 1/sqrt(d), masked_fill(-inf),
   softmax in fp32 — m3p_transformer.py:196-207), residual+LN1, FFN
   (lin2(gelu(lin1)) with trailing dropout), residual+LN2, hidden*=mask
 - pooled = tanh(Linear(seq[:,0])) — position 0 is the FIRST IMAGE REGION
   (BertPooler, m3p_transformer.py:548-560; M3PModel pools the joint output)
 - head: dropout(0.1) + SimpleClassifier(768 -> 1536 -> 1842)
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import M3PConfig
from . import layers as L

Params = dict[str, Any]

NEG_INF = -jnp.inf


def init_params(rng: jax.Array, cfg: M3PConfig) -> Params:
    ks = iter(jax.random.split(rng, 32))
    H, F, nL = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    std = cfg.initializer_range if hasattr(cfg, "initializer_range") else 0.02

    def stack_linear(d_in, d_out):
        k = next(ks)
        return {"w": jax.random.normal(k, (nL, d_in, d_out), jnp.float32) * std,
                "b": jnp.zeros((nL, d_out), jnp.float32)}

    def stack_ln():
        return {"scale": jnp.ones((nL, H), jnp.float32),
                "bias": jnp.zeros((nL, H), jnp.float32)}

    return {
        "embeddings": {
            "word": L.init_embedding(next(ks), cfg.vocab_size, H, std,
                                     padding_idx=cfg.pad_token_id),
            "position": L.init_embedding(next(ks), cfg.max_position_embeddings, H, std),
            "ln": L.init_ln(H),
            "image": L.init_linear(next(ks), cfg.v_feature_size, H, std),
            "loc": L.init_linear(next(ks), cfg.num_locs, H, std),
            "img_ln": L.init_ln(H),
        },
        "encoder": {
            "attn": {"q": stack_linear(H, H), "k": stack_linear(H, H),
                     "v": stack_linear(H, H), "o": stack_linear(H, H)},
            "ln1": stack_ln(),
            "ffn": {"w1": stack_linear(H, F), "w2": stack_linear(F, H)},
            "ln2": stack_ln(),
        },
        "pooler": L.init_linear(next(ks), H, cfg.pooler_size, std),
        "classifier": {
            "fc1": L.init_linear_xavier(next(ks), cfg.pooler_size, cfg.clf_hidden_size),
            "ln": L.init_ln(cfg.clf_hidden_size),
            "fc2": L.init_linear_xavier(next(ks), cfg.clf_hidden_size, cfg.num_labels),
        },
    }


def encode(params: Params, cfg: M3PConfig, batch: dict, *,
           deterministic: bool = True, rng=None, compute_dtype=None,
           remat: bool = False, unroll: bool = False,
           fused_attn: bool = False):
    """jointfwd (m3p_transformer.py:877-964). Returns (sequence, pooled).

    unroll: static 12-block program for the training path (see uc2.encode)."""
    e = params["embeddings"]
    eps = cfg.layer_norm_eps
    input_ids = batch["input_ids"]
    features, locs = batch["features"], batch["locs"]
    B, T = input_ids.shape
    R = features.shape[1]
    S = R + T

    txt_len = jnp.sum(batch["input_mask"], axis=1)
    img_len = jnp.sum(batch["image_mask"], axis=1)
    cat_len = txt_len + img_len
    # prefix-length validity over the concatenated sequence (get_masks quirk)
    pos = jnp.arange(S)[None, :]
    mask01 = (pos < cat_len[:, None]).astype(jnp.float32)       # [B, S]

    img = (L.linear(features, e["image"], compute_dtype)
           + L.linear(locs, e["loc"], compute_dtype))
    img = L.layer_norm(img, e["img_ln"]["scale"], e["img_ln"]["bias"], eps)
    if not deterministic:
        img = L.dropout(img, cfg.dropout, jax.random.fold_in(rng, 10), False)

    h = jnp.concatenate([img, L.embedding_lookup(e["word"], input_ids)],
                        axis=1)                                 # [B, S, H]
    h = h + e["position"][jnp.arange(S)][None, :, :]
    h = h * mask01[:, :, None]
    h = L.layer_norm(h, e["ln"]["scale"], e["ln"]["bias"], eps)
    if not deterministic:
        h = L.dropout(h, cfg.dropout, jax.random.fold_in(rng, 11), False)

    # key-mask attention bias: -inf at invalid keys (masked_fill semantics)
    bias = jnp.where(mask01[:, None, None, :] > 0, 0.0, NEG_INF)

    enc = params["encoder"]
    nL = cfg.num_layers
    if rng is None:
        layer_rngs = jnp.zeros((nL, 2), jnp.uint32)
    else:
        layer_rngs = jax.random.split(jax.random.fold_in(rng, 1), nL)

    def block(h, xs):
        p, krng = xs
        attn = L.multi_head_attention(
            h, h, p["attn"], cfg.num_heads, bias,
            dropout_rate=cfg.attention_dropout,
            rng=None if deterministic else jax.random.fold_in(krng, 0),
            deterministic=deterministic, compute_dtype=compute_dtype,
            scale_query=True, fused=fused_attn)
        attn = L.dropout(attn, cfg.dropout,
                         None if deterministic else jax.random.fold_in(krng, 1),
                         deterministic)
        h = L.layer_norm(attn + h, p["ln1"]["scale"], p["ln1"]["bias"], eps)
        ff = L.linear(L.gelu(L.linear(h, p["ffn"]["w1"], compute_dtype)),
                      p["ffn"]["w2"], compute_dtype)
        ff = L.dropout(ff, cfg.dropout,
                       None if deterministic else jax.random.fold_in(krng, 2),
                       deterministic)
        h = L.layer_norm(h + ff, p["ln2"]["scale"], p["ln2"]["bias"], eps)
        h = h * mask01[:, :, None]
        return h, None

    stacked = {"attn": enc["attn"], "ln1": enc["ln1"],
               "ffn": enc["ffn"], "ln2": enc["ln2"]}
    h = L.apply_blocks(block, h, stacked, layer_rngs, nL,
                       remat=remat, unroll=unroll)

    pooled = jnp.tanh(L.linear(h[:, 0], params["pooler"], compute_dtype))
    return h, pooled


def forward(params: Params, cfg: M3PConfig, batch: dict, *,
            deterministic: bool = True, rng=None,
            compute_dtype=None, remat: bool = False,
            unroll: bool = False, fused_attn: bool = False) -> jnp.ndarray:
    """M3PForVLTasks.forward for VL-classifier-GQA (encoders.py:1315-1352)."""
    _, pooled = encode(params, cfg, batch, deterministic=deterministic,
                       rng=None if rng is None else jax.random.fold_in(rng, 2),
                       compute_dtype=compute_dtype, remat=remat,
                       unroll=unroll, fused_attn=fused_attn)
    return L.classifier_head(
        pooled, params["classifier"], dropout_rate=cfg.clf_dropout_prob,
        ln_eps=cfg.layer_norm_eps,
        rng=None if rng is None else jax.random.fold_in(rng, 3),
        deterministic=deterministic, compute_dtype=compute_dtype)


def num_params(params: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
