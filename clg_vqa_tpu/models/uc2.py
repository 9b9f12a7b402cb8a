"""UC2 cross-modal encoder, TPU-native.

The reference implements UC2 as 24 interleaved "gated" sublayers
(volta/volta/encoders.py:164-575, 821-892) where every attention sublayer has
all four tt/tv/vt/vv flavours, text/vision weights are shared, and residual
LayerNorm is applied once over the concatenated [text; vision] sequence
("single_ln", encoders.py:415-424). With that wiring the joint softmax over
concatenated scores (encoders.py:286-296) is *exactly* standard attention over
the concatenated sequence, so the whole stack collapses to a 12-block
post-LN transformer over [text(40); image(36)] with one shared weight set.
We implement the collapsed form directly: per-layer weights are stacked along
a leading axis and the blocks run under ``lax.scan`` (one trace, XLA-fused,
MXU-shaped matmuls over the [B, 76, 768] joint sequence).

Embeddings follow UC2Embeddings (volta/volta/embeddings.py:606-669):
 - text: word + roberta-positions + token_type(0), LN(eps=1e-5), dropout
 - image: LN(Linear(feat 2048->768)) + LN(Linear(loc 7->768)) + token_type(1),
   LN, dropout  (image token-type table is *tied* to the text one,
   embeddings.py:630)
Pooling/head follow BertTextPooler (encoders.py:597-608; fusion_act defaults
to "relu", config.py:254) + SimpleClassifier Linear-GeLU-LN-Linear
(encoders.py:788-815) with a 0.1 dropout on the pooled output
(encoders.py:1158, 1240).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import UC2Config
from . import layers as L

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, cfg: UC2Config) -> Params:
    """Random init matching the reference's init_weights distributions
    (normal(0, 0.02) everywhere; xavier-uniform for the classifier,
    encoders.py:798-808)."""
    ks = iter(jax.random.split(rng, 64))
    H, F, nL = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    std = cfg.initializer_range

    def stack_linear(d_in, d_out):
        k = next(ks)
        return {
            "w": jax.random.normal(k, (nL, d_in, d_out), jnp.float32) * std,
            "b": jnp.zeros((nL, d_out), jnp.float32),
        }

    def stack_ln():
        return {"scale": jnp.ones((nL, H), jnp.float32),
                "bias": jnp.zeros((nL, H), jnp.float32)}

    return {
        "embeddings": {
            "word": L.init_embedding(next(ks), cfg.vocab_size, H, std,
                                     padding_idx=cfg.pad_token_id),
            "position": L.init_embedding(next(ks), cfg.max_position_embeddings, H, std),
            "token_type": L.init_embedding(next(ks), cfg.type_vocab_size, H, std),
            "ln": L.init_ln(H),
            "image": L.init_linear(next(ks), cfg.v_feature_size, H, std),
            "loc": L.init_linear(next(ks), cfg.num_locs, H, std),
            "image_ln": L.init_ln(H),
            "loc_ln": L.init_ln(H),
            "v_ln": L.init_ln(H),
        },
        "encoder": {
            "attn": {
                "q": stack_linear(H, H),
                "k": stack_linear(H, H),
                "v": stack_linear(H, H),
                "o": stack_linear(H, H),
            },
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


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def embed(params: Params, cfg: UC2Config, input_ids, features, locs,
          token_type_ids=None, *, deterministic=True, rng=None,
          compute_dtype=None):
    """UC2Embeddings.forward (volta/volta/embeddings.py:636-669)."""
    e = params["embeddings"]
    eps = cfg.layer_norm_eps
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)

    pos_ids = L.create_position_ids_from_input_ids(input_ids, cfg.pad_token_id)
    t = (L.embedding_lookup(e["word"], input_ids)
         + L.embedding_lookup(e["position"], pos_ids)
         + e["token_type"][token_type_ids])
    t = L.layer_norm(t, e["ln"]["scale"], e["ln"]["bias"], eps)

    img = L.layer_norm(L.linear(features, e["image"], compute_dtype),
                       e["image_ln"]["scale"], e["image_ln"]["bias"], eps)
    loc = L.layer_norm(L.linear(locs, e["loc"], compute_dtype),
                       e["loc_ln"]["scale"], e["loc_ln"]["bias"], eps)
    # image token-type embedding is the text table at index 1 (tied module,
    # embeddings.py:630, 662)
    v = img + loc + e["token_type"][1][None, None, :]
    v = L.layer_norm(v, e["v_ln"]["scale"], e["v_ln"]["bias"], eps)

    if not deterministic:
        r1, r2 = jax.random.split(rng)
        t = L.dropout(t, cfg.hidden_dropout_prob, r1, deterministic)
        v = L.dropout(v, cfg.hidden_dropout_prob, r2, deterministic)
    return t, v


def encode(params: Params, cfg: UC2Config, batch: dict, *,
           deterministic: bool = True, rng=None, compute_dtype=None,
           remat: bool = False, unroll: bool = False,
           fused_attn: bool = False):
    """Run embeddings + the collapsed 12-block joint encoder.

    Returns (joint_sequence [B, T+R, H], pooled [B, pooler_size]).

    unroll: unroll the block scan into a static 12-block program. On the
    training path this removes the scan's dynamic-update-slice traffic
    (stacking per-layer residuals for the backward + scattering per-layer
    dW into the stacked gradient), measured 81 -> 65 ms for the mbs=128
    gradient on v5e. Inference keeps the rolled scan (smaller program,
    marginally faster fwd).
    """
    input_ids = batch["input_ids"]
    t_emb, v_emb = embed(
        params, cfg, input_ids, batch["features"], batch["locs"],
        batch.get("token_type_ids"), deterministic=deterministic,
        rng=None if rng is None else jax.random.fold_in(rng, 0),
        compute_dtype=compute_dtype)

    joint = jnp.concatenate([t_emb, v_emb], axis=1)
    joint_mask01 = jnp.concatenate(
        [batch["input_mask"], batch["image_mask"]], axis=1)
    bias = L.additive_mask(joint_mask01)

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
            dropout_rate=cfg.attention_probs_dropout_prob,
            rng=None if deterministic else jax.random.fold_in(krng, 0),
            deterministic=deterministic, compute_dtype=compute_dtype,
            fused=fused_attn)
        attn = L.dropout(attn, cfg.hidden_dropout_prob,
                         None if deterministic else jax.random.fold_in(krng, 1),
                         deterministic)
        h = L.layer_norm(attn + h, p["ln1"]["scale"], p["ln1"]["bias"],
                         cfg.layer_norm_eps)
        ff = L.linear(L.gelu(L.linear(h, p["ffn"]["w1"], compute_dtype)),
                      p["ffn"]["w2"], compute_dtype)
        ff = L.dropout(ff, cfg.hidden_dropout_prob,
                       None if deterministic else jax.random.fold_in(krng, 2),
                       deterministic)
        h = L.layer_norm(ff + h, p["ln2"]["scale"], p["ln2"]["bias"],
                         cfg.layer_norm_eps)
        return h, None

    # NOTE: a trace-time fused [H,3H] qkv projection (L.fuse_qkv) was
    # measured SLOWER here on v5e (1230-1305 vs 1407 QA/s): the per-step
    # concat materializes 12x768x2304 fp32 (~85MB HBM traffic) that three
    # separate MXU-efficient [H,H] matmuls never pay. See docs/PERFORMANCE.md.
    stacked = {"attn": enc["attn"], "ln1": enc["ln1"],
               "ffn": enc["ffn"], "ln2": enc["ln2"]}
    # remat: recompute each block in backward instead of saving its
    # activations — trades ~30% encoder FLOPs for O(L) less HBM, letting the
    # full 256 batch train without gradient accumulation.
    # Per-layer-tuple leaves (layers.unstack_layer_params, the training
    # path) run as a static Python loop with independent grad leaves.
    joint = L.apply_blocks(block, joint, stacked, layer_rngs, nL,
                           remat=remat, unroll=unroll)

    # BertTextPooler on text token 0 == joint position 0 (text comes first);
    # fusion_act defaults to relu (volta/volta/config.py:254).
    pooled = L.linear(joint[:, 0], params["pooler"], compute_dtype)
    pooled = jax.nn.relu(pooled) if cfg.fusion_act == "relu" else jnp.tanh(pooled)
    return joint, pooled


def forward(params: Params, cfg: UC2Config, batch: dict, *,
            deterministic: bool = True, rng=None,
            compute_dtype=None, remat: bool = False,
            unroll: bool = False, fused_attn: bool = False) -> jnp.ndarray:
    """BertForVLTasks.forward for the VL-classifier-GQA head
    (volta/volta/encoders.py:1202-1259): fusion_method="text" -> dropout on
    pooled text, SimpleClassifier logits."""
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
