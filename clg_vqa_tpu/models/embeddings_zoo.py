"""VOLTA embedding zoo — the text/dual/bimodal embedding variants of the
general gated encoder (volta/volta/embeddings.py:39-677), TPU-rebuilt as
pure functions over plain param pytrees.

Covered (reference classes, file:line):
 - text:    BertEmbeddings (:39-70), RobertaEmbeddings (:73-114 — NOTE the
            reference adds ONLY word embeddings; the position/token-type
            adds are commented out at :111, a quirk kept bit-for-bit)
 - dual:    ViLBertImageEmbeddings (:201-220), LxmertImageEmbeddings
            (:223-246)
 - bimodal: VLBertEmbeddings (:258-375), VisualBertEmbeddings (:378-472),
            UniterEmbeddings (:475-542)
(UC2Embeddings/M3PEmbeddings live in models/{uc2,m3p}.py — the two
flagship CLG-VQA models keep their dedicated collapsed/scanned paths.)

Numerics pinned to the reference: TF-style LayerNorm (eps inside sqrt),
erf GeLU, padding_idx rows zero-initialized, the VL-BERT in-place
feature/position surgeries re-expressed as masked selects.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L

Params = dict


# ---------------------------------------------------------------------------
# Text
# ---------------------------------------------------------------------------

def init_bert_text(rng, cfg) -> Params:
    ks = iter(jax.random.split(rng, 4))
    H, std = cfg.hidden_size, cfg.initializer_range
    pad = 0 if cfg.model == "bert" else cfg.pad_token_id
    return {
        "word": L.init_embedding(next(ks), cfg.vocab_size, H, std,
                                 padding_idx=pad),
        "position": L.init_embedding(next(ks), cfg.max_position_embeddings,
                                     H, std),
        "token_type": L.init_embedding(next(ks), cfg.type_vocab_size, H, std),
        "ln": L.init_ln(H),
    }


def bert_text_embed(p: Params, cfg, input_ids, token_type_ids, *,
                    deterministic=True, rng=None):
    """BertEmbeddings (model='bert') / RobertaEmbeddings (model='roberta').

    The roberta variant reproduces the reference EXACTLY: only the word
    embedding is used (embeddings.py:111 comments out the position and
    token-type adds) — the tables still exist in the state dict."""
    if cfg.model == "roberta":
        t = L.embedding_lookup(p["word"], input_ids)
    else:
        S = input_ids.shape[1]
        pos_ids = jnp.broadcast_to(jnp.arange(S), input_ids.shape)
        t = (L.embedding_lookup(p["word"], input_ids)
             + p["position"][pos_ids]
             + p["token_type"][token_type_ids])
    t = L.layer_norm(t, p["ln"]["scale"], p["ln"]["bias"],
                     cfg.layer_norm_eps)
    return L.dropout(t, cfg.hidden_dropout_prob, rng, deterministic)


# ---------------------------------------------------------------------------
# Dual image embeddings (ViLBERT / LXMERT)
# ---------------------------------------------------------------------------

def init_dual_image(rng, cfg) -> Params:
    ks = iter(jax.random.split(rng, 2))
    V, std = cfg.v_hidden_size, cfg.initializer_range
    p = {"image": L.init_linear(next(ks), cfg.v_feature_size, V, std),
         "loc": L.init_linear(next(ks), cfg.num_locs, V, std)}
    if cfg.image_embeddings == "lxmert":
        p["img_ln"] = L.init_ln(V)
        p["loc_ln"] = L.init_ln(V)
    else:
        p["ln"] = L.init_ln(V)
    return p


def dual_image_embed(p: Params, cfg, features, locs, *, deterministic=True,
                     rng=None):
    eps = cfg.layer_norm_eps
    img = L.linear(features, p["image"])
    loc = L.linear(locs, p["loc"])
    if cfg.image_embeddings == "lxmert":
        # LN each then average (embeddings.py:236-246)
        v = (L.layer_norm(img, p["img_ln"]["scale"], p["img_ln"]["bias"], eps)
             + L.layer_norm(loc, p["loc_ln"]["scale"], p["loc_ln"]["bias"],
                            eps)) / 2.0
    else:
        # ViLBERT: LN(img + loc) (embeddings.py:213-220)
        v = L.layer_norm(img + loc, p["ln"]["scale"], p["ln"]["bias"], eps)
    return L.dropout(v, cfg.v_hidden_dropout_prob, rng, deterministic)


# ---------------------------------------------------------------------------
# VisualBERT (bimodal: one LN over the concatenated [text; image] stream)
# ---------------------------------------------------------------------------

def init_visualbert(rng, cfg) -> Params:
    # fold before splitting: jax.random.split is prefix-stable, so handing
    # the SAME rng to both split() and init_bert_text would draw the
    # projection weights from the word-table key
    ks = iter(jax.random.split(jax.random.fold_in(rng, 1), 6))
    H, std = cfg.hidden_size, cfg.initializer_range
    p = init_bert_text(jax.random.fold_in(rng, 0), cfg)
    p["projection"] = L.init_linear(next(ks), cfg.v_feature_size, H, std)
    # special_initialize (embeddings.py:402-408): the visual type/position
    # tables START as copies of the text tables (independent thereafter)
    p["v_token_type"] = jnp.array(p["token_type"])
    p["v_position"] = jnp.array(p["position"])
    return p


def visualbert_embed(p: Params, cfg, input_ids, features, locs,
                     token_type_ids, *, deterministic=True, rng=None):
    """VisualBertEmbeddings.forward (embeddings.py:410-472): text as BERT,
    image = projection + visual-position[0] + visual-type[1], then ONE
    LayerNorm+dropout over the concatenation, split back."""
    B, S = input_ids.shape
    eps = cfg.layer_norm_eps
    pos_ids = jnp.broadcast_to(jnp.arange(S), input_ids.shape)
    t = (L.embedding_lookup(p["word"], input_ids)
         + p["position"][pos_ids] + p["token_type"][token_type_ids])
    v = (L.linear(features, p["projection"])
         + p["v_position"][0][None, None, :]
         + p["v_token_type"][1][None, None, :])
    joint = jnp.concatenate([t, v], axis=1)
    joint = L.layer_norm(joint, p["ln"]["scale"], p["ln"]["bias"], eps)
    joint = L.dropout(joint, cfg.hidden_dropout_prob, rng, deterministic)
    return joint[:, :S], joint[:, S:]


# ---------------------------------------------------------------------------
# UNITER
# ---------------------------------------------------------------------------

def init_uniter(rng, cfg) -> Params:
    ks = iter(jax.random.split(jax.random.fold_in(rng, 1), 8))
    H, std = cfg.hidden_size, cfg.initializer_range
    p = init_bert_text(jax.random.fold_in(rng, 0), cfg)
    p["image"] = L.init_linear(next(ks), cfg.v_feature_size,
                               cfg.v_hidden_size, std)
    p["loc"] = L.init_linear(next(ks), cfg.num_locs, cfg.v_hidden_size, std)
    if cfg.model == "roberta":
        p["image_token_type"] = L.init_embedding(
            next(ks), cfg.type_vocab_size, H, std)
    p["image_ln"] = L.init_ln(H)
    p["loc_ln"] = L.init_ln(H)
    # special_initialize (embeddings.py:512-516): v_LayerNorm starts as a
    # copy of the text LayerNorm
    p["v_ln"] = {"scale": jnp.array(p["ln"]["scale"]),
                 "bias": jnp.array(p["ln"]["bias"])}
    return p


def uniter_embed(p: Params, cfg, input_ids, features, locs, token_type_ids,
                 *, deterministic=True, rng=None):
    """UniterEmbeddings.forward (embeddings.py:514-542). model='roberta'
    uses pad-skipping position ids and image type index 0 from the SEPARATE
    image table; model='bert' uses arange positions and the TEXT type table
    at index 1."""
    eps = cfg.layer_norm_eps
    S = input_ids.shape[1]
    if cfg.model == "roberta":
        pos_ids = L.create_position_ids_from_input_ids(input_ids,
                                                       cfg.pad_token_id)
    else:
        pos_ids = jnp.broadcast_to(jnp.arange(S), input_ids.shape)
    t = (L.embedding_lookup(p["word"], input_ids)
         + p["position"][pos_ids] + p["token_type"][token_type_ids])
    t = L.layer_norm(t, p["ln"]["scale"], p["ln"]["bias"], eps)

    img = L.layer_norm(L.linear(features, p["image"]),
                       p["image_ln"]["scale"], p["image_ln"]["bias"], eps)
    loc = L.layer_norm(L.linear(locs, p["loc"]),
                       p["loc_ln"]["scale"], p["loc_ln"]["bias"], eps)
    type_table = (p["image_token_type"] if cfg.model == "roberta"
                  else p["token_type"])
    type_ix = 1 - int(cfg.model == "roberta")      # embeddings.py:538
    v = img + loc + type_table[type_ix][None, None, :]
    v = L.layer_norm(v, p["v_ln"]["scale"], p["v_ln"]["bias"], eps)
    if not deterministic:
        r1, r2 = jax.random.split(rng)
    else:
        r1 = r2 = None
    t = L.dropout(t, cfg.hidden_dropout_prob, r1, deterministic)
    v = L.dropout(v, cfg.hidden_dropout_prob, r2, deterministic)
    return t, v


# ---------------------------------------------------------------------------
# VL-BERT
# ---------------------------------------------------------------------------

def coordinate_embeddings(boxes: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sin/cos box-geometry embeddings (embeddings.py:179-198):
    boxes [B, K, >=4] xyxy -> [B, K, 4, 2*dim]."""
    x_c = (boxes[..., 0] + boxes[..., 2]) / 2 * 100
    y_c = (boxes[..., 1] + boxes[..., 3]) / 2 * 100
    w = (boxes[..., 2] - boxes[..., 0]) * 100
    h = (boxes[..., 3] - boxes[..., 1]) * 100
    pos = jnp.stack([x_c, y_c, w, h], axis=-1)          # [B, K, 4]
    dim_mat = 1000.0 ** (jnp.arange(dim, dtype=boxes.dtype) / float(dim))
    ang = pos[..., None] / dim_mat                      # [B, K, 4, dim]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def init_vlbert(rng, cfg) -> Params:
    ks = iter(jax.random.split(rng, 10))
    H, V, std = cfg.hidden_size, cfg.v_hidden_size, cfg.initializer_range
    p = {
        "word": L.init_embedding(next(ks), cfg.vocab_size, H, std,
                                 padding_idx=0),
        "position": L.init_embedding(next(ks), cfg.max_position_embeddings,
                                     H, std),
        "token_type": L.init_embedding(next(ks), cfg.type_vocab_size, H,
                                       std),
        # obj_downsample: dropout -> linear(2*v_feat, v_hidden) -> relu
        # (xavier init, embeddings.py:306)
        "obj_downsample": L.init_linear_xavier(
            next(ks), 2 * cfg.v_feature_size, V),
        "object_linguistic": jax.random.normal(next(ks), (1, H)) * std,
        "object_mask_visual": jnp.zeros((1, cfg.v_feature_size)),
        "end": jax.random.normal(next(ks), (1, H)) * std,
        # visual_ln_{text,object} scales START at 0 (embeddings.py:311-312)
        "visual_ln_text": {"scale": jnp.zeros((H,)), "bias": jnp.zeros((H,))},
        "visual_ln_object": {"scale": jnp.zeros((H,)),
                             "bias": jnp.zeros((H,))},
        "ln": L.init_ln(H),
    }
    if cfg.v_hidden_size != cfg.hidden_size:
        p["visual_1x1_text"] = L.init_linear(next(ks), V, H, std)
        p["visual_1x1_object"] = L.init_linear(next(ks), V, H, std)
    if cfg.visual_target_weights.get("6", 0) > 0:
        p["object_mask_word"] = jax.random.normal(next(ks), (1, H)) * std
    return p


def vlbert_embed(p: Params, cfg, input_ids, features, locs, token_type_ids,
                 *, deterministic=True, rng=None):
    """VLBertEmbeddings.forward (embeddings.py:314-375). The reference's
    in-place surgeries become masked selects:
      - all-zero feature rows are replaced by object_mask_visual (:317-318);
      - the LAST object's linguistic embedding is the end token (:341);
      - text positions at/after text_end shift by num_boxes; objects sit at
        text_end, the last object at text_end+1 (:357-363)."""
    B, S = input_ids.shape
    R = features.shape[1]
    eps = cfg.layer_norm_eps

    mvrc_mask = jnp.all(features == 0.0, axis=-1)        # [B, R]
    feats = jnp.where(mvrc_mask[..., None], p["object_mask_visual"][0],
                      features)

    coord = coordinate_embeddings(locs,
                                  cfg.v_coordinate_embeddings_dim)
    cat = jnp.concatenate([coord.reshape(B, R, -1),
                           feats.reshape(B, R, -1)], axis=-1)
    if not deterministic:
        rng, r = jax.random.split(rng)
        cat = L.dropout(cat, cfg.v_attention_probs_dropout_prob, r,
                        deterministic)
    final = jax.nn.relu(L.linear(cat, p["obj_downsample"]))  # [B, R, V]

    obj_vis = final
    if "visual_1x1_object" in p:
        obj_vis = L.linear(obj_vis, p["visual_1x1_object"])
    obj_vis = L.layer_norm(obj_vis, p["visual_ln_object"]["scale"],
                           p["visual_ln_object"]["bias"], eps)
    obj_ling = jnp.broadcast_to(p["object_linguistic"][0], (B, R,) +
                                p["object_linguistic"][0].shape)
    if "object_mask_word" in p:
        obj_ling = jnp.where(mvrc_mask[..., None], p["object_mask_word"][0],
                             obj_ling)
    # last object = end embedding
    obj_ling = obj_ling.at[:, -1].set(p["end"][0])
    obj_vl = obj_ling + obj_vis

    text_ling = L.embedding_lookup(p["word"], input_ids)
    text_vis = jnp.broadcast_to(final[:, -1][:, None, :], (B, S,
                                                           final.shape[-1]))
    if "visual_1x1_text" in p:
        text_vis = L.linear(text_vis, p["visual_1x1_text"])
    text_vis = L.layer_norm(text_vis, p["visual_ln_text"]["scale"],
                            p["visual_ln_text"]["bias"], eps)
    text_vl = text_ling + text_vis

    text_end = jnp.sum(input_ids != 0, axis=1, keepdims=True)  # [B, 1]
    t_type = p["token_type"][token_type_ids]
    o_type = jnp.broadcast_to(p["token_type"][2], (B, R,) +
                              p["token_type"][2].shape)

    # REFERENCE BUG KEPT BIT-FOR-BIT (embeddings.py:357-361): the in-place
    # `text_position_ids[mask] += num_boxes` runs on an EXPANDED tensor
    # (arange .unsqueeze(0).expand_as -> stride-0 batch dim, one shared
    # storage row; torch emits the index_put_-on-expanded deprecation
    # warning here). Every batch row writes through to the same storage,
    # so a column shifts for ALL rows if ANY row's text ends before it.
    pos1 = jnp.arange(S)
    shift_any = jnp.any(pos1[None, :] >= text_end, axis=0)        # [S]
    pos = jnp.broadcast_to(jnp.where(shift_any, pos1 + R, pos1), (B, S))
    obj_pos = jnp.broadcast_to(text_end, (B, R))
    obj_pos = obj_pos.at[:, -1].add(1)
    t_pos = p["position"][pos]
    o_pos = p["position"][obj_pos]

    t = text_vl + t_pos + t_type
    v = obj_vl + o_pos + o_type
    joint = jnp.concatenate([t, v], axis=1)
    joint = L.layer_norm(joint, p["ln"]["scale"], p["ln"]["bias"], eps)
    joint = L.dropout(joint, cfg.hidden_dropout_prob, rng, deterministic)
    return joint[:, :S], joint[:, S:]
