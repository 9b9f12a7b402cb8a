"""VL pretraining heads + objective over the UC2 encoder.

Rebuilds ``BertForVLPreTraining`` (volta/volta/encoders.py:1045-1152,
heads at 700-786):
 - masked LM: transform (dense+gelu+LN) -> decoder TIED to the word
   embedding matrix + free bias (BertLMPredictionHead, encoders.py:684-698)
 - image-text matching: Linear(pooled -> itm_dim)
 - masked region modelling: BertImgPredictionHeadTransform + one decoder per
   enabled visual target ("0".."6", ops/pretrain_losses.py)

The fine-tuning path never runs these (CLG-VQA starts from released UC2/M3P
checkpoints), but the heads complete the model family and let the framework
run the same pretraining objectives.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import UC2Config
from ..ops.pretrain_losses import (PRE_VIS_CRITERIONS, PRE_VIS_TARGETS,
                                   itm_loss, masked_lm_loss)
from . import layers as L
from . import uc2

Params = dict[str, Any]


def init_pretrain_heads(rng, cfg: UC2Config, *, itm_dim: int = 2,
                        visual_target_weights=None) -> Params:
    visual_target_weights = visual_target_weights or {"0": 1.0}
    ks = iter(jax.random.split(rng, 16))
    H, V = cfg.hidden_size, cfg.vocab_size
    return {
        "lm": {
            "transform": L.init_linear_xavier(next(ks), H, H),
            "ln": L.init_ln(H),
            # decoder weight is TIED to embeddings.word; only the bias lives here
            "bias": jnp.zeros((V,), jnp.float32),
        },
        "itm": L.init_linear_xavier(next(ks), cfg.pooler_size, itm_dim),
        "img": {
            "transform": L.init_linear_xavier(next(ks), H, H),
            "ln": L.init_ln(H),
            "decoders": {
                ix: L.init_linear_xavier(next(ks), H, PRE_VIS_TARGETS[ix])
                for ix, wgt in visual_target_weights.items() if wgt > 0
            },
        },
    }


def pretrain_forward(params: Params, heads: Params, cfg: UC2Config,
                     batch: dict, *, deterministic=True, rng=None,
                     compute_dtype=None):
    """Returns (text_logits [B,T,V], itm_logits [B,itm_dim],
    vis_preds {key: [B,R,dim]})."""
    seq, pooled = uc2.encode(params, cfg, batch,
                             deterministic=deterministic, rng=rng,
                             compute_dtype=compute_dtype)
    T = batch["input_ids"].shape[1]
    seq_t, seq_v = seq[:, :T], seq[:, T:]

    lm = heads["lm"]
    h = L.gelu(L.linear(seq_t, lm["transform"], compute_dtype))
    h = L.layer_norm(h, lm["ln"]["scale"], lm["ln"]["bias"],
                     cfg.layer_norm_eps)
    text_logits = jnp.dot(h, params["embeddings"]["word"].T,
                          preferred_element_type=jnp.float32) + lm["bias"]

    itm_logits = L.linear(pooled, heads["itm"], compute_dtype)

    img = heads["img"]
    hv = L.gelu(L.linear(seq_v, img["transform"], compute_dtype))
    hv = L.layer_norm(hv, img["ln"]["scale"], img["ln"]["bias"],
                      cfg.layer_norm_eps)
    vis_preds = {ix: L.linear(hv, dec, compute_dtype)
                 for ix, dec in img["decoders"].items()}
    return text_logits, itm_logits, vis_preds


def pretrain_loss(params: Params, heads: Params, cfg: UC2Config, batch: dict,
                  *, visual_target_weights=None, rng=None,
                  compute_dtype=None):
    """MLM + ITM + weighted visual criterions (BertForVLPreTraining.forward
    loss accumulation, encoders.py:1098-1142)."""
    visual_target_weights = visual_target_weights or {"0": 1.0}
    text_logits, itm_logits, vis_preds = pretrain_forward(
        params, heads, cfg, batch, deterministic=rng is None, rng=rng,
        compute_dtype=compute_dtype)
    losses = {
        "masked_lm": masked_lm_loss(text_logits, batch["lm_labels"]),
        "itm": itm_loss(itm_logits, batch["is_match"]),
    }
    for ix, pred in vis_preds.items():
        crit = PRE_VIS_CRITERIONS[ix]
        losses[f"vis_{ix}"] = visual_target_weights[ix] * crit(
            pred.astype(jnp.float32), batch["image_label"],
            image_cls=batch.get("image_cls"),
            image_feat=batch.get("features"),
            obj_labels=batch.get("obj_labels"),
            obj_confs=batch.get("obj_confs"),
            attr_labels=batch.get("attr_labels"),
            attr_confs=batch.get("attr_confs"),
            rng=rng if rng is not None else jax.random.key(0))
    losses["total"] = sum(losses.values())
    return losses
