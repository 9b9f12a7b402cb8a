"""Visual pretraining criterions — jax rebuilds of volta/volta/losses.py:16-147.

Keyed "0".."6" like the reference's ``pre_vis_criterions`` and selected by
``visual_target_weights`` in the model config (uc2_base.json uses {"0": 1.0}:
KL against the detector's 1601-way soft class distribution). All losses mask
to positions with label==1 (the masked-region indicator) and normalize by the
masked count, exactly as the reference does.

``nce_2048`` is reformulated without python loops: negatives are drawn with
jax RNG (the reference draws with torch RNG — the *distribution* is matched,
the stream is not; this only affects pretraining-time sampling noise).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

PRE_VIS_TARGETS = {"0": 1601, "1": 2048, "2": 2048, "3": 1600, "4": 400,
                   "5": 2048, "6": 1601}


def _masked_mean(loss, mask01, count):
    return jnp.sum(loss * mask01) / jnp.maximum(count, 1)


def kl_1601(pred, label, *, image_cls=None, **_):
    logp = jax.nn.log_softmax(pred, axis=2)
    loss = image_cls * (jnp.log(jnp.clip(image_cls, 1e-12)) - logp)
    m = (label == 1).astype(pred.dtype)
    return jnp.sum(loss * m[:, :, None]) / jnp.maximum(jnp.sum(m), 1)


def mse_2048(pred, label, *, image_feat=None, **_):
    loss = jnp.square(pred - image_feat)
    m = (label == 1).astype(pred.dtype)
    return jnp.sum(loss * m[:, :, None]) / jnp.maximum(
        jnp.sum(m) * pred.shape[-1], 1)


def huber_2048(pred, label, *, image_feat=None, **_):
    d = pred - image_feat
    ad = jnp.abs(d)
    loss = jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)
    m = (label == 1).astype(pred.dtype)
    return jnp.sum(loss * m[:, :, None]) / jnp.maximum(
        jnp.sum(m) * pred.shape[-1], 1)


def _xent_hard(pred, label, targets, confs, n_cls):
    logp = jax.nn.log_softmax(pred.reshape(-1, n_cls), axis=-1)
    ce = -jnp.take_along_axis(logp, targets.reshape(-1, 1), -1)[:, 0]
    if confs is not None:
        ce = ce * confs.reshape(-1)
    m = (label.reshape(-1) == 1).astype(pred.dtype)
    return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1)


def xent_1600(pred, label, *, obj_labels=None, obj_confs=None, **_):
    return _xent_hard(pred, label, obj_labels, obj_confs, 1600)


def xent_400(pred, label, *, attr_labels=None, attr_confs=None, **_):
    return _xent_hard(pred, label, attr_labels, attr_confs, 400)


def xent_1601(pred, label, *, obj_labels=None, **_):
    return _xent_hard(pred, label, obj_labels, None, 1601)


def nce_2048(pred, label, *, image_feat=None, rng=None,
             num_negative: int = 128, **_):
    """Contrastive feature prediction: positives = true region feature,
    negatives = 70% cross-batch + 30% in-batch random regions."""
    B, R, D = pred.shape
    n_across = int(num_negative * 0.7)
    n_inside = int(num_negative * 0.3)
    r1, r2, r3 = jax.random.split(rng, 3)
    rows_a = jax.random.randint(r1, (B, R, n_across), 0, B - 1)
    rows_a = jnp.where(rows_a == jnp.arange(B)[:, None, None], B - 1, rows_a)
    cols_a = jax.random.randint(r2, (B, R, n_across), 0, R)
    idx_a = rows_a * R + cols_a
    cols_i = jax.random.randint(r3, (B, R, n_inside), 0, R - 1)
    cols_i = jnp.where(cols_i == jnp.arange(R)[None, :, None], R - 1, cols_i)
    idx_i = jnp.arange(B)[:, None, None] * R + cols_i
    idx = jnp.concatenate([idx_a, idx_i], axis=2)            # [B, R, K]

    flat = image_feat.reshape(B * R, D)
    negs = flat[idx]                                         # [B, R, K, D]
    samples = jnp.concatenate([image_feat[:, :, None, :], negs], axis=2)
    scores = jnp.einsum("brkd,brd->brk", samples, pred)      # [B, R, K+1]
    logp = jax.nn.log_softmax(scores, axis=-1)
    ce = -logp[:, :, 0]
    m = (label == 1).astype(pred.dtype)
    return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1)


PRE_VIS_CRITERIONS = {"0": kl_1601, "1": mse_2048, "2": nce_2048,
                      "3": xent_1600, "4": xent_400, "5": huber_2048,
                      "6": xent_1601}


def masked_lm_loss(logits, labels, ignore_index: int = -1):
    """BertForVLPreTraining text loss: CE with ignore_index=-1
    (encoders.py:1051)."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, safe[..., None], -1)[..., 0]
    return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1)


def itm_loss(logits, is_match):
    """Image-text matching binary CE (seq_relationship head)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, is_match[:, None], -1))
