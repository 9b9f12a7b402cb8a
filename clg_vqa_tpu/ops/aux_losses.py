"""Auxiliary loss zoo — the task_utils.py loss classes outside the main
GQA recipe (semantic-prior CE lives in ops/semantic_prior.py).

Reference (behavior spec, no code copied): volta/volta/task_utils.py:22-192 —
Custom_CrossEntropy_PSKD (22), loss_kd_regularization / Tf-KD_reg (36),
CosineLoss (62), loss_kd_self / Tf-KD_self (79), mse_loss (115),
cosine_loss (139), LogitNormLoss (161), triplet_loss (176), LossMap (185).
All are pure functions of logits/targets, jittable, fp32 accumulation.

Reduction/quirk notes (pinned by tests/test_aux_losses.py vs torch):
- PSKD CE reduces ``(-targets * log_probs).mean(0).sum()`` — mean over batch
  FIRST, then sum over classes (== batch-mean of per-sample sums).
- torch ``KLDivLoss(reduction="batchmean")(p_log, q)`` is
  ``sum(q * (log q - p_log)) / B`` with 0*log0 := 0 (xlogy semantics).
- cosine_teacher_loss SUMS (1 - cos) over the batch (task_utils.py:155),
  not means — the trailing ``.mean()`` acts on a scalar.
- Tf-KD_reg multiplies the KL *target* by ``similarity`` BEFORE the log
  (task_utils.py:55), so similarity enters through both q and log q.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import xlogy


def _f32(x):
    return jnp.asarray(x, jnp.float32)


def _ce_mean(logits, labels):
    """F.cross_entropy(logits, labels) with integer labels, mean reduction."""
    logp = jax.nn.log_softmax(_f32(logits), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def _kl_batchmean(p_log, q):
    """torch.nn.KLDivLoss(reduction="batchmean")(p_log, q)."""
    return jnp.sum(xlogy(q, q) - q * p_log) / p_log.shape[0]


def pskd_cross_entropy(logits: jnp.ndarray, soft_targets: jnp.ndarray):
    """Custom_CrossEntropy_PSKD (task_utils.py:22-34): soft-target CE,
    ``(-targets * log_softmax(logits)).mean(0).sum()``."""
    logp = jax.nn.log_softmax(_f32(logits), axis=-1)
    return jnp.sum(jnp.mean(-_f32(soft_targets) * logp, axis=0))


def kd_regularization_loss(logits: jnp.ndarray, target_onehot: jnp.ndarray,
                           similarity: jnp.ndarray, *, alpha: float = 0.1,
                           temperature: float = 20.0,
                           correct_prob: float = 0.99):
    """Tf-KD_reg (task_utils.py:36-59): CE against argmax labels blended with
    a KL to a manually-designed near-uniform teacher, scaled elementwise by
    ``similarity`` (the semantic-prior row)."""
    logits, target_onehot = _f32(logits), _f32(target_onehot)
    labels = jnp.argmax(target_onehot, axis=1)
    ce = _ce_mean(logits, labels)
    K = logits.shape[1]
    teacher = jnp.full_like(logits, (1.0 - correct_prob) / (K - 1))
    teacher = teacher.at[jnp.arange(logits.shape[0]), labels].set(correct_prob)
    q = jax.nn.softmax(teacher / temperature, axis=1) * _f32(similarity)
    regu = _kl_batchmean(jax.nn.log_softmax(logits, axis=1), q)
    return (1.0 - alpha) * ce + alpha * regu


def cosine_rep_loss(logits: jnp.ndarray, target_onehot: jnp.ndarray,
                    teacher_rep: jnp.ndarray, epoch: int, *,
                    multiplier: float = 10.0):
    """CosineLoss (task_utils.py:62-77): CE, plus after epoch 4 the mean
    (1 - cos) between student and teacher softmax distributions x10."""
    logits = _f32(logits)
    ce = _ce_mean(logits, jnp.argmax(_f32(target_onehot), axis=1))
    if epoch <= 4:                      # static schedule switch
        return ce
    p = jax.nn.softmax(logits, axis=-1)
    q = jax.nn.softmax(_f32(teacher_rep), axis=-1)
    cos = jnp.sum(p * q, axis=-1) / (
        jnp.linalg.norm(p, axis=-1) * jnp.linalg.norm(q, axis=-1))
    return ce + multiplier * jnp.mean(1.0 - cos)


def kd_self_loss(logits: jnp.ndarray, target_onehot: jnp.ndarray,
                 teacher_logits: jnp.ndarray, epoch: int, *,
                 temperature: float = 20.0, top_k: int = 10,
                 multiplier: float = 1.0):
    """Tf-KD_self (task_utils.py:79-113): CE plus T^2-scaled KL between the
    student's top-k log-probs (of logits/T) and the teacher's softmax over
    the same top-k indices."""
    logits = _f32(logits)
    ce = _ce_mean(logits, jnp.argmax(_f32(target_onehot), axis=1))
    if epoch <= 0:
        return ce
    p_log = jax.nn.log_softmax(logits / temperature, axis=-1)
    p_top, idx = jax.lax.top_k(p_log, top_k)
    t_top = jnp.take_along_axis(_f32(teacher_logits), idx, axis=-1)
    q = jax.nn.softmax(t_top / temperature, axis=-1)
    return ce + _kl_batchmean(p_top, q) * temperature ** 2 * multiplier


def mse_teacher_loss(logits: jnp.ndarray, target_onehot: jnp.ndarray,
                     teacher_logits: jnp.ndarray, epoch: int, *,
                     top_k: int = 10, multiplier: float = 10.0):
    """mse_loss (task_utils.py:115-137): CE plus x10 MSE between the
    student's top-k softmax probs and the teacher's softmax over the same
    top-k indices."""
    logits = _f32(logits)
    ce = _ce_mean(logits, jnp.argmax(_f32(target_onehot), axis=1))
    if epoch <= 0:
        return ce
    p = jax.nn.softmax(logits, axis=-1)
    p_top, idx = jax.lax.top_k(p, top_k)
    t_top = jnp.take_along_axis(_f32(teacher_logits), idx, axis=-1)
    q = jax.nn.softmax(t_top, axis=-1)
    return ce + jnp.mean((p_top - q) ** 2) * multiplier


def cosine_teacher_loss(logits: jnp.ndarray, target_onehot: jnp.ndarray,
                        teacher_logits: jnp.ndarray, epoch: int, *,
                        top_k: int = 10, multiplier: float = 10.0):
    """cosine_loss (task_utils.py:139-160): CE plus x10 SUM over the batch
    of (1 - cos) between student top-k probs and teacher softmax over the
    same indices (reference sums, not means — see module docstring)."""
    logits = _f32(logits)
    ce = _ce_mean(logits, jnp.argmax(_f32(target_onehot), axis=1))
    if epoch <= 0:
        return ce
    p = jax.nn.softmax(logits, axis=-1)
    p_top, idx = jax.lax.top_k(p, top_k)
    t_top = jnp.take_along_axis(_f32(teacher_logits), idx, axis=-1)
    q = jax.nn.softmax(t_top, axis=-1)
    eps = 1e-8                           # nn.CosineSimilarity default eps
    denom = jnp.maximum(jnp.linalg.norm(p_top, axis=-1), eps) * \
        jnp.maximum(jnp.linalg.norm(q, axis=-1), eps)
    cos = jnp.sum(p_top * q, axis=-1) / denom
    return ce + multiplier * jnp.sum(1.0 - cos)


def logit_norm_loss(logits: jnp.ndarray, labels: jnp.ndarray, *,
                    t: float = 0.01):
    """LogitNormLoss (task_utils.py:161-170): CE of L2-normalized logits / t."""
    logits = _f32(logits)
    norms = jnp.linalg.norm(logits, axis=-1, keepdims=True) + 1e-7
    return _ce_mean(logits / norms / t, labels)


def triplet_loss(rank_scores: jnp.ndarray, target=None, *,
                 margin: float = 0.2):
    """triplet_loss (task_utils.py:176-181): sigmoid scores, hinge of
    (margin + neg - pos) over columns 1.. vs column 0, mean."""
    s = jax.nn.sigmoid(_f32(rank_scores))
    return jnp.mean(jnp.maximum(margin + s[:, 1:] - s[:, :1], 0.0))


def bce_with_logits_loss(logits: jnp.ndarray, targets: jnp.ndarray):
    """nn.BCEWithLogitsLoss(reduction="mean") — the VQA-style LossMap entry
    (task_utils.py:186)."""
    z, y = _f32(logits), _f32(targets)
    # log-sum-exp stable form: max(z,0) - z*y + log(1 + exp(-|z|))
    return jnp.mean(jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z))))


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray):
    """nn.CrossEntropyLoss() with integer labels (task_utils.py:187)."""
    return _ce_mean(logits, labels)


# task_utils.py:185-189; ForwardModelsTrain calls criterion(prediction,
# argmax(target)) for the GQA "VL-classifier-GQA" type (423) and
# criterion(prediction, target) for BCE types (409).
LOSS_MAP = {
    "BCEWithLogitLoss": bce_with_logits_loss,
    "CrossEntropyLoss": cross_entropy_loss,
    "TripletLoss": triplet_loss,
}
