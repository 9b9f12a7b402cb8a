"""Parity of ops/aux_losses.py vs the reference torch formulations
(volta/volta/task_utils.py:22-192). Each torch side below is re-derived from
the reference's documented math — not imported — and pinned numerically."""
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from clg_vqa_tpu.ops import aux_losses as al

B, K = 6, 37
r = np.random.RandomState(0)
LOGITS = r.randn(B, K).astype(np.float32) * 3
TEACHER = r.randn(B, K).astype(np.float32) * 2
LABELS = r.randint(0, K, (B,)).astype(np.int64)
ONEHOT = np.eye(K, dtype=np.float32)[LABELS]
SIM = r.rand(B, K).astype(np.float32)


def t(x):
    return torch.from_numpy(np.asarray(x))


def close(a, b, tol=1e-5):
    np.testing.assert_allclose(float(a), float(b), rtol=tol, atol=tol)


def test_pskd_cross_entropy():
    ref = (-t(ONEHOT) * F.log_softmax(t(LOGITS), dim=1)).mean(0).sum()
    close(al.pskd_cross_entropy(jnp.asarray(LOGITS), jnp.asarray(ONEHOT)),
          ref)


def test_kd_regularization():
    # task_utils.py:36-59 (Tf-KD_reg)
    alpha, T, p_c = 0.1, 20.0, 0.99
    out, lab = t(LOGITS), t(ONEHOT)
    ce = F.cross_entropy(out, torch.argmax(lab.long(), dim=1))
    teacher = torch.ones_like(out) * (1 - p_c) / (K - 1)
    for i in range(B):
        teacher[i, torch.argmax(lab, dim=1)[i]] = p_c
    regu = nn.KLDivLoss(reduction="batchmean")(
        F.log_softmax(out, dim=1), F.softmax(teacher / T, dim=1) * t(SIM))
    ref = (1 - alpha) * ce + alpha * regu
    close(al.kd_regularization_loss(jnp.asarray(LOGITS), jnp.asarray(ONEHOT),
                                    jnp.asarray(SIM)), ref)


@pytest.mark.parametrize("epoch", [0, 5])
def test_cosine_rep(epoch):
    out, lab = t(LOGITS), t(ONEHOT)
    ref = F.cross_entropy(out, torch.argmax(lab.long(), dim=1))
    if epoch > 4:
        cos = (1 - torch.cosine_similarity(
            F.softmax(out, dim=-1), F.softmax(t(TEACHER), dim=-1),
            dim=-1)).mean()
        ref = ref + cos * 10
    close(al.cosine_rep_loss(jnp.asarray(LOGITS), jnp.asarray(ONEHOT),
                             jnp.asarray(TEACHER), epoch), ref)


@pytest.mark.parametrize("epoch", [0, 1])
def test_kd_self(epoch):
    T = 20.0
    out, lab = t(LOGITS), t(ONEHOT)
    ce = F.cross_entropy(out, torch.argmax(lab.long(), dim=1))
    if epoch > 0:
        p_top, idx = torch.topk(F.log_softmax(out / T, dim=-1), k=10)
        q = F.softmax(t(TEACHER)[torch.arange(B).unsqueeze(1), idx] / T,
                      dim=-1)
        ref = ce + nn.KLDivLoss(reduction="batchmean")(p_top, q) * T * T
    else:
        ref = ce
    close(al.kd_self_loss(jnp.asarray(LOGITS), jnp.asarray(ONEHOT),
                          jnp.asarray(TEACHER), epoch), ref)


@pytest.mark.parametrize("epoch", [0, 2])
def test_mse_teacher(epoch):
    out, lab = t(LOGITS), t(ONEHOT)
    ce = F.cross_entropy(out, torch.argmax(lab.long(), dim=1))
    if epoch > 0:
        p_top, idx = torch.topk(F.softmax(out, dim=-1), k=10)
        q = F.softmax(t(TEACHER)[torch.arange(B).unsqueeze(1), idx], dim=-1)
        ref = ce + F.mse_loss(p_top, q) * 10
    else:
        ref = ce
    close(al.mse_teacher_loss(jnp.asarray(LOGITS), jnp.asarray(ONEHOT),
                              jnp.asarray(TEACHER), epoch), ref)


@pytest.mark.parametrize("epoch", [0, 2])
def test_cosine_teacher(epoch):
    out, lab = t(LOGITS), t(ONEHOT)
    ce = F.cross_entropy(out, torch.argmax(lab.long(), dim=1))
    if epoch > 0:
        p_top, idx = torch.topk(F.softmax(out, dim=-1), k=10)
        q = F.softmax(t(TEACHER)[torch.arange(B).unsqueeze(1), idx], dim=-1)
        sem = torch.sum(1 - nn.CosineSimilarity()(p_top, q), dim=-1)
        ref = ce + 10 * sem.mean()
    else:
        ref = ce
    close(al.cosine_teacher_loss(jnp.asarray(LOGITS), jnp.asarray(ONEHOT),
                                 jnp.asarray(TEACHER), epoch), ref)


def test_logit_norm():
    x = t(LOGITS)
    norms = torch.norm(x, p=2, dim=-1, keepdim=True) + 1e-7
    ref = F.cross_entropy(x / norms / 0.01, t(LABELS))
    close(al.logit_norm_loss(jnp.asarray(LOGITS), jnp.asarray(LABELS)),
          ref, tol=1e-4)


def test_triplet():
    scores = t(r.randn(B, 5).astype(np.float32))
    s = torch.sigmoid(scores)
    ref = torch.clamp(0.2 + s[:, 1:] - s[:, :1], 0).mean()
    close(al.LOSS_MAP["TripletLoss"](jnp.asarray(scores.numpy())), ref)


def test_bce_with_logits():
    targ = r.rand(B, K).astype(np.float32)
    ref = nn.BCEWithLogitsLoss(reduction="mean")(t(LOGITS), t(targ))
    close(al.LOSS_MAP["BCEWithLogitLoss"](jnp.asarray(LOGITS),
                                          jnp.asarray(targ)), ref)


def test_cross_entropy_map_entry():
    ref = nn.CrossEntropyLoss()(t(LOGITS), t(LABELS))
    close(al.LOSS_MAP["CrossEntropyLoss"](jnp.asarray(LOGITS),
                                          jnp.asarray(LABELS)), ref)


def test_gqa_train_loss_logitnorm_criterion():
    """gqa_train_loss(criterion="LogitNormLoss") == the reference GQA branch
    (task_utils.py:423-425) with the LossMap's commented-in LogitNormLoss."""
    from clg_vqa_tpu.ops.semantic_prior import gqa_train_loss
    D = r.rand(K, K).astype(np.float32)
    lab = torch.from_numpy(LABELS)
    x = t(LOGITS)
    xn = x / (torch.norm(x, p=2, dim=-1, keepdim=True) + 1e-7) / 0.01
    ce = F.cross_entropy(xn, lab)
    p_top, idx = torch.topk(F.softmax(x, dim=-1), k=10)
    sem = (p_top * t(D)[lab][torch.arange(B).unsqueeze(1), idx]) \
        .sum(-1).mean()
    ref = ce * K + 10.0 * sem * K
    got = gqa_train_loss(jnp.asarray(LOGITS), jnp.asarray(LABELS),
                         jnp.asarray(D), semantic_lambda=10.0,
                         criterion="LogitNormLoss")
    close(got, ref, tol=1e-4)


def test_gqa_train_loss_rejects_unknown_criterion():
    from clg_vqa_tpu.ops.semantic_prior import gqa_train_loss
    D = np.zeros((K, K), np.float32)
    with pytest.raises(ValueError):
        gqa_train_loss(jnp.asarray(LOGITS), jnp.asarray(LABELS),
                       jnp.asarray(D), criterion="BCEWithLogitLoss")


def test_vqa_train_loss():
    """VL-classifier branch (task_utils.py:409-411): BCE mean x K."""
    from clg_vqa_tpu.ops.semantic_prior import vqa_train_loss
    targ = (r.rand(B, K) > 0.9).astype(np.float32)
    ref = nn.BCEWithLogitsLoss(reduction="mean")(t(LOGITS), t(targ)) * K
    close(vqa_train_loss(jnp.asarray(LOGITS), jnp.asarray(targ)), ref)
