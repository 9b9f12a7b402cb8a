"""Semantic-prior label-similarity loss, fully on-device.

The reference computes a per-sample distance row over the 1842-answer space
with a Python double loop in the data loader (O(batch x 1842) per batch,
gqa_dataset_semantic_code_mix.py:362-381 — its known CPU hotspot), then in
the loss takes top-10 of softmax(logits) and dots with the gathered distances
(task_utils.py:415-428).

TPU-native design: materialize the full [num_labels, num_labels] distance
matrix ONCE (host, at startup), keep it in HBM, and gather rows by target
label inside the jitted loss — removing the per-batch host loop entirely.
``D[t, j]`` = distance of candidate label j from target t.
"""
from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np


def build_distance_matrix_embedding(pkl_path: str, num_labels: int) -> np.ndarray:
    """From embedding_distance.pkl: dict {(i, j): 1 - cosine_sim} (symmetric,
    produced by volta/extract_emb_dist.py). Diagonal = 0
    (gqa_dataset_semantic_code_mix.py:371-381: distance[i, t] = 0)."""
    with open(pkl_path, "rb") as f:
        dists = pickle.load(f)
    # get_embeddingdist reads semantic_dict[(j, t)] for row t, col j; the dict
    # is stored symmetrically (extract_emb_dist.py:26-27) so D[t, j] = dict[(t, j)].
    D = np.zeros((num_labels, num_labels), np.float32)
    for (i, j), d in dists.items():
        D[i, j] = d
    np.fill_diagonal(D, 0.0)
    return D


def build_distance_matrix_wordnet(pkl_path: str, num_labels: int,
                                  sim_values=(0.0, 0.8, 0.8, 1.0)) -> np.ndarray:
    """From l2l_semantic_index.pkl: {t: {"syn": [...], "hyp": [...],
    "hpo": [...]}} (volta/extract_wn_rel.py). Row semantics follow
    weightWordNet (gqa_dataset_semantic_code_mix.py:352-369):
    0 for target/synonyms, 0.8 for hypernyms/hyponyms, 1 otherwise."""
    with open(pkl_path, "rb") as f:
        rel = pickle.load(f)
    D = np.full((num_labels, num_labels), sim_values[3], np.float32)
    for t in range(num_labels):
        r = rel.get(t, {"syn": [], "hyp": [], "hpo": []})
        D[t, r["syn"]] = sim_values[0]
        D[t, r["hyp"]] = sim_values[1]
        D[t, r["hpo"]] = sim_values[2]
        D[t, t] = sim_values[0]
    return D


def semantic_prior_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                        distance_matrix: jnp.ndarray,
                        top_k: int = 10) -> jnp.ndarray:
    """mean_b sum_{k in top10} softmax(logits)_k * D[label_b, k]
    (task_utils.py:418-421). Returns a scalar."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    p_top, idx_top = jax.lax.top_k(probs, min(top_k, logits.shape[-1]))
    rows = distance_matrix[labels]                      # [B, num_labels]
    d_top = jnp.take_along_axis(rows, idx_top, axis=-1)  # [B, k]
    return jnp.mean(jnp.sum(p_top * d_top, axis=-1))


def gqa_train_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                   distance_matrix: jnp.ndarray, *,
                   semantic_lambda: float = 10.0, top_k: int = 10,
                   num_labels: int | None = None,
                   criterion: str = "CrossEntropyLoss") -> jnp.ndarray:
    """The full VL-classifier-GQA training loss (task_utils.py:413-425):

        loss = num_labels * ( criterion(logits, label) + lambda * sem_loss )

    The num_labels multiplier reproduces the reference's
    ``loss.mean() * target.size(1)`` scaling (inherited from the VQA BCE
    recipe); it matters for effective learning rate.

    ``criterion`` mirrors the reference's ``--loss``/LossMap dispatch
    (task_utils.py:179-192): the chosen criterion is applied with argmax
    targets inside the GQA branch (423). "CrossEntropyLoss" is the recipe
    default; "LogitNormLoss" is the commented-in alternative (186).
    """
    if num_labels is None:
        num_labels = logits.shape[-1]
    x = logits.astype(jnp.float32)
    if criterion == "LogitNormLoss":        # task_utils.py:161-170
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-7) / 0.01
    elif criterion != "CrossEntropyLoss":
        raise ValueError(f"criterion {criterion!r} is not valid for the "
                         "VL-classifier-GQA task type (task_utils.py:423)")
    logp = jax.nn.log_softmax(x, axis=-1)
    ce = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
    sem = semantic_prior_loss(logits, labels, distance_matrix, top_k)
    return num_labels * (ce + semantic_lambda * sem)


def vqa_train_loss(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """The plain VL-classifier (VQA soft-target) branch, task_utils.py:409-411:
    ``BCEWithLogitsLoss(mean)(logits, target) * target.size(1)``."""
    from .aux_losses import bce_with_logits_loss
    return bce_with_logits_loss(logits, target) * target.shape[-1]
