"""Iterative magnitude pruning (IMP) + sparse fine-tuning (SFT) — the
lottery-ticket recipe of the paper (SURVEY.md §2: train_task_prunning.py,
train_task_sft.py), rebuilt as pure pytree ops.

Reference semantics reproduced:
 - prunable set (UC2): every attention q/k/v/out weight, every FFN dense
   weight, and the text pooler weight (train_task_prunning.py:45-66 — biases
   and LayerNorms excluded).
 - global L1 prune, ``fraction`` of the *currently surviving* weights per
   round (torch's PruningContainer restricts the topk to the unmasked slice,
   so 5 rounds of 10% -> 1-0.9^5 = 41% of the prunable set — verified
   empirically against torch.nn.utils.prune).
 - rewind: restore ALL weights to the pre-training snapshot theta_0 while
   keeping the mask (rewind_uc2 train_task_prunning.py:179-256 rebuilds the
   whole state dict from the snapshot); optimizer/schedule are rebuilt from
   scratch each round (791-866).
 - SFT: weights zeroed by the mask at init and gradients multiplied by the
   mask (= torch ``prune.CustomFromMask`` reparametrization: weight =
   weight_orig * mask, so d loss/d weight_orig = grad * mask;
   train_task_sft.py:44-132,438-461).

M3P note: the reference's M3P prunable list (train_task_prunning.py:258-289)
includes modules that are dead on the VQA jointfwd path (encoder_attn, VAE
latent transforms, auxiliary heads). Our M3P materializes only the live path,
so the global threshold here is computed over the live subset — a conscious
divergence (the dead modules are random-init noise in the reference's
threshold).
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np

# prunable leaf paths ("/"-joined) per model family
PRUNABLE_UC2 = (
    "encoder/attn/q/w", "encoder/attn/k/w", "encoder/attn/v/w",
    "encoder/attn/o/w", "encoder/ffn/w1/w", "encoder/ffn/w2/w", "pooler/w",
)
PRUNABLE_M3P = PRUNABLE_UC2   # same live-path structure in our pytrees


def _walk(tree, path=()):
    # sorted keys: jax pytree ops re-order dicts, so deterministic order is
    # required for zip-alignment across trees
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _walk(tree[k], path + (k,))
    else:
        yield "/".join(path), tree


def prunable_paths(params: Any, model: str = "uc2") -> set[str]:
    pats = PRUNABLE_UC2 if model == "uc2" else PRUNABLE_M3P
    return {p for p, _ in _walk(params) if p in pats}


def init_mask(params: Any, model: str = "uc2") -> Any:
    """All-ones float32 masks for prunable leaves; None elsewhere."""
    pats = prunable_paths(params, model)

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return (np.ones(np.shape(tree), np.float32)
                if "/".join(path) in pats else None)

    return walk(params)


def imp_prune_step(params: Any, mask: Any, fraction: float = 0.1) -> Any:
    """One IMP round: zero the ``fraction`` smallest-|w| among surviving
    prunable weights, globally (exact k-smallest, like torch topk)."""
    flat_w, flat_m, metas = [], [], []
    for (pw, w), (pm, m) in zip(_walk(params), _walk(mask)):
        assert pw == pm
        if m is None:
            continue
        w = np.abs(np.asarray(w, np.float32)).ravel()
        m = np.asarray(m, np.float32).ravel()
        flat_w.append(w)
        flat_m.append(m)
        metas.append(pw)
    allw = np.concatenate(flat_w)
    allm = np.concatenate(flat_m)
    # exact INTEGER count (torch prune counts with numel): an f32 sum over
    # ~86M mask elements can round by a few ulps, shifting k by a weight
    surviving = int((allm > 0).sum())
    k = int(round(fraction * surviving))
    if k > 0:
        scores = np.where(allm > 0, allw, np.inf)
        kill = np.argpartition(scores, k - 1)[:k]
        allm[kill] = 0.0

    out_chunks = {}
    off = 0
    for w, path in zip(flat_w, metas):
        out_chunks[path] = allm[off:off + w.size]
        off += w.size

    def walk(p_tree, m_tree, path=()):
        if isinstance(p_tree, dict):
            return {k: walk(p_tree[k], m_tree[k], path + (k,))
                    for k in p_tree}
        key = "/".join(path)
        if m_tree is None:
            return None
        return out_chunks[key].reshape(np.shape(p_tree)).copy()

    return walk(params, mask)


def sparsity(mask: Any) -> float:
    """% zeros over the prunable set (see_weight_rate_uc2 semantics)."""
    tot = zeros = 0
    for _, m in _walk(mask):
        if m is None:
            continue
        m = np.asarray(m)
        tot += m.size
        zeros += int((m == 0).sum())
    return 100.0 * zeros / max(tot, 1)


def apply_mask(params: Any, mask: Any) -> Any:
    """params * mask on prunable leaves (SFT init; train_task_sft.py:438-453)."""
    def walk(p, m):
        if isinstance(p, dict):
            return {k: walk(p[k], m[k]) for k in p}
        return p if m is None else p * jax.numpy.asarray(m)

    return walk(params, mask)


def grad_mask_tree(mask: Any) -> Any:
    """Mask tree consumable by make_train_step(grad_mask=...): leaves are the
    0/1 mask where prunable, None (pass-through) elsewhere."""
    def walk(m):
        if isinstance(m, dict):
            return {k: walk(v) for k, v in m.items()}
        return None if m is None else jax.numpy.asarray(m)

    return walk(mask)


def save_mask(path: str, mask: Any) -> None:
    flat = {p: m for p, m in _walk(mask) if m is not None}
    np.savez_compressed(path, **flat)


def load_mask(path: str, params: Any, model: str = "uc2") -> Any:
    """Load a mask npz onto the params tree; every stored key must be a
    prunable path of THIS model family (a mask saved for the wrong
    family, or with stale keys, previously loaded silently wherever
    names happened to match)."""
    data = np.load(path)
    allowed = prunable_paths(params, model)
    unknown = sorted(set(data.files) - allowed)
    if unknown:
        raise ValueError(
            f"mask {path} contains {len(unknown)} key(s) that are not "
            f"prunable paths of model {model!r}: {unknown[:5]}...")

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        key = "/".join(path)
        return data[key] if key in data.files else None

    return walk(params)
