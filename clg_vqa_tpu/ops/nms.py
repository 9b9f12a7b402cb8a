"""Fixed-shape NMS for TPU.

The reference uses ``torchvision.ops.nms`` (detectron2_proposal_maxnms.py:8)
and maskrcnn-benchmark's CUDA NMS with a 1600-iteration per-class host loop
(SURVEY.md §2.3b). Greedy NMS is sequential by nature; the TPU-native
formulation precomputes the [N, N] IoU matrix in one batched op (MXU/VPU
friendly) and runs the O(N) suppression recurrence in a ``lax.fori_loop``
over static shapes — no dynamic output sizes, no host round-trips. Per-class
NMS vmaps the recurrence over the class axis so all 1600 classes are
suppressed in parallel instead of looping on the host.

Outputs follow torchvision semantics: kept indices in descending-score order.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU, boxes [N, 4] xyxy (area = (x2-x1)*(y2-y1), the
    torchvision convention without +1)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    lt_x = jnp.maximum(x1[:, None], x1[None, :])
    lt_y = jnp.maximum(y1[:, None], y1[None, :])
    rb_x = jnp.minimum(x2[:, None], x2[None, :])
    rb_y = jnp.minimum(y2[:, None], y2[None, :])
    inter = (jnp.maximum(rb_x - lt_x, 0) * jnp.maximum(rb_y - lt_y, 0))
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _suppress(iou_sorted: jnp.ndarray, valid: jnp.ndarray,
              iou_threshold: float) -> jnp.ndarray:
    """Greedy suppression over score-sorted boxes. keep[i] = no earlier kept
    box overlaps it above threshold. Returns keep mask [N] (sorted order)."""
    n = iou_sorted.shape[0]
    over = iou_sorted > iou_threshold
    idx = jnp.arange(n)

    def body(i, keep):
        sup = jnp.any(keep & over[:, i] & (idx < i))
        return keep.at[i].set(keep[i] & ~sup)

    return jax.lax.fori_loop(0, n, body, valid)


@partial(jax.jit, static_argnames=("max_outputs",))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
        *, max_outputs: int | None = None,
        valid: jnp.ndarray | None = None):
    """torchvision.ops.nms semantics with static shapes.

    Returns (indices [K], keep_mask [K]) where K = max_outputs or N; indices
    are original-array positions in descending-score order, padded (mask=0)
    past the number of survivors.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    v = jnp.ones((n,), bool) if valid is None else valid[order].astype(bool)
    iou_s = iou_matrix(boxes[order])
    keep_sorted = _suppress(iou_s, v, iou_threshold)

    k = max_outputs or n
    # stable-compact survivors to the front, preserving score order
    rank = jnp.where(keep_sorted, jnp.arange(n), n + jnp.arange(n))
    perm = jnp.argsort(rank)[:k]
    return order[perm], keep_sorted[perm]


@partial(jax.jit, static_argnames=("max_outputs",))
def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                iou_threshold: float, *, max_outputs: int | None = None,
                valid: jnp.ndarray | None = None):
    """Per-class NMS, all classes in parallel.

    boxes: [C, N, 4] (or [N, 4] shared), scores: [C, N].
    Returns (indices [C, K], keep [C, K]).
    """
    if boxes.ndim == 2:
        boxes = jnp.broadcast_to(boxes[None], (scores.shape[0],) + boxes.shape)
    fn = jax.vmap(lambda b, s, v: nms(b, s, iou_threshold,
                                      max_outputs=max_outputs, valid=v))
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    elif valid.ndim == 1:
        valid = jnp.broadcast_to(valid[None], scores.shape)
    return fn(boxes, scores, valid)
