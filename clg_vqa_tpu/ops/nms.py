"""Fixed-shape NMS for TPU.

The reference uses ``torchvision.ops.nms`` (detectron2_proposal_maxnms.py:8)
and maskrcnn-benchmark's CUDA NMS with a 1600-iteration per-class host loop
(SURVEY.md §2.3b). Greedy NMS is sequential by nature; the TPU-native
formulation here is **select-max-and-suppress**: K iterations (K = requested
outputs, e.g. 300 for the RPN — not N = candidates, e.g. 6000), each picking
the argmax of the remaining scores and vectorially suppressing its
overlaps. This is exactly equivalent to sorted greedy NMS truncated to K
outputs, needs no [N, N] IoU matrix (IoU rows are computed on the fly), and
turns the reference's O(N)-deep dependency chain into O(K).

Per-class NMS vmaps the recurrence over the class axis so all 1600 classes
are suppressed in parallel instead of looping on the host.

Outputs follow torchvision semantics: kept indices in descending-score order.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG = -jnp.inf


def iou_matrix(boxes: jnp.ndarray, *, legacy: bool = False) -> jnp.ndarray:
    """Pairwise IoU, boxes [N, 4] xyxy. legacy=False: torchvision
    convention (widths x2-x1). legacy=True: the Detectron/caffe +1
    convention of maskrcnn-benchmark's NMS kernels (csrc/cpu/nms_cpu.cpp:
    22,56-57: areas and intersections use x2-x1+1) — the X-101 extraction
    path must suppress with THESE IoUs to match the reference."""
    t = 1.0 if legacy else 0.0
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1 + t, 0) * jnp.maximum(y2 - y1 + t, 0)
    lt_x = jnp.maximum(x1[:, None], x1[None, :])
    lt_y = jnp.maximum(y1[:, None], y1[None, :])
    rb_x = jnp.minimum(x2[:, None], x2[None, :])
    rb_y = jnp.minimum(y2[:, None], y2[None, :])
    inter = (jnp.maximum(rb_x - lt_x + t, 0)
             * jnp.maximum(rb_y - lt_y + t, 0))
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _iou_row(box: jnp.ndarray, boxes: jnp.ndarray, areas: jnp.ndarray,
             t: float = 0.0) -> jnp.ndarray:
    """IoU of one box [4] against all boxes [N, 4]; t=1 for legacy +1."""
    a = jnp.maximum(box[2] - box[0] + t, 0) \
        * jnp.maximum(box[3] - box[1] + t, 0)
    lt_x = jnp.maximum(box[0], boxes[:, 0])
    lt_y = jnp.maximum(box[1], boxes[:, 1])
    rb_x = jnp.minimum(box[2], boxes[:, 2])
    rb_y = jnp.minimum(box[3], boxes[:, 3])
    inter = jnp.maximum(rb_x - lt_x + t, 0) * jnp.maximum(rb_y - lt_y + t, 0)
    union = a + areas - inter
    return jnp.where(union > 0, inter / union, 0.0)


@partial(jax.jit, static_argnames=("max_outputs", "legacy"))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
        *, max_outputs: int | None = None,
        valid: jnp.ndarray | None = None, legacy: bool = False):
    """torchvision.ops.nms semantics with static shapes.

    Returns (indices [K], keep_mask [K]) where K = max_outputs or N; indices
    are original-array positions in descending-score order, padded (mask=0)
    past the number of survivors. Ties broken by lower index (stable, like
    the sorted reference)."""
    n = boxes.shape[0]
    k = n if max_outputs is None else max_outputs   # 0 is a valid budget
    t = 1.0 if legacy else 0.0
    areas = (jnp.maximum(boxes[:, 2] - boxes[:, 0] + t, 0)
             * jnp.maximum(boxes[:, 3] - boxes[:, 1] + t, 0))
    live = jnp.where(valid if valid is not None else True,
                     scores.astype(jnp.float32), NEG)

    def body(i, carry):
        live, out_idx, out_keep = carry
        j = jnp.argmax(live)                      # stable: first max wins
        ok = live[j] > NEG
        row = _iou_row(boxes[j], boxes, areas, t)
        suppress = row > iou_threshold
        live = jnp.where(ok & suppress, NEG, live)
        live = live.at[j].set(NEG)
        out_idx = out_idx.at[i].set(jnp.where(ok, j, 0))
        out_keep = out_keep.at[i].set(ok)
        return live, out_idx, out_keep

    _, idx, keep = jax.lax.fori_loop(
        0, k, body,
        (live, jnp.zeros((k,), jnp.int32), jnp.zeros((k,), bool)))
    return idx, keep


@partial(jax.jit, static_argnames=("max_outputs",))
def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                iou_threshold: float, *, max_outputs: int | None = None,
                valid: jnp.ndarray | None = None):
    """Per-class NMS, all classes in parallel.

    boxes: [C, N, 4] (or [N, 4] shared), scores: [C, N].
    Returns (indices [C, K], keep [C, K])."""
    if boxes.ndim == 2:
        boxes = jnp.broadcast_to(boxes[None], (scores.shape[0],) + boxes.shape)
    fn = jax.vmap(lambda b, s, v: nms(b, s, iou_threshold,
                                      max_outputs=max_outputs, valid=v))
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    elif valid.ndim == 1:
        valid = jnp.broadcast_to(valid[None], scores.shape)
    return fn(boxes, scores, valid)


def _tie_broken(scores: jnp.ndarray) -> jnp.ndarray:
    """Strict (score desc, index asc) priority as EXACT ranks: a stable
    argsort of -scores is the greedy visitation order, and the priority of
    each box is its (negated) position in that order. Exact for any score
    gap — the previous arange*1e-7 epsilon subtraction inverted the
    priority of pairs whose true gap was below index_gap*1e-7 (up to 1e-4
    at N=1000, routine among softmax scores), breaking greedy parity."""
    n = scores.shape[-1]
    order = jnp.argsort(-scores.astype(jnp.float32), axis=-1, stable=True)
    inv = jnp.argsort(order, axis=-1, stable=True)    # rank of each box
    return (n - inv).astype(jnp.float32)              # higher = visited first


@partial(jax.jit, static_argnames=("class_chunk", "legacy"))
def batched_nms_fixpoint(boxes: jnp.ndarray, scores: jnp.ndarray,
                         iou_threshold: float, *,
                         valid: jnp.ndarray | None = None,
                         class_chunk: int = 128,
                         legacy: bool = False) -> jnp.ndarray:
    """Exact greedy per-class NMS over SHARED boxes as a parallel fixpoint.

    keep[i] <- valid[i] and no kept higher-priority box overlaps i; iterating
    from all-valid converges to the greedy solution in (suppression-chain
    depth) iterations — each iteration is one masked column-max over the
    shared [N, N] overlap matrix, batched over a chunk of classes (MXU/VPU
    work instead of the O(N)-deep sequential recurrence). ~30x faster than
    the per-step recurrence at 1600 classes x 1000 boxes.

    boxes [N, 4] shared (or [C, N, 4] per-class); scores [C, N].
    Returns keep [C, N] bool.
    """
    C, N = scores.shape
    iou = partial(iou_matrix, legacy=legacy)
    if boxes.ndim == 3:
        over = jax.vmap(iou)(boxes) > iou_threshold          # [C, N, N]
    else:
        over = iou(boxes) > iou_threshold
    over = over & ~jnp.eye(N, dtype=bool)
    v = jnp.ones((C, N), bool) if valid is None else (
        jnp.broadcast_to(valid, (C, N)) if valid.ndim == 1 else valid)
    pri = _tie_broken(scores)
    pri = jnp.where(v, pri, -jnp.inf)

    n_ch = -(-C // class_chunk)
    pad = n_ch * class_chunk - C
    pri_p = jnp.pad(pri, ((0, pad), (0, 0)), constant_values=-jnp.inf)
    v_p = jnp.pad(v, ((0, pad), (0, 0)))

    per_class_over = over.ndim == 3
    if per_class_over:
        pad_o = jnp.pad(over, ((0, pad), (0, 0), (0, 0)))
        over_chunks = pad_o.reshape(n_ch, class_chunk, N, N)

    def chunk_fn(args):
        if per_class_over:
            p_c, v_c, o_c = args                         # [ch, N(, N)]
        else:
            p_c, v_c = args
            o_c = None

        def f(K):
            ov = o_c if o_c is not None else over[None]
            cand = jnp.where(ov & K[:, :, None],
                             p_c[:, :, None], -jnp.inf)  # [ch, Nj, Ni]
            strongest = jnp.max(cand, axis=1)            # [ch, N]
            return v_c & (strongest < p_c)

        def cond(c):
            K, prev, it = c
            return jnp.any(K != prev) & (it < N)

        def body(c):
            K, _, it = c
            return f(K), K, it + 1

        K0 = f(v_c)
        K, _, _ = jax.lax.while_loop(cond, body, (K0, v_c, 0))
        return K

    chunks = [pri_p.reshape(n_ch, class_chunk, N),
              v_p.reshape(n_ch, class_chunk, N)]
    if per_class_over:
        chunks.append(over_chunks)
    keep = jax.lax.map(chunk_fn, tuple(chunks)).reshape(n_ch * class_chunk, N)
    return keep[:C]
