"""Fast R-CNN box/attribute predictors + the exact-36 NMS-sweep selection.

Reproduces (fixed-shape, batched) the reference flow of
features_extraction/detectron2_proposal_maxnms.py:43-137 and the
detectron2-fork FastRCNNOutputLayers with the VG attribute branch
(detectron2/modeling/roi_heads/fast_rcnn.py:318-372):

 - cls_score: Linear 2048 -> 1601 (1600 VG classes + background)
 - bbox_pred: Linear 2048 -> 1600*4 (class-specific deltas, weights
   (10, 10, 5, 5))
 - attributes: max over FULL 1601 scores -> class embedding (1601 -> 256) ->
   concat [2048 + 256] -> Linear -> ReLU -> Linear -> 401 attr logits;
   attr probs = softmax over the first 400 (last column dropped,
   detectron2_proposal_maxnms.py:120-122)
 - selection: per-box max foreground class score (background column dropped
   BEFORE the max, line 45-56), class-specific refined box, NMS threshold
   sweep 0.5 -> 0.9 until exactly 36 boxes survive (line 126-132), boxes
   rescaled to the raw image (detector_postprocess).
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from ...ops.nms import nms
from .rpn import clip_boxes, decode_boxes

Params = dict[str, Any]


def _linear(x, p):
    return x @ p["w"] + p["b"]


def box_predictor(feats: jnp.ndarray, params: Params):
    """feats [R, 2048] -> (cls_logits [R, C+1], attr_logits [R, A+1],
    deltas [R, C*4])."""
    scores = _linear(feats, params["cls_score"])
    deltas = _linear(feats, params["bbox_pred"])
    max_class = jnp.argmax(scores, axis=-1)            # over C+1 incl. bg
    cls_emb = params["cls_embedding"][max_class]
    x = jnp.concatenate([feats, cls_emb], axis=-1)
    x = jax.nn.relu(_linear(x, params["fc_attr"]))
    attr_logits = _linear(x, params["attr_score"])
    return scores, attr_logits, deltas


def predict_boxes(proposals: jnp.ndarray, deltas: jnp.ndarray,
                  weights=(10.0, 10.0, 5.0, 5.0)) -> jnp.ndarray:
    """Class-specific box decode: proposals [R, 4], deltas [R, C*4] ->
    [R, C, 4] (FastRCNNOutputs.predict_boxes)."""
    R = proposals.shape[0]
    C = deltas.shape[1] // 4
    d = deltas.reshape(R * C, 4)
    a = jnp.repeat(proposals, C, axis=0)
    return decode_boxes(a, d, weights=weights).reshape(R, C, 4)


def select_exactly_n(boxes_per_class: jnp.ndarray, probs: jnp.ndarray,
                     image_hw, *, n_keep: int = 36,
                     valid: jnp.ndarray | None = None,
                     thresholds=(0.5, 0.6, 0.7, 0.8, 0.9)):
    """The reference's NMS sweep (detectron2_proposal_maxnms.py:126-132):
    per-box max foreground class + class-specific box, then try NMS
    thresholds in order until exactly n_keep survive; if none yields exactly
    n_keep, the LAST threshold's (truncated) result is used, mirroring the
    reference loop falling through.

    boxes_per_class [R, C, 4] (foreground classes), probs [R, C+1]
    (incl. background as last column). Returns (indices [n_keep],
    keep_mask [n_keep], nms_thresh_used).
    """
    scores_fg = probs[:, :-1]                           # drop background
    max_scores = jnp.max(scores_fg, axis=1)
    max_classes = jnp.argmax(scores_fg, axis=1)
    R = boxes_per_class.shape[0]
    sel = boxes_per_class[jnp.arange(R), max_classes]
    sel = clip_boxes(sel, image_hw[0], image_hw[1])
    if valid is not None:
        max_scores = jnp.where(valid, max_scores, -jnp.inf)

    def try_thresh(t):
        idx, keep = nms(sel, max_scores, t, max_outputs=n_keep,
                        valid=jnp.isfinite(max_scores))
        return idx, keep, jnp.sum(keep)

    # static unroll over the 5 thresholds; pick the first exact hit, else the
    # last threshold's result (the reference loop's fall-through)
    results = [try_thresh(t) for t in thresholds]
    idx, keep, _ = results[-1]
    thresh_used = jnp.asarray(thresholds[-1])
    for t, (i_t, k_t, cnt) in zip(reversed(thresholds), reversed(results)):
        hit = cnt == n_keep
        idx = jnp.where(hit, i_t, idx)
        keep = jnp.where(hit, k_t, keep)
        thresh_used = jnp.where(hit, t, thresh_used)
    return idx, keep, thresh_used


def rescale_boxes(boxes: jnp.ndarray, scale_x, scale_y,
                  raw_hw) -> jnp.ndarray:
    """detector_postprocess: scale network-input boxes back to the raw image
    and clip."""
    out = jnp.stack([boxes[:, 0] * scale_x, boxes[:, 1] * scale_y,
                     boxes[:, 2] * scale_x, boxes[:, 3] * scale_y], axis=1)
    return clip_boxes(out, raw_hw[0], raw_hw[1])


def init_box_predictor(rng, *, in_dim: int = 2048, num_classes: int = 1600,
                       num_attrs: int = 400) -> Params:
    ks = jax.random.split(rng, 4)

    def lin(rng, i, o, std):
        return {"w": jax.random.normal(rng, (i, o), jnp.float32) * std,
                "b": jnp.zeros((o,), jnp.float32)}

    emb_dim = in_dim // 8
    return {
        "cls_score": lin(ks[0], in_dim, num_classes + 1, 0.01),
        "bbox_pred": lin(ks[1], in_dim, num_classes * 4, 0.001),
        "cls_embedding": jax.random.normal(
            ks[2], (num_classes + 1, emb_dim), jnp.float32) * 0.02,
        "fc_attr": lin(ks[3], in_dim + emb_dim, in_dim // 4,
                       math.sqrt(2.0 / (in_dim + emb_dim))),
        "attr_score": lin(jax.random.fold_in(ks[3], 1), in_dim // 4,
                          num_attrs + 1, 0.01),
    }
