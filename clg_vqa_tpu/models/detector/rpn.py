"""Region Proposal Network — fixed-shape TPU formulation of the reference's
detectron2 RPN (features_extraction/py-bottom-up-attention/detectron2/
modeling/proposal_generator/rpn.py + rpn_outputs.py).

Pipeline (inference): 3x3 conv (1024 -> hid, VG: 512) + ReLU -> 1x1
objectness [A] + 1x1 deltas [4A]; anchors (sizes x ratios at stride 16,
detectron2 DefaultAnchorGenerator semantics: area-preserving w/h, zero
offset); decode with weights (1,1,1,1) and dw/dh clamp log(1000/16); clip to
image; top-K pre-NMS (6000) -> NMS 0.7 -> top-300 with validity mask — all
static shapes (the reference's variable-length proposal lists become
(boxes, valid) pairs).
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.nms import nms
from .resnet import conv

Params = dict[str, Any]


def generate_anchors(feat_h: int, feat_w: int, *, stride: int = 16,
                     sizes=(64, 128, 256, 512),
                     ratios=(0.5, 1.0, 2.0)) -> np.ndarray:
    """[H*W*A, 4] xyxy anchors, A-fastest ordering like detectron2
    (cell-major, then anchor)."""
    cell = []
    for size in sizes:
        area = float(size) ** 2
        for r in ratios:
            w = math.sqrt(area / r)
            h = w * r
            cell.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    cell = np.asarray(cell, np.float32)              # [A, 4]
    sx = np.arange(feat_w, dtype=np.float32) * stride
    sy = np.arange(feat_h, dtype=np.float32) * stride
    shift_x, shift_y = np.meshgrid(sx, sy)
    shifts = np.stack([shift_x.ravel(), shift_y.ravel(),
                       shift_x.ravel(), shift_y.ravel()], 1)  # [H*W, 4]
    anchors = shifts[:, None, :] + cell[None, :, :]
    return anchors.reshape(-1, 4)


def generate_anchors_caffe(feat_h: int, feat_w: int, *, stride: int,
                           sizes=(32,), ratios=(0.5, 1.0, 2.0)) -> np.ndarray:
    """Legacy Detectron/caffe anchors — what vqa-maskrcnn-benchmark's
    AnchorGenerator uses (maskrcnn_benchmark/modeling/rpn/
    anchor_generator.py:183-232): a base (0,0,stride-1,stride-1) window,
    ROUNDED w/h in the aspect-ratio enumeration, center (stride-1)/2 —
    every anchor differs from the detectron2-continuous ones by 1-2.5 px,
    and the released X-101 RPN deltas were trained against THESE. Grid
    shifts at stride*i; ratio-major cell ordering (matches the RPN head's
    channel layout). [H*W*A, 4] xyxy, A-fastest."""
    base = np.array([0.0, 0.0, stride - 1.0, stride - 1.0])

    def whctrs(a):
        w = a[2] - a[0] + 1.0
        h = a[3] - a[1] + 1.0
        return w, h, a[0] + 0.5 * (w - 1.0), a[1] + 0.5 * (h - 1.0)

    def mk(ws, hs, xc, yc):
        ws, hs = np.asarray(ws, np.float64), np.asarray(hs, np.float64)
        return np.stack([xc - 0.5 * (ws - 1.0), yc - 0.5 * (hs - 1.0),
                         xc + 0.5 * (ws - 1.0), yc + 0.5 * (hs - 1.0)], 1)

    w, h, xc, yc = whctrs(base)
    size = w * h
    ws = np.round(np.sqrt(size / np.asarray(ratios)))
    hs = np.round(ws * np.asarray(ratios))
    ratio_anchors = mk(ws, hs, xc, yc)
    cells = []
    scales = np.asarray(sizes, np.float64) / stride
    for i in range(ratio_anchors.shape[0]):
        w, h, xc, yc = whctrs(ratio_anchors[i])
        cells.append(mk(w * scales, h * scales, xc, yc))
    cell = np.vstack(cells).astype(np.float32)            # [R*S, 4]
    sx = np.arange(feat_w, dtype=np.float32) * stride
    sy = np.arange(feat_h, dtype=np.float32) * stride
    shift_x, shift_y = np.meshgrid(sx, sy)
    shifts = np.stack([shift_x.ravel(), shift_y.ravel(),
                       shift_x.ravel(), shift_y.ravel()], 1)
    return (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 4)


def decode_boxes(anchors: jnp.ndarray, deltas: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0),
                 clamp: float = math.log(1000.0 / 16)) -> jnp.ndarray:
    """detectron2 Box2BoxTransform.apply_deltas. anchors/deltas [N, 4]."""
    wx, wy, ww, wh = weights
    widths = anchors[:, 2] - anchors[:, 0]
    heights = anchors[:, 3] - anchors[:, 1]
    ctr_x = anchors[:, 0] + 0.5 * widths
    ctr_y = anchors[:, 1] + 0.5 * heights
    dx = deltas[:, 0] / wx
    dy = deltas[:, 1] / wy
    dw = jnp.minimum(deltas[:, 2] / ww, clamp)
    dh = jnp.minimum(deltas[:, 3] / wh, clamp)
    pcx = dx * widths + ctr_x
    pcy = dy * heights + ctr_y
    pw = jnp.exp(dw) * widths
    ph = jnp.exp(dh) * heights
    return jnp.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                      pcx + 0.5 * pw, pcy + 0.5 * ph], axis=1)


def clip_boxes(boxes: jnp.ndarray, h, w) -> jnp.ndarray:
    return jnp.stack([
        jnp.clip(boxes[:, 0], 0, w), jnp.clip(boxes[:, 1], 0, h),
        jnp.clip(boxes[:, 2], 0, w), jnp.clip(boxes[:, 3], 0, h)], axis=1)


def decode_boxes_legacy(anchors: jnp.ndarray, deltas: jnp.ndarray,
                        clamp: float = math.log(1000.0 / 16)) -> jnp.ndarray:
    """maskrcnn-benchmark BoxCoder.decode (box_coder.py:52-96): legacy
    TO_REMOVE=1 box widths (w = x2-x1+1) and x2 = ctr+0.5w-1 outputs —
    the coordinate convention the released X-101 checkpoint's deltas
    assume. decode_boxes (detectron2 continuous) differs by up to a pixel
    per side."""
    widths = anchors[:, 2] - anchors[:, 0] + 1.0
    heights = anchors[:, 3] - anchors[:, 1] + 1.0
    ctr_x = anchors[:, 0] + 0.5 * widths
    ctr_y = anchors[:, 1] + 0.5 * heights
    dx, dy = deltas[:, 0], deltas[:, 1]
    dw = jnp.minimum(deltas[:, 2], clamp)
    dh = jnp.minimum(deltas[:, 3], clamp)
    pcx = dx * widths + ctr_x
    pcy = dy * heights + ctr_y
    pw = jnp.exp(dw) * widths
    ph = jnp.exp(dh) * heights
    return jnp.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                      pcx + 0.5 * pw - 1.0, pcy + 0.5 * ph - 1.0], axis=1)


def clip_boxes_legacy(boxes: jnp.ndarray, h, w) -> jnp.ndarray:
    """BoxList.clip_to_image with TO_REMOVE=1 (bounding_box.py:203-208):
    clamp to [0, size-1]."""
    return jnp.stack([
        jnp.clip(boxes[:, 0], 0, w - 1), jnp.clip(boxes[:, 1], 0, h - 1),
        jnp.clip(boxes[:, 2], 0, w - 1), jnp.clip(boxes[:, 3], 0, h - 1)],
        axis=1)


def rpn_head(feat: jnp.ndarray, params: Params):
    """feat [N, H, W, C] -> objectness [N, H, W, A], deltas [N, H, W, A, 4]."""
    t = jax.nn.relu(conv(feat, params["conv"]))
    obj = conv(t, params["objectness"])
    deltas = conv(t, params["deltas"])
    A = obj.shape[-1]
    return obj, deltas.reshape(*deltas.shape[:-1], A, 4)


def propose(obj: jnp.ndarray, deltas: jnp.ndarray, anchors: jnp.ndarray,
            image_hw, *, pre_nms_topk: int = 6000, post_nms_topk: int = 300,
            nms_thresh: float = 0.7, valid_mask: jnp.ndarray | None = None):
    """Single image. obj [H, W, A]; deltas [H, W, A, 4]; anchors [H*W*A, 4].
    Returns (boxes [post, 4], scores [post], valid [post])."""
    logits = obj.reshape(-1)
    if valid_mask is not None:
        logits = jnp.where(valid_mask, logits, -jnp.inf)
    k = min(pre_nms_topk, logits.shape[0])
    top_scores, top_idx = jax.lax.top_k(logits, k)
    top_boxes = decode_boxes(anchors[top_idx],
                             deltas.reshape(-1, 4)[top_idx])
    top_boxes = clip_boxes(top_boxes, image_hw[0], image_hw[1])
    keep_idx, keep = nms(top_boxes, top_scores, nms_thresh,
                         max_outputs=post_nms_topk,
                         valid=jnp.isfinite(top_scores))
    return top_boxes[keep_idx], top_scores[keep_idx], keep


def init_rpn(rng, *, in_channels: int = 1024, hid_channels: int = 512,
             num_anchors: int = 12) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)

    def c(rng, k, cin, cout):
        return {"w": jax.random.normal(rng, (k, k, cin, cout), jnp.float32)
                * 0.01, "b": jnp.zeros((cout,), jnp.float32)}

    return {"conv": c(k1, 3, in_channels, hid_channels),
            "objectness": c(k2, 1, hid_channels, num_anchors),
            "deltas": c(k3, 1, hid_channels, num_anchors * 4)}
