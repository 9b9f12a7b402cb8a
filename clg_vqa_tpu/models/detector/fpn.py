"""Feature Pyramid Network + X-101 extractor head — the TPU rebuild of the
mmf / vqa-maskrcnn-benchmark feature pipeline (SURVEY.md §2.4:
extract_features_vmb.py, maskrcnn_benchmark FPN + fc6/fc7 box head).

FPN (maskrcnn-benchmark semantics): 1x1 laterals on C2..C5 -> top-down
nearest-neighbor 2x upsampling -> 3x3 output convs -> P2..P5, plus P6 =
max-pool(P5, 1x1 window stride 2). RoI features: RoIAlign 7x7
(sampling_ratio 2, legacy aligned=False) on the level assigned by the
canonical heuristic level = floor(4 + log2(sqrt(area)/224 + eps)); head =
flatten -> fc6(12544->1024... X101 uses 2048) -> ReLU -> fc7; the feature
served to M3P is the post-ReLU fc6 activation (extract_features_vmb.py
feature_name="fc6").

Selection (extract_features_vmb.py:173-226): softmax scores over 1601
columns; per-class NMS(0.5) over classes 1..1600 with SHARED proposal boxes;
max_conf per box = max of its kept per-class scores; sort desc; top-100.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from ...ops.nms import batched_nms_fixpoint
from ...ops.roi import roi_align
from .resnet import conv

Params = dict[str, Any]


def fpn(features: tuple, params: Params):
    """features = (C2, C3, C4, C5) NHWC. Returns [P2, P3, P4, P5, P6]."""
    c2, c3, c4, c5 = features
    l5 = conv(c5, params["lateral"][3])
    l4 = conv(c4, params["lateral"][2])
    l3 = conv(c3, params["lateral"][1])
    l2 = conv(c2, params["lateral"][0])

    def up2(x, like):
        return jax.image.resize(
            x, (x.shape[0], like.shape[1], like.shape[2], x.shape[3]),
            method="nearest")

    t4 = l4 + up2(l5, l4)
    t3 = l3 + up2(t4, l3)
    t2 = l2 + up2(t3, l2)
    p5 = conv(l5, params["output"][3])
    p4 = conv(t4, params["output"][2])
    p3 = conv(t3, params["output"][1])
    p2 = conv(t2, params["output"][0])
    # P6: stride-2 subsample of P5 (maskrcnn-benchmark LastLevelMaxPool:
    # max_pool2d(k=1, s=2))
    p6 = p5[:, ::2, ::2, :]
    return [p2, p3, p4, p5, p6]


def assign_levels(boxes: jnp.ndarray, *, k_min: int = 2, k_max: int = 5,
                  canonical_scale: float = 224.0,
                  canonical_level: int = 4,
                  legacy: bool = False) -> jnp.ndarray:
    """maskrcnn-benchmark LevelMapper: target_lvls clamped to [k_min, k_max].
    Returns level index relative to P2 (0..3). legacy=True uses the
    TO_REMOVE=1 box area of BoxList.area() (bounding_box.py:230-233) that
    the reference's LevelMapper actually receives — boxes near a level
    boundary can land one level apart otherwise."""
    t = 1.0 if legacy else 0.0
    w = jnp.maximum(boxes[:, 2] - boxes[:, 0] + t, 0)
    h = jnp.maximum(boxes[:, 3] - boxes[:, 1] + t, 0)
    s = jnp.sqrt(w * h)
    lvl = jnp.floor(canonical_level + jnp.log2(s / canonical_scale + 1e-6))
    return (jnp.clip(lvl, k_min, k_max) - k_min).astype(jnp.int32)


def multilevel_roi_align(pyramid: list, boxes: jnp.ndarray, *,
                         output_size=(7, 7), sampling_ratio: int = 2,
                         base_stride: int = 4) -> jnp.ndarray:
    """RoIAlign each box on every level, then select by assigned level —
    branchless/fixed-shape (4 aligned gathers instead of dynamic grouping;
    levels P2..P5)."""
    lvls = assign_levels(boxes)
    outs = []
    for i in range(4):
        feat = jnp.moveaxis(pyramid[i][0], -1, 0)       # [C, H, W]
        outs.append(roi_align(
            feat, boxes, output_size=output_size,
            spatial_scale=1.0 / (base_stride * (2 ** i)),
            sampling_ratio=sampling_ratio, aligned=False))
    stacked = jnp.stack(outs, axis=0)                   # [4, R, C, 7, 7]
    return stacked[lvls, jnp.arange(boxes.shape[0])]


def multilevel_roi_align_flat(pyramid: list, boxes: jnp.ndarray, *,
                              output_size=(7, 7), sampling_ratio: int = 2,
                              base_stride: int = 4,
                              legacy_levels: bool = False,
                              box_chunk: int | None = None) -> jnp.ndarray:
    """Same semantics as multilevel_roi_align but via ONE flattened-pyramid
    pass (ops/roi.py:roi_align_flat): each box gathers only from its assigned
    level — 1x instead of 4x the gather work. Accepts bf16 pyramids
    (accumulates fp32). box_chunk: see roi_align_flat (bit-identical
    sequential box chunks; bounds the fp32 corner-product live set)."""
    from ...ops.roi import roi_align_flat
    lvls = assign_levels(boxes, legacy=legacy_levels)
    feats = [jnp.moveaxis(p[0], -1, 0) for p in pyramid[:4]]   # [C, H, W]
    shapes = tuple((f.shape[1], f.shape[2]) for f in feats)
    flat = jnp.concatenate([f.reshape(f.shape[0], -1) for f in feats], axis=1)
    scales = tuple(1.0 / (base_stride * (2 ** i)) for i in range(4))
    return roi_align_flat(flat, boxes, lvls, level_shapes=shapes,
                          spatial_scales=scales, output_size=output_size,
                          sampling_ratio=sampling_ratio, aligned=False,
                          box_chunk=box_chunk)


def box_head_fc(crops: jnp.ndarray, params: Params, compute_dtype=None):
    """[R, C, 7, 7] -> (fc6_relu [R, D], fc7_relu [R, D]); optional low-
    precision matmuls with fp32 accumulation."""
    x = crops.reshape(crops.shape[0], -1)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w6 = params["fc6"]["w"].astype(compute_dtype)
        w7 = params["fc7"]["w"].astype(compute_dtype)
    else:
        w6, w7 = params["fc6"]["w"], params["fc7"]["w"]
    fc6 = jax.nn.relu(
        jnp.dot(x, w6, preferred_element_type=jnp.float32)
        + params["fc6"]["b"])
    fc7 = jax.nn.relu(
        jnp.dot(fc6.astype(x.dtype) if compute_dtype is not None else fc6,
                w7, preferred_element_type=jnp.float32)
        + params["fc7"]["b"])
    return fc6, fc7


def select_top_by_class_nms(boxes: jnp.ndarray, probs: jnp.ndarray, *,
                            num_keep: int = 100, nms_thresh: float = 0.5,
                            conf_thresh: float = 0.0,
                            valid: jnp.ndarray | None = None,
                            legacy: bool = False):
    """extract_features_vmb's per-class NMS selection, fully vectorized via
    the parallel-fixpoint NMS (ops/nms.py:batched_nms_fixpoint — exact greedy,
    no O(N)-deep recurrence).

    boxes [N, 4] shared across classes; probs [N, C+1] softmax (col 0 =
    background, skipped). Returns (indices [num_keep], max_conf [num_keep],
    objects [num_keep] foreground argmax)."""
    fg = probs[:, 1:]                                   # [N, C]
    keep_c = batched_nms_fixpoint(boxes, fg.T, nms_thresh, valid=valid,
                                  legacy=legacy)
    kept_scores = jnp.where(keep_c & (fg.T > conf_thresh), fg.T, 0.0)
    max_conf = jnp.max(kept_scores, axis=0)             # [N]
    order = jnp.argsort(-max_conf)[:num_keep]
    objects = jnp.argmax(fg, axis=1)
    return order, max_conf[order], objects[order]


def init_fpn(rng, *, in_channels=(256, 512, 1024, 2048),
             out_channels: int = 256) -> Params:
    ks = iter(jax.random.split(rng, 16))

    def c(k, cin, cout):
        return {"w": jax.random.normal(next(ks), (k, k, cin, cout),
                                       jnp.float32)
                * math.sqrt(2.0 / (k * k * cin)),
                "b": jnp.zeros((cout,), jnp.float32)}

    return {"lateral": [c(1, cin, out_channels) for cin in in_channels],
            "output": [c(3, out_channels, out_channels) for _ in in_channels]}


def init_box_head_fc(rng, *, in_dim: int = 256 * 7 * 7,
                     rep_dim: int = 2048) -> Params:
    k1, k2 = jax.random.split(rng)
    return {
        "fc6": {"w": jax.random.normal(k1, (in_dim, rep_dim), jnp.float32)
                * 0.01, "b": jnp.zeros((rep_dim,), jnp.float32)},
        "fc7": {"w": jax.random.normal(k2, (rep_dim, rep_dim), jnp.float32)
                * 0.01, "b": jnp.zeros((rep_dim,), jnp.float32)},
    }
