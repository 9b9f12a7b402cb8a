"""RoI feature extraction ops — TPU-native replacements for the reference's
CUDA ROIPool / ROIAlign kernels (SURVEY.md §2.3a/b:
detectron2 ROIAlign_cuda.cu, maskrcnn-benchmark ROIPool_cuda.cu).

Formulation: a ``fori_loop`` over the (small, static) per-bin sample window;
each iteration performs ONE flat gather of shape [C, R, PH, PW] from the
feature map and folds it into the accumulator. Peak memory is
O(C·R·PH·PW) — independent of the window size and of the feature-map width —
which is what lets 300 rois x 1024 channels x 14x14 bins fit on-chip (the
naive two-stage advanced-indexing version materializes O(R·C·PH·win·W) and
OOMs at production scale). Forward-only (feature extraction is inference).

Semantics:
 - roi_align: detectron2/torchvision RoIAlign. ``aligned=True`` shifts
   coordinates by -0.5; ``sampling_ratio`` grid points per bin averaged;
   bilinear interpolation with edge clamping, samples outside [-1, H] zeroed.
 - roi_pool: quantized max pooling (torchvision RoIPool): rois scaled and
   rounded in f32 (CUDA parity), exact integer bin boundaries
   (fusion-order-safe), empty bins yield 0.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("output_size", "max_bin"))
def roi_pool(features: jnp.ndarray, rois: jnp.ndarray, *,
             output_size: tuple[int, int], spatial_scale: float,
             max_bin: int = 16) -> jnp.ndarray:
    """features [C, H, W]; rois [R, 4] xyxy input-image coords.
    Returns [R, C, PH, PW]. ``max_bin`` bounds the per-bin window
    (>= ceil(H·scale/PH)+1); larger bins are truncated."""
    C, H, W = features.shape
    PH, PW = output_size
    R = rois.shape[0]
    x1 = jnp.round(rois[:, 0] * spatial_scale).astype(jnp.int32)
    y1 = jnp.round(rois[:, 1] * spatial_scale).astype(jnp.int32)
    x2 = jnp.round(rois[:, 2] * spatial_scale).astype(jnp.int32)
    y2 = jnp.round(rois[:, 3] * spatial_scale).astype(jnp.int32)
    roi_h = jnp.maximum(y2 - y1 + 1, 1)
    roi_w = jnp.maximum(x2 - x1 + 1, 1)

    # exact integer bin boundaries (float versions are fusion-order dependent
    # when a boundary lands exactly on an integer, e.g. 7*(3/7) in f32)
    ph = jnp.arange(PH)
    pw = jnp.arange(PW)
    hstart = jnp.clip((ph[None] * roi_h[:, None]) // PH + y1[:, None], 0, H)
    hend = jnp.clip(((ph[None] + 1) * roi_h[:, None] + PH - 1) // PH
                    + y1[:, None], 0, H)
    wstart = jnp.clip((pw[None] * roi_w[:, None]) // PW + x1[:, None], 0, W)
    wend = jnp.clip(((pw[None] + 1) * roi_w[:, None] + PW - 1) // PW
                    + x1[:, None], 0, W)

    flat = features.reshape(C, H * W)

    def body(k, acc):
        dy = k // max_bin
        dx = k % max_bin
        Y = hstart + dy                                   # [R, PH]
        X = wstart + dx                                   # [R, PW]
        valid = ((Y < hend)[:, :, None] & (X < wend)[:, None, :])
        lin = (jnp.minimum(Y, H - 1)[:, :, None] * W
               + jnp.minimum(X, W - 1)[:, None, :])       # [R, PH, PW]
        vals = flat[:, lin.reshape(-1)].reshape(C, R, PH, PW)
        vals = jnp.where(valid[None], vals, -jnp.inf)
        return jnp.maximum(acc, vals)

    acc = jax.lax.fori_loop(
        0, max_bin * max_bin, body,
        jnp.full((C, R, PH, PW), -jnp.inf, features.dtype))
    acc = jnp.where(jnp.isfinite(acc), acc, 0.0)
    return jnp.transpose(acc, (1, 0, 2, 3))


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio", "aligned"))
def roi_align(features: jnp.ndarray, rois: jnp.ndarray, *,
              output_size: tuple[int, int], spatial_scale: float,
              sampling_ratio: int = 2, aligned: bool = True) -> jnp.ndarray:
    """features [C, H, W]; rois [R, 4] xyxy in input-image coords.
    Returns [R, C, PH, PW]."""
    C, H, W = features.shape
    PH, PW = output_size
    R = rois.shape[0]
    S = sampling_ratio
    assert S >= 1, "adaptive sampling_ratio not supported; pass an int >= 1"
    off = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * spatial_scale - off
    y1 = rois[:, 1] * spatial_scale - off
    x2 = rois[:, 2] * spatial_scale - off
    y2 = rois[:, 3] * spatial_scale - off
    rw = x2 - x1
    rh = y2 - y1
    if not aligned:                      # legacy: clamp min size 1
        rw = jnp.maximum(rw, 1.0)
        rh = jnp.maximum(rh, 1.0)
    bin_h = rh / PH
    bin_w = rw / PW

    ph = jnp.arange(PH, dtype=jnp.float32)
    pw = jnp.arange(PW, dtype=jnp.float32)
    flat = features.reshape(C, H * W)

    def body(k, acc):
        iy = (k // S).astype(jnp.float32)
        ix = (k % S).astype(jnp.float32)
        ys = y1[:, None] + (ph[None] + (iy + 0.5) / S) * bin_h[:, None]
        xs = x1[:, None] + (pw[None] + (ix + 0.5) / S) * bin_w[:, None]
        inside = ((ys >= -1.0) & (ys <= H))[:, :, None] \
            & ((xs >= -1.0) & (xs <= W))[:, None, :]      # [R, PH, PW]
        y = jnp.clip(ys, 0.0, H - 1)
        x = jnp.clip(xs, 0.0, W - 1)
        y0 = jnp.floor(y).astype(jnp.int32)
        x0 = jnp.floor(x).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, H - 1)
        x1i = jnp.minimum(x0 + 1, W - 1)
        ly = (y - y0)[:, :, None]                         # [R, PH, 1]
        lx = (x - x0)[:, None, :]                         # [R, 1, PW]
        hy, hx = 1.0 - ly, 1.0 - lx

        def g(yy, xx):
            lin = (yy[:, :, None] * W + xx[:, None, :]).reshape(-1)
            return flat[:, lin].reshape(C, R, PH, PW)

        val = (g(y0, x0) * (hy * hx)[None] + g(y0, x1i) * (hy * lx)[None]
               + g(y1i, x0) * (ly * hx)[None] + g(y1i, x1i) * (ly * lx)[None])
        val = jnp.where(inside[None], val, 0.0)
        return acc + val

    acc = jax.lax.fori_loop(0, S * S, body,
                            jnp.zeros((C, R, PH, PW), jnp.float32))
    return jnp.transpose(acc / (S * S), (1, 0, 2, 3)).astype(features.dtype)


@partial(jax.jit,
         static_argnames=("output_size", "sampling_ratio", "aligned",
                          "level_shapes", "box_chunk"))
def roi_align_flat(flat_features: jnp.ndarray, rois: jnp.ndarray,
                   levels: jnp.ndarray, *, level_shapes: tuple,
                   spatial_scales: tuple, output_size: tuple[int, int],
                   sampling_ratio: int = 2,
                   aligned: bool = True,
                   box_chunk: int | None = None) -> jnp.ndarray:
    """RoIAlign over a FLATTENED feature pyramid: ONE pass over R boxes where
    each box samples its assigned level (vs aligning every box on every level
    and selecting — 4x the gather work for FPN).

    flat_features: [C, sum(H_l*W_l)] (levels concatenated along the flat
    spatial axis); rois [R, 4] xyxy image coords; levels [R] int32 index into
    ``level_shapes``/``spatial_scales``. Same per-level semantics as
    roi_align. Returns [R, C, PH, PW] in fp32.

    box_chunk: process boxes in sequential chunks of (the largest divisor of
    R not exceeding) this size via lax.map. Per-box math is independent, so
    results are BIT-IDENTICAL to the unchunked pass; what changes is the
    live set — unchunked, the four fp32 bilinear-corner products are each
    [C, R, PH, PW] (1.87 GB apiece at the X101 envelope C=512/R=1000/db=20,
    the round-4 "db=24 OOM" — the X101 HBM-ceiling forensics in
    docs/PERFORMANCE.md). None = unchunked.
    """
    if box_chunk is not None and 0 < box_chunk < rois.shape[0]:
        # (box_chunk <= 0 means unchunked, like None)
        R = rois.shape[0]
        chunk = max(c for c in range(1, box_chunk + 1) if R % c == 0)
        if chunk == 1:
            # R coprime to every c <= box_chunk (e.g. prime R): a
            # one-box-per-step lax.map would be a silent orders-of-magnitude
            # slowdown — run unchunked instead (R=1000 in the X101 envelope
            # always has good divisors, so this is a safety net only)
            chunk = R
    else:
        chunk = rois.shape[0]
    if chunk < rois.shape[0]:
        R = rois.shape[0]
        out = jax.lax.map(
            lambda rl: roi_align_flat(
                flat_features, rl[0], rl[1], level_shapes=level_shapes,
                spatial_scales=spatial_scales, output_size=output_size,
                sampling_ratio=sampling_ratio, aligned=aligned,
                box_chunk=None),
            (rois.reshape(R // chunk, chunk, 4),
             levels.reshape(R // chunk, chunk)))
        return out.reshape(R, *out.shape[2:])
    C = flat_features.shape[0]
    PH, PW = output_size
    R = rois.shape[0]
    S = sampling_ratio
    Hs = jnp.asarray([s[0] for s in level_shapes], jnp.int32)
    Ws = jnp.asarray([s[1] for s in level_shapes], jnp.int32)
    offs = jnp.asarray(
        [0] + list(jnp.cumsum(jnp.asarray(
            [s[0] * s[1] for s in level_shapes]))[:-1]), jnp.int32)
    scales = jnp.asarray(spatial_scales, jnp.float32)

    sc = scales[levels]                               # [R]
    Hb = Hs[levels].astype(jnp.float32)
    Wb = Ws[levels].astype(jnp.float32)
    Wi = Ws[levels]                                   # int, row stride
    off_b = offs[levels]

    off = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * sc - off
    y1 = rois[:, 1] * sc - off
    rw = rois[:, 2] * sc - off - x1
    rh = rois[:, 3] * sc - off - y1
    if not aligned:
        rw = jnp.maximum(rw, 1.0)
        rh = jnp.maximum(rh, 1.0)
    bin_h = rh / PH
    bin_w = rw / PW

    ph = jnp.arange(PH, dtype=jnp.float32)
    pw = jnp.arange(PW, dtype=jnp.float32)

    def body(k, acc):
        iy = (k // S).astype(jnp.float32)
        ix = (k % S).astype(jnp.float32)
        ys = y1[:, None] + (ph[None] + (iy + 0.5) / S) * bin_h[:, None]
        xs = x1[:, None] + (pw[None] + (ix + 0.5) / S) * bin_w[:, None]
        inside = ((ys >= -1.0) & (ys <= Hb[:, None]))[:, :, None] \
            & ((xs >= -1.0) & (xs <= Wb[:, None]))[:, None, :]
        y = jnp.clip(ys, 0.0, Hb[:, None] - 1)
        x = jnp.clip(xs, 0.0, Wb[:, None] - 1)
        y0 = jnp.floor(y).astype(jnp.int32)
        x0 = jnp.floor(x).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, (Hb[:, None] - 1).astype(jnp.int32))
        x1i = jnp.minimum(x0 + 1, (Wb[:, None] - 1).astype(jnp.int32))
        ly = (y - y0)[:, :, None]
        lx = (x - x0)[:, None, :]
        hy, hx = 1.0 - ly, 1.0 - lx

        def g(yy, xx):
            lin = (off_b[:, None, None] + yy[:, :, None] * Wi[:, None, None]
                   + xx[:, None, :]).reshape(-1)
            return flat_features[:, lin].reshape(C, R, PH, PW)

        val = (g(y0, x0) * (hy * hx)[None] + g(y0, x1i) * (hy * lx)[None]
               + g(y1i, x0) * (ly * hx)[None] + g(y1i, x1i) * (ly * lx)[None])
        val = jnp.where(inside[None], val.astype(jnp.float32), 0.0)
        return acc + val

    acc = jax.lax.fori_loop(0, S * S, body,
                            jnp.zeros((C, R, PH, PW), jnp.float32))
    return jnp.transpose(acc / (S * S), (1, 0, 2, 3))
