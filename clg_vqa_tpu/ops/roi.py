"""RoI feature extraction ops — TPU-native replacements for the reference's
CUDA ROIPool / ROIAlign kernels (SURVEY.md §2.3a/b:
detectron2 ROIAlign_cuda.cu, maskrcnn-benchmark ROIPool_cuda.cu).

Formulations chosen for XLA: everything is a fixed-shape gather + weighted
sum; the per-bin reductions vectorize over (rois, bins, samples) with no
data-dependent shapes. Forward-only (feature extraction is inference).

Semantics:
 - roi_align: detectron2/torchvision RoIAlign. ``aligned=True`` shifts
   coordinates by -0.5 (pixel-center alignment); ``sampling_ratio`` grid
   points per bin averaged; bilinear interpolation with edge clamping,
   samples outside [-1, H] zeroed.
 - roi_pool: quantized max pooling (torchvision RoIPool): roi scaled by
   ``spatial_scale`` and rounded, bins partitioned by floor/ceil, empty bins
   yield 0.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear(feat: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray):
    """feat [C, H, W]; y/x [...] sample coords. Returns [..., C]."""
    C, H, W = feat.shape
    # torchvision/detectron2: samples with y < -1 or y > H are zero; then
    # clamp to [0, H-1] for interpolation
    inside = (y >= -1.0) & (y <= H) & (x >= -1.0) & (x <= W)
    y = jnp.clip(y, 0.0, H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    ly, lx = y - y0, x - x0
    hy, hx = 1.0 - ly, 1.0 - lx

    def g(yy, xx):
        return feat[:, yy, xx]          # [C, ...] via advanced indexing

    val = (g(y0, x0) * (hy * hx) + g(y0, x1) * (hy * lx)
           + g(y1, x0) * (ly * hx) + g(y1, x1) * (ly * lx))
    val = jnp.where(inside, val, 0.0)
    return jnp.moveaxis(val, 0, -1)     # [..., C]


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio", "aligned"))
def roi_align(features: jnp.ndarray, rois: jnp.ndarray, *,
              output_size: tuple[int, int], spatial_scale: float,
              sampling_ratio: int = 2, aligned: bool = True) -> jnp.ndarray:
    """features [C, H, W]; rois [R, 4] xyxy in input-image coords.
    Returns [R, C, PH, PW]."""
    PH, PW = output_size
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

    iy = (jnp.arange(S) + 0.5) / S       # sample offsets within a bin
    ph = jnp.arange(PH)
    pw = jnp.arange(PW)
    # y coords: [R, PH, S]
    ys = (y1[:, None, None] + (ph[None, :, None] + iy[None, None, :])
          * bin_h[:, None, None])
    xs = (x1[:, None, None] + (pw[None, :, None] + iy[None, None, :])
          * bin_w[:, None, None])
    # broadcast to [R, PH, S, PW, S]
    Y = ys[:, :, :, None, None]
    X = xs[:, None, None, :, :]
    Y, X = jnp.broadcast_arrays(Y, X)
    vals = jax.vmap(lambda y, x: _bilinear(features, y, x))(
        Y.reshape(Y.shape[0], -1), X.reshape(X.shape[0], -1))
    vals = vals.reshape(Y.shape[0], PH, S, PW, S, -1)
    out = vals.mean(axis=(2, 4))         # average the S*S samples
    return jnp.moveaxis(out, -1, 1)      # [R, C, PH, PW]


@partial(jax.jit, static_argnames=("output_size", "max_bin"))
def roi_pool(features: jnp.ndarray, rois: jnp.ndarray, *,
             output_size: tuple[int, int], spatial_scale: float,
             max_bin: int = 16) -> jnp.ndarray:
    """Quantized max-pool RoI (torchvision RoIPool). features [C, H, W],
    rois [R, 4] xyxy. Returns [R, C, PH, PW].

    max_bin bounds the per-bin window (ceil(roi_extent / P) + 1); bins larger
    than that are truncated — raise it for extreme aspect ratios.
    """
    C, H, W = features.shape
    PH, PW = output_size
    x1 = jnp.round(rois[:, 0] * spatial_scale).astype(jnp.int32)
    y1 = jnp.round(rois[:, 1] * spatial_scale).astype(jnp.int32)
    x2 = jnp.round(rois[:, 2] * spatial_scale).astype(jnp.int32)
    y2 = jnp.round(rois[:, 3] * spatial_scale).astype(jnp.int32)
    roi_h = jnp.maximum(y2 - y1 + 1, 1)
    roi_w = jnp.maximum(x2 - x1 + 1, 1)

    # exact integer bin boundaries: floor(p*roi/P) and ceil((p+1)*roi/P) in
    # integer arithmetic — float versions are fusion-order dependent when a
    # boundary lands exactly on an integer (e.g. 7*(3/7) in f32)
    ph = jnp.arange(PH)
    pw = jnp.arange(PW)
    hstart = jnp.clip((ph[None] * roi_h[:, None]) // PH
                      + y1[:, None], 0, H)              # [R, PH]
    hend = jnp.clip(((ph[None] + 1) * roi_h[:, None] + PH - 1) // PH
                    + y1[:, None], 0, H)
    wstart = jnp.clip((pw[None] * roi_w[:, None]) // PW
                      + x1[:, None], 0, W)
    wend = jnp.clip(((pw[None] + 1) * roi_w[:, None] + PW - 1) // PW
                    + x1[:, None], 0, W)

    dy = jnp.arange(max_bin)
    dx = jnp.arange(max_bin)
    # sample indices [R, PH, max_bin] clamped; mask marks in-window entries
    ysel = jnp.minimum(hstart[:, :, None] + dy[None, None, :], H - 1)
    ymask = (hstart[:, :, None] + dy[None, None, :]) < hend[:, :, None]
    xsel = jnp.minimum(wstart[:, :, None] + dx[None, None, :], W - 1)
    xmask = (wstart[:, :, None] + dx[None, None, :]) < wend[:, :, None]

    # gather [R, PH, by, PW, bx, C]
    def per_roi(ysel_r, ymask_r, xsel_r, xmask_r):
        # feat[:, ysel_r, :] -> [C, PH, by, W]
        fy = features[:, ysel_r, :]
        fyx = fy[:, :, :, xsel_r]                    # [C, PH, by, PW, bx]
        m = (ymask_r[:, :, None, None] & xmask_r[None, None, :, :])
        fyx = jnp.where(m[None], fyx, -jnp.inf)
        out = jnp.max(fyx, axis=(2, 4))              # [C, PH, PW]
        return jnp.where(jnp.isfinite(out), out, 0.0)

    return jax.vmap(per_roi)(ysel, ymask, xsel, xmask)
