"""Pallas RoIPool — the TPU replacement for the reference's CUDA ROIPool
kernel (maskrcnn_benchmark ROIPool_cuda.cu / detectron2's pooler with
POOLER_TYPE "ROIPool", the hot op of the 36-box extractor).

Why a kernel: the XLA formulation (ops/roi.py) performs max_bin^2 full
gathers of [C, R, PH, PW] through HBM (~64 x 235 MB for the C4 shape —
hundreds of ms). Here the feature map lives in VMEM once per channel block
and every (roi, bin) max reads it directly:

  grid = (C/128, R)  — R iterates fastest, so the feature block (which only
  depends on the channel index) stays resident in VMEM across all rois.
  Per program: two nested fori_loops over the 14x14 bins; each bin slices a
  clamped fixed-size [MAX_BIN, MAX_BIN, 128] window and reduces a masked max.

Quantization semantics identical to ops/roi.py (f32 rounding, exact integer
bin boundaries) — the boundary arrays are computed outside and fed in.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C_BLOCK = 128


def _kernel(hs_ref, he_ref, ws_ref, we_ref, feat_ref, out_ref, *,
            max_bin: int, PH: int, PW: int, H: int, W: int):
    # scalar-prefetch: hs/he [R, PH], ws/we [R, PW] int32 (whole arrays in
    # SMEM); feat block [H, W, Cb]; out block [1, PH, PW, Cb]
    r = pl.program_id(1)
    neg = jnp.finfo(jnp.float32).min
    wwin = max_bin + 8

    # both bin loops are PYTHON-static: Mosaic requires static (or provably
    # 8-aligned) indices on the sublane dim for the out write, and static
    # unrolling of 14x14 bins keeps every out_ref index literal
    for ph in range(PH):
        hs = hs_ref[r, ph]
        he = he_ref[r, ph]
        hbase = jnp.clip(hs, 0, max(H - max_bin, 0))
        for pw in range(PW):
            ws = ws_ref[r, pw]
            we = we_ref[r, pw]
            # W is the sublane dim of the feature block: align the dynamic
            # start down to a multiple of 8 and widen the window
            wbase = jnp.clip((ws // 8) * 8, 0, max(W - wwin, 0))
            wbase = pl.multiple_of(wbase, 8)
            win = feat_ref[pl.ds(hbase, max_bin),
                           pl.ds(wbase, wwin), :].astype(jnp.float32)
            # full-3D int32 iota masks: minor-dim insertion on narrow types
            # is unsupported by Mosaic
            shape3 = (max_bin, wwin, win.shape[-1])
            ry = hbase + jax.lax.broadcasted_iota(jnp.int32, shape3, 0)
            rx = wbase + jax.lax.broadcasted_iota(jnp.int32, shape3, 1)
            # truncate to max_bin elements from the bin start, exactly like
            # ops/roi.py's fori_loop (the aligned window can physically
            # reach up to max_bin+8 columns past ws)
            m = (ry >= hs) & (ry < jnp.minimum(he, hs + max_bin)) \
                & (rx >= ws) & (rx < jnp.minimum(we, ws + max_bin))
            win = jnp.where(m, win, neg)
            mx = jnp.max(win, axis=(0, 1))
            out_ref[0, ph, pw, :] = jnp.where(
                mx > neg, mx, 0.0).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("output_size", "max_bin"))
def roi_pool_pallas(features: jnp.ndarray, rois: jnp.ndarray, *,
                    output_size: tuple[int, int], spatial_scale: float,
                    max_bin: int = 8) -> jnp.ndarray:
    """features [H, W, C] (NHWC, C a multiple of 128 preferred);
    rois [R, 4] xyxy input-image coords. Returns [R, PH, PW, C]."""
    H, W, C = features.shape
    PH, PW = output_size
    R = rois.shape[0]
    if H < max_bin or W < max_bin + 8:
        # feature map smaller than the fixed VMEM window: the kernel's
        # static slice would read out of bounds — use the XLA path (same
        # semantics, fine at these tiny sizes)
        from .roi import roi_pool
        out = roi_pool(jnp.moveaxis(features, -1, 0), rois,
                       output_size=output_size, spatial_scale=spatial_scale,
                       max_bin=max_bin)
        return jnp.moveaxis(out, 1, -1)                 # [R,C,PH,PW]->[R,PH,PW,C]

    x1 = jnp.round(rois[:, 0] * spatial_scale).astype(jnp.int32)
    y1 = jnp.round(rois[:, 1] * spatial_scale).astype(jnp.int32)
    x2 = jnp.round(rois[:, 2] * spatial_scale).astype(jnp.int32)
    y2 = jnp.round(rois[:, 3] * spatial_scale).astype(jnp.int32)
    roi_h = jnp.maximum(y2 - y1 + 1, 1)
    roi_w = jnp.maximum(x2 - x1 + 1, 1)
    ph = jnp.arange(PH)
    pw = jnp.arange(PW)
    hstart = jnp.clip((ph[None] * roi_h[:, None]) // PH + y1[:, None], 0, H)
    hend = jnp.clip(((ph[None] + 1) * roi_h[:, None] + PH - 1) // PH
                    + y1[:, None], 0, H).astype(jnp.int32)
    wstart = jnp.clip((pw[None] * roi_w[:, None]) // PW + x1[:, None], 0, W)
    wend = jnp.clip(((pw[None] + 1) * roi_w[:, None] + PW - 1) // PW
                    + x1[:, None], 0, W).astype(jnp.int32)
    hstart = hstart.astype(jnp.int32)
    wstart = wstart.astype(jnp.int32)

    n_cb = -(-C // C_BLOCK)
    kern = functools.partial(_kernel, max_bin=max_bin, PH=PH, PW=PW,
                             H=H, W=W)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,       # hs/he/ws/we live whole in SMEM
        grid=(n_cb, R),              # R fastest: feat block stays resident
        in_specs=[
            pl.BlockSpec((H, W, C_BLOCK), lambda c, r, *_: (0, 0, c)),
        ],
        out_specs=pl.BlockSpec((1, PH, PW, C_BLOCK),
                               lambda c, r, *_: (r, 0, 0, c)),
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, PH, PW, C), features.dtype),
        grid_spec=grid_spec,
    )(hstart, hend, wstart, wend, features)
    return out
