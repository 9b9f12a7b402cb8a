"""Caffe-style ResNet backbone for the region-feature detectors.

Re-implements the behavior of the reference's detectron2-fork ResNet
(features_extraction/py-bottom-up-attention/detectron2/modeling/backbone/
resnet.py:31-486) the TPU way: functional NHWC convs (XLA-native layouts),
frozen BatchNorm folded to per-channel scale/bias (inference-only detectors),
and per-stage ``lax``-friendly composition.

Quirks reproduced:
 - stride_in_1x1=True (caffe): the downsampling stride lives on the 1x1
   conv1 of each bottleneck, not the 3x3 (defaults.py:467).
 - caffe_maxpool: stem max-pool 3x3/2 pad=0 ceil_mode=True (resnet.py:319).
 - RES5HALVE=False (VG config): res5 runs at stride 1 with no spatial halving
   so the 14x14 RoI crop stays 14x14 before mean-pool.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

# (depth -> blocks per stage) for res2..res5
STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


def conv(x, p: Params, *, stride: int = 1, dilation: int = 1,
         groups: int = 1):
    """NHWC conv, weights HWIO, SAME-style explicit padding like torch
    (pad = ((k-1)*dilation)//2). groups>1 = ResNeXt grouped conv."""
    k = p["w"].shape[0]
    pad = ((k - 1) * dilation) // 2
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        y = y + p["b"]
    return y


def frozen_bn(x, p: Params):
    """Folded inference BN: x*scale + bias."""
    return x * p["scale"] + p["bias"]


def caffe_maxpool(x):
    """max_pool2d(k=3, s=2, pad=0, ceil_mode=True): pad bottom/right so the
    last partial window is included, with -inf padding."""
    H, W = x.shape[1], x.shape[2]
    out_h = -(-(H - 3) // 2) + 1      # ceil((H-3)/2)+1
    out_w = -(-(W - 3) // 2) + 1
    need_h = (out_h - 1) * 2 + 3 - H
    need_w = (out_w - 1) * 2 + 3 - W
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (0, max(need_h, 0)), (0, max(need_w, 0)), (0, 0)])


def bottleneck(x, p: Params, *, stride: int = 1, dilation: int = 1,
               stride_in_1x1: bool = True, groups: int = 1):
    s1, s3 = (stride, 1) if stride_in_1x1 else (1, stride)
    out = jax.nn.relu(frozen_bn(conv(x, p["conv1"], stride=s1), p["bn1"]))
    out = jax.nn.relu(frozen_bn(
        conv(out, p["conv2"], stride=s3, dilation=dilation, groups=groups),
        p["bn2"]))
    out = frozen_bn(conv(out, p["conv3"]), p["bn3"])
    if "shortcut" in p:
        sc = frozen_bn(conv(x, p["shortcut"], stride=stride), p["bn_sc"])
    else:
        sc = x
    return jax.nn.relu(out + sc)


def stage(x, blocks: list[Params], *, stride: int, dilation: int = 1,
          stride_in_1x1: bool = True, groups: int = 1):
    for i, bp in enumerate(blocks):
        x = bottleneck(x, bp, stride=stride if i == 0 else 1,
                       dilation=dilation, stride_in_1x1=stride_in_1x1,
                       groups=groups)
    return x


def backbone_stages(x, params: Params, *, stride_in_1x1: bool = True,
                    caffe_pool: bool = True, groups: int = 1):
    """Stem + res2..res5, returning all stage outputs (C2, C3, C4, C5) for
    FPN consumption. x: [N, H, W, 3]."""
    x = stem(x, params["stem"], caffe_pool=caffe_pool)
    c2 = stage(x, params["res2"], stride=1, stride_in_1x1=stride_in_1x1,
               groups=groups)
    c3 = stage(c2, params["res3"], stride=2, stride_in_1x1=stride_in_1x1,
               groups=groups)
    c4 = stage(c3, params["res4"], stride=2, stride_in_1x1=stride_in_1x1,
               groups=groups)
    c5 = stage(c4, params["res5"], stride=2, stride_in_1x1=stride_in_1x1,
               groups=groups)
    return c2, c3, c4, c5


def stem(x, p: Params, *, caffe_pool: bool = True):
    x = jax.nn.relu(frozen_bn(conv(x, p["conv1"], stride=2), p["bn1"]))
    if caffe_pool:
        return caffe_maxpool(x)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


def backbone_c4(x, params: Params, *, stride_in_1x1: bool = True,
                caffe_pool: bool = True):
    """Stem + res2..res4 -> C4 feature map (stride 16). x: [N, H, W, 3]."""
    x = stem(x, params["stem"], caffe_pool=caffe_pool)
    x = stage(x, params["res2"], stride=1, stride_in_1x1=stride_in_1x1)
    x = stage(x, params["res3"], stride=2, stride_in_1x1=stride_in_1x1)
    x = stage(x, params["res4"], stride=2, stride_in_1x1=stride_in_1x1)
    return x


def res5_head(roi_feats, params: Params, *, halve: bool = False,
              stride_in_1x1: bool = True):
    """Res5 over RoI crops [R, Ph, Pw, 1024] -> mean-pooled [R, 2048]
    (Res5ROIHeads._shared_roi_transform + mean over spatial;
    roi_heads.py / detectron2_proposal_maxnms.py:97-102). VG config
    RES5HALVE=False (roi_heads.py:340-349): block-1 conv1/shortcut stride
    2 -> 1 AND every block's conv2 gets dilation=2 / padding=2."""
    x = stage(roi_feats, params["res5"], stride=2 if halve else 1,
              dilation=1 if halve else 2, stride_in_1x1=stride_in_1x1)
    return x.mean(axis=(1, 2)), x


# ---------------------------------------------------------------------------
# init (random; production weights come from the caffe-pkl converter)
# ---------------------------------------------------------------------------

def _init_conv(rng, k, cin, cout, bias=False):
    fan = k * k * cin
    p = {"w": jax.random.normal(rng, (k, k, cin, cout), jnp.float32)
         * np.sqrt(2.0 / fan)}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def _init_bn(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def _init_bottleneck(rng, cin, cmid, cout, shortcut, groups: int = 1):
    ks = jax.random.split(rng, 4)
    p = {
        "conv1": _init_conv(ks[0], 1, cin, cmid), "bn1": _init_bn(cmid),
        # grouped conv weights are [k, k, cmid/groups, cmid] (HWIO)
        "conv2": _init_conv(ks[1], 3, cmid // groups, cmid),
        "bn2": _init_bn(cmid),
        "conv3": _init_conv(ks[2], 1, cmid, cout), "bn3": _init_bn(cout),
    }
    if shortcut:
        p["shortcut"] = _init_conv(ks[3], 1, cin, cout)
        p["bn_sc"] = _init_bn(cout)
    return p


def init_backbone_c4(rng, *, depth: int = 101) -> Params:
    n2, n3, n4, _ = STAGE_BLOCKS[depth]
    ks = iter(jax.random.split(rng, 64))
    params = {"stem": {"conv1": _init_conv(next(ks), 7, 3, 64),
                       "bn1": _init_bn(64)}}

    def make_stage(n, cin, cmid, cout):
        return [_init_bottleneck(next(ks), cin if i == 0 else cout, cmid,
                                 cout, shortcut=(i == 0)) for i in range(n)]

    params["res2"] = make_stage(n2, 64, 64, 256)
    params["res3"] = make_stage(n3, 256, 128, 512)
    params["res4"] = make_stage(n4, 512, 256, 1024)
    return params


def init_res5(rng, *, depth: int = 101) -> Params:
    _, _, _, n5 = STAGE_BLOCKS[depth]
    ks = iter(jax.random.split(rng, 8))
    return {"res5": [_init_bottleneck(next(ks), 1024 if i == 0 else 2048,
                                      512, 2048, shortcut=(i == 0))
                     for i in range(n5)]}


def init_backbone_x(rng, *, depth: int = 101, groups: int = 32,
                    width_per_group: int = 8) -> Params:
    """ResNeXt backbone (X-101 (64x4d per detectron_model.yaml) for the mmf/vqa-maskrcnn-benchmark
    feature pipeline), stages res2..res5."""
    n2, n3, n4, n5 = STAGE_BLOCKS[depth]
    ks = iter(jax.random.split(rng, 128))
    params = {"stem": {"conv1": _init_conv(next(ks), 7, 3, 64),
                       "bn1": _init_bn(64)}}

    def make_stage(n, cin, cmid, cout):
        return [_init_bottleneck(next(ks), cin if i == 0 else cout, cmid,
                                 cout, shortcut=(i == 0), groups=groups)
                for i in range(n)]

    w = groups * width_per_group          # 256 for 64x4d and 32x8d alike
    params["res2"] = make_stage(n2, 64, w, 256)
    params["res3"] = make_stage(n3, 256, w * 2, 512)
    params["res4"] = make_stage(n4, 512, w * 4, 1024)
    params["res5"] = make_stage(n5, 1024, w * 8, 2048)
    return params
