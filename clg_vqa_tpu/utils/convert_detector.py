"""Detector checkpoint ingest: detectron2/caffe weights -> our pytrees.

The reference's 36-box extractor loads ``faster_rcnn_from_caffe_attr.pkl``
through detectron2's caffe2 loader (checkpoint/c2_model_loading.py), which
renames caffe2 keys (res2_0_branch2a_w ...) to detectron2 names
(backbone.res2.0.conv1.weight ...). We ingest the detectron2 naming (the
fixed point of that pipeline — obtainable from the pkl with detectron2's own
converter or from any detectron2 checkpoint) and additionally accept the raw
caffe2 names directly.

BatchNorm is folded at conversion time: scale = gamma / sqrt(var + eps),
bias = beta - mean * scale (FrozenBatchNorm inference semantics). detectron2
caffe models store BN as norm.{weight,bias,running_mean,running_var}.

Conv weights are transposed OIHW -> HWIO; linear weights [out,in] -> [in,out].
"""
from __future__ import annotations

import re
from typing import Mapping

import numpy as np

BN_EPS = 1e-5   # FrozenBatchNorm2d default


def _fold_bn(sd, prefix):
    if f"{prefix}.weight" in sd and f"{prefix}.running_var" not in sd:
        # already-folded affine (caffe pkls converted by d2 fold var into
        # weight/bias and drop running stats)
        return {"scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
                "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}
    gamma = np.asarray(sd[f"{prefix}.weight"], np.float32)
    beta = np.asarray(sd[f"{prefix}.bias"], np.float32)
    mean = np.asarray(sd[f"{prefix}.running_mean"], np.float32)
    var = np.asarray(sd[f"{prefix}.running_var"], np.float32)
    scale = gamma / np.sqrt(var + BN_EPS)
    return {"scale": scale, "bias": beta - mean * scale}


def _conv(sd, name):
    p = {"w": np.asarray(sd[f"{name}.weight"], np.float32)
         .transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        p["b"] = np.asarray(sd[f"{name}.bias"], np.float32)
    return p


def _lin(sd, name):
    return {"w": np.asarray(sd[f"{name}.weight"], np.float32).T,
            "b": np.asarray(sd[f"{name}.bias"], np.float32)}


def caffe2_to_detectron2_names(sd: Mapping[str, np.ndarray]) -> dict:
    """Minimal c2->d2 renamer for R-C4 models (the subset of
    c2_model_loading.py the VG checkpoint needs)."""
    out = {}
    branch2 = {"branch2a": "conv1", "branch2b": "conv2", "branch2c": "conv3"}
    for k, v in sd.items():
        nk = None
        m = re.match(r"^conv1_(w|b)$", k)
        if m:
            nk = f"backbone.stem.conv1.{'weight' if m.group(1)=='w' else 'bias'}"
        m = re.match(r"^res_conv1_bn_(s|b)$", k)
        if m:
            nk = f"backbone.stem.conv1.norm.{'weight' if m.group(1)=='s' else 'bias'}"
        m = re.match(r"^res(\d)_(\d+)_branch(2[abc]|1)_(w|b)$", k)
        if m:
            stage, blk, br, sb = m.groups()
            mod = branch2.get(f"branch{br}", "shortcut")
            base = (f"backbone.res{stage}.{blk}" if int(stage) < 5
                    else f"roi_heads.res5.{blk}")
            nk = f"{base}.{mod}.{'weight' if sb=='w' else 'bias'}"
        m = re.match(r"^res(\d)_(\d+)_branch(2[abc]|1)_bn_(s|b)$", k)
        if m:
            stage, blk, br, sb = m.groups()
            mod = branch2.get(f"branch{br}", "shortcut")
            base = (f"backbone.res{stage}.{blk}" if int(stage) < 5
                    else f"roi_heads.res5.{blk}")
            nk = f"{base}.{mod}.norm.{'weight' if sb=='s' else 'bias'}"
        for c2, d2 in (("conv_rpn", "proposal_generator.rpn_head.conv"),
                       ("rpn_cls_logits", "proposal_generator.rpn_head.objectness_logits"),
                       ("rpn_bbox_pred", "proposal_generator.rpn_head.anchor_deltas"),
                       ("cls_score", "roi_heads.box_predictor.cls_score"),
                       ("bbox_pred", "roi_heads.box_predictor.bbox_pred"),
                       ("fc_attr", "roi_heads.box_predictor.fc_attr"),
                       ("attr_score", "roi_heads.box_predictor.attr_score"),
                       ("cls_embedding", "roi_heads.box_predictor.cls_embedding")):
            m = re.match(rf"^{c2}_(w|b)$", k)
            if m:
                nk = f"{d2}.{'weight' if m.group(1)=='w' else 'bias'}"
        out[nk or k] = v
    return out


def _blocks(sd, base, n, *, conv_prefix=""):
    blocks = []
    for i in range(n):
        p = {
            "conv1": _conv(sd, f"{base}.{i}.conv1"),
            "bn1": _fold_bn(sd, f"{base}.{i}.conv1.norm"),
            "conv2": _conv(sd, f"{base}.{i}.conv2"),
            "bn2": _fold_bn(sd, f"{base}.{i}.conv2.norm"),
            "conv3": _conv(sd, f"{base}.{i}.conv3"),
            "bn3": _fold_bn(sd, f"{base}.{i}.conv3.norm"),
        }
        if f"{base}.{i}.shortcut.weight" in sd:
            p["shortcut"] = _conv(sd, f"{base}.{i}.shortcut")
            p["bn_sc"] = _fold_bn(sd, f"{base}.{i}.shortcut.norm")
        blocks.append(p)
    return blocks


def detectron2_c4_to_pytree(sd: Mapping[str, np.ndarray], *,
                            depth: int = 101) -> dict:
    """detectron2-named VG R-C4 checkpoint -> Extractor36 params pytree."""
    from ..models.detector.resnet import STAGE_BLOCKS
    if any(k.startswith("res2_0") or k == "conv1_w" for k in sd):
        sd = caffe2_to_detectron2_names(sd)
    sd = {k.replace("model.", "", 1) if k.startswith("model.") else k: v
          for k, v in sd.items()}
    n2, n3, n4, n5 = STAGE_BLOCKS[depth]
    params = {
        "backbone": {
            "stem": {"conv1": _conv(sd, "backbone.stem.conv1"),
                     "bn1": _fold_bn(sd, "backbone.stem.conv1.norm")},
            "res2": _blocks(sd, "backbone.res2", n2),
            "res3": _blocks(sd, "backbone.res3", n3),
            "res4": _blocks(sd, "backbone.res4", n4),
        },
        "res5": {"res5": _blocks(sd, "roi_heads.res5", n5)},
        "rpn": {
            "conv": _conv(sd, "proposal_generator.rpn_head.conv"),
            "objectness": _conv(
                sd, "proposal_generator.rpn_head.objectness_logits"),
            "deltas": _conv(sd, "proposal_generator.rpn_head.anchor_deltas"),
        },
        "predictor": {
            "cls_score": _lin(sd, "roi_heads.box_predictor.cls_score"),
            "bbox_pred": _lin(sd, "roi_heads.box_predictor.bbox_pred"),
            "cls_embedding": np.asarray(
                sd["roi_heads.box_predictor.cls_embedding.weight"],
                np.float32),
            "fc_attr": _lin(sd, "roi_heads.box_predictor.fc_attr"),
            "attr_score": _lin(sd, "roi_heads.box_predictor.attr_score"),
        },
    }
    return params


def pytree_to_detectron2_c4(params: dict) -> dict[str, np.ndarray]:
    """Inverse (folded-BN affine form) for roundtrip tests/export."""
    sd: dict[str, np.ndarray] = {}

    def put_conv(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
        if "b" in p:
            sd[f"{name}.bias"] = np.asarray(p["b"])

    def put_bn(name, p):
        sd[f"{name}.weight"] = np.asarray(p["scale"])
        sd[f"{name}.bias"] = np.asarray(p["bias"])

    def put_lin(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"]).T
        sd[f"{name}.bias"] = np.asarray(p["b"])

    bb = params["backbone"]
    put_conv("backbone.stem.conv1", bb["stem"]["conv1"])
    put_bn("backbone.stem.conv1.norm", bb["stem"]["bn1"])

    def put_blocks(base, blocks):
        for i, p in enumerate(blocks):
            for c, b in (("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3")):
                put_conv(f"{base}.{i}.{c}", p[c])
                put_bn(f"{base}.{i}.{c}.norm", p[b])
            if "shortcut" in p:
                put_conv(f"{base}.{i}.shortcut", p["shortcut"])
                put_bn(f"{base}.{i}.shortcut.norm", p["bn_sc"])

    for s in ("res2", "res3", "res4"):
        put_blocks(f"backbone.{s}", bb[s])
    put_blocks("roi_heads.res5", params["res5"]["res5"])
    put_conv("proposal_generator.rpn_head.conv", params["rpn"]["conv"])
    put_conv("proposal_generator.rpn_head.objectness_logits",
             params["rpn"]["objectness"])
    put_conv("proposal_generator.rpn_head.anchor_deltas",
             params["rpn"]["deltas"])
    pr = params["predictor"]
    put_lin("roi_heads.box_predictor.cls_score", pr["cls_score"])
    put_lin("roi_heads.box_predictor.bbox_pred", pr["bbox_pred"])
    sd["roi_heads.box_predictor.cls_embedding.weight"] = np.asarray(
        pr["cls_embedding"])
    put_lin("roi_heads.box_predictor.fc_attr", pr["fc_attr"])
    put_lin("roi_heads.box_predictor.attr_score", pr["attr_score"])
    return sd
