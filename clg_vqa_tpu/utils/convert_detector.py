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


#: checkpoint entries that carry no learnable weight our pipeline needs
#: (normalization buffers are config-derived; anchors are regenerated)
_C4_IGNORED = re.compile(
    r"pixel_mean|pixel_std|anchor_generator|cell_anchors")


def detectron2_c4_to_pytree(sd: Mapping[str, np.ndarray], *,
                            depth: int = 101, strict: bool = True) -> dict:
    """detectron2-named VG R-C4 checkpoint -> Extractor36 params pytree.

    strict: raise KeyError listing any checkpoint key that was neither
    consumed nor on the known no-weight ignore list — mapping drift against
    a real released pkl fails loudly instead of silently dropping weights."""
    from ..models.detector.resnet import STAGE_BLOCKS
    if any(k.startswith("res2_0") or k == "conv1_w" for k in sd):
        sd = caffe2_to_detectron2_names(sd)
    sd = {k.replace("model.", "", 1) if k.startswith("model.") else k: v
          for k, v in sd.items()}
    used: set[str] = set()

    class _Track(dict):
        def __getitem__(self, k):
            used.add(k)
            return dict.__getitem__(self, k)

    sd = _Track(sd)
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
    if strict:
        leftovers = [k for k in sd
                     if k not in used and not _C4_IGNORED.search(k)]
        if leftovers:
            raise KeyError(
                f"unmapped checkpoint keys: {sorted(leftovers)[:10]}"
                f" (+{max(len(leftovers) - 10, 0)} more)")
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


# ---------------------------------------------------------------------------
# X-101 FPN (vqa-maskrcnn-benchmark / mmf feature pipeline; 64x4d, FPN 512)
# ---------------------------------------------------------------------------

#: state-dict keys that carry no learnable weights (anchor buffers are
#: re-derived from config by our RPN; BufferList registers them in the
#: torch state_dict, anchor_generator.py:49-58)
_X101_IGNORED = re.compile(r"(^|\.)anchor_generator\.|cell_anchors")


def maskrcnn_x101_to_pytree(sd: Mapping[str, np.ndarray]) -> dict:
    """vqa-maskrcnn-benchmark ``detectron_model.pth`` (GeneralizedRCNN,
    X-101-64x4d FPN-512 detectron_model.pth) -> ExtractorX101 params pytree.

    Key naming per the vendored sources:
      backbone.body.stem.{conv1,bn1}            resnet.py:270-277
      backbone.body.layer{1..4}.{i}.{conv,bn}{1,2,3} / .downsample.{0,1}
                                                resnet.py:200-246
      backbone.fpn.fpn_inner{1..4} / fpn_layer{1..4}   fpn.py:28-29
      rpn.head.{conv,cls_logits,bbox_pred}      rpn/rpn.py:27-29
      roi_heads.box.feature_extractor.{fc6,fc7} roi_box_feature_extractors.py:63-64
      roi_heads.box.predictor.{cls_score,bbox_pred}    roi_box_predictors.py:19-20

    FrozenBatchNorm stats are folded (the .pth stores weight/bias/
    running_mean/running_var even though they're frozen); conv weights go
    OIHW -> HWIO (grouped convs keep [k, k, cin/groups, cout]); linear
    weights [out, in] -> [in, out]. fc6 consumes the C-order-flattened
    [C, 7, 7] crop exactly as torch's .view does, so no input permutation
    is needed (models/detector/fpn.py box_head_fc keeps crops channel-first).
    Raises KeyError listing leftovers if any non-ignored key goes unused.
    """
    from ..models.detector.resnet import STAGE_BLOCKS
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    used: set[str] = set()

    class Track(dict):
        def __getitem__(self, k):
            used.add(k)
            return dict.__getitem__(self, k)

        def __contains__(self, k):
            return dict.__contains__(self, k)

    t = Track(sd)

    def blocks(stage_idx: int, n: int):
        base = f"backbone.body.layer{stage_idx}"
        out = []
        for i in range(n):
            p = {
                "conv1": _conv(t, f"{base}.{i}.conv1"),
                "bn1": _fold_bn(t, f"{base}.{i}.bn1"),
                "conv2": _conv(t, f"{base}.{i}.conv2"),
                "bn2": _fold_bn(t, f"{base}.{i}.bn2"),
                "conv3": _conv(t, f"{base}.{i}.conv3"),
                "bn3": _fold_bn(t, f"{base}.{i}.bn3"),
            }
            if f"{base}.{i}.downsample.0.weight" in sd:
                p["shortcut"] = _conv(t, f"{base}.{i}.downsample.0")
                p["bn_sc"] = _fold_bn(t, f"{base}.{i}.downsample.1")
            out.append(p)
        return out

    n2, n3, n4, n5 = STAGE_BLOCKS[101]
    params = {
        "backbone": {
            "stem": {"conv1": _conv(t, "backbone.body.stem.conv1"),
                     "bn1": _fold_bn(t, "backbone.body.stem.bn1")},
            "res2": blocks(1, n2), "res3": blocks(2, n3),
            "res4": blocks(3, n4), "res5": blocks(4, n5),
        },
        "fpn": {
            "lateral": [_conv(t, f"backbone.fpn.fpn_inner{i}")
                        for i in (1, 2, 3, 4)],
            "output": [_conv(t, f"backbone.fpn.fpn_layer{i}")
                       for i in (1, 2, 3, 4)],
        },
        "rpn": {
            "conv": _conv(t, "rpn.head.conv"),
            "objectness": _conv(t, "rpn.head.cls_logits"),
            "deltas": _conv(t, "rpn.head.bbox_pred"),
        },
        "box_head": {
            "fc6": _lin(t, "roi_heads.box.feature_extractor.fc6"),
            "fc7": _lin(t, "roi_heads.box.feature_extractor.fc7"),
        },
        "predictor": {
            "cls_score": _lin(t, "roi_heads.box.predictor.cls_score"),
            "bbox_pred": _lin(t, "roi_heads.box.predictor.bbox_pred"),
        },
    }
    leftovers = [k for k in sd
                 if k not in used and not _X101_IGNORED.search(k)]
    if leftovers:
        raise KeyError(f"unmapped checkpoint keys: {sorted(leftovers)[:10]}"
                       f" (+{max(len(leftovers) - 10, 0)} more)")
    return params
