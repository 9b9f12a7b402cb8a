"""Detector checkpoint converters vs the REAL released key inventories.

The environment ships no detector weights, so these tests synthesize
key-complete state dicts with the exact naming/shapes of the released files:

 - VG R101-C4 `faster_rcnn_from_caffe_attr.pkl`: caffe2-Detectron names
   (conv1_w, res2_0_branch2a_w, res_conv1_bn_s, conv_rpn_w, ...) as consumed
   by the reference's converter (py-bottom-up-attention
   checkpoint/c2_model_loading.py:12-66 name rules; caffe pkls store BN as
   folded affine `_bn_s`/`_bn_b` pairs) plus the VG attribute head
   (fast_rcnn.py:339-353: cls_score/bbox_pred/cls_embedding/fc_attr/attr_score).
 - X101 `detectron_model.pth` (vqa-maskrcnn-benchmark GeneralizedRCNN):
   backbone.body.layer*/bn*/downsample naming (resnet.py:200-277), FPN
   fpn_inner*/fpn_layer* (fpn.py:28-29), rpn.head.* (rpn.py:27-29),
   roi_heads.box.* (roi_box_feature_extractors.py:63-64,
   roi_box_predictors.py:19-20), FrozenBatchNorm running stats, anchor
   buffers, and a DataParallel "module." prefix.

Each test asserts (a) every checkpoint key is consumed (nothing silently
unmapped — mapping drift would fail here, not on first real use) and (b) the
converted pytree round-trips the source values exactly.
"""
import re

import numpy as np
import pytest

import jax

from clg_vqa_tpu.utils import convert_detector as cd


def _walk(tree, prefix=""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _walk(tree[k], f"{prefix}/{k}")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _walk(v, f"{prefix}/{i}")
    else:
        yield prefix, np.asarray(tree)


def _assert_trees_equal(a, b):
    fa, fb = dict(_walk(a)), dict(_walk(b))
    assert fa.keys() == fb.keys(), (
        sorted(set(fa) ^ set(fb))[:10])
    for k in fa:
        np.testing.assert_allclose(fa[k], fb[k], rtol=1e-6, atol=1e-6,
                                   err_msg=k)




# ---------------------------------------------------------------------------
# VG R101-C4 caffe pkl
# ---------------------------------------------------------------------------

def _d2_to_caffe_name(k: str) -> str:
    """Independent inverse of the c2->d2 renaming for the VG R-C4 model
    (c2_model_loading.py:27-66, 94-123): produces the raw caffe pkl names."""
    m = re.match(r"^backbone\.stem\.conv1\.(weight|bias)$", k)
    if m:
        return "conv1_" + ("w" if m.group(1) == "weight" else "b")
    m = re.match(r"^backbone\.stem\.conv1\.norm\.(weight|bias)$", k)
    if m:
        return "res_conv1_bn_" + ("s" if m.group(1) == "weight" else "b")
    m = re.match(
        r"^(?:backbone\.res(\d)|roi_heads\.(res5))\.(\d+)\.(conv[123]|"
        r"shortcut)(\.norm)?\.(weight|bias)$", k)
    if m:
        stage = m.group(1) or "5"
        blk, mod, norm, wb = m.group(3), m.group(4), m.group(5), m.group(6)
        br = {"conv1": "branch2a", "conv2": "branch2b", "conv3": "branch2c",
              "shortcut": "branch1"}[mod]
        if norm:
            return f"res{stage}_{blk}_{br}_bn_" + \
                ("s" if wb == "weight" else "b")
        return f"res{stage}_{blk}_{br}_" + ("w" if wb == "weight" else "b")
    flat = {"proposal_generator.rpn_head.conv": "conv_rpn",
            "proposal_generator.rpn_head.objectness_logits": "rpn_cls_logits",
            "proposal_generator.rpn_head.anchor_deltas": "rpn_bbox_pred",
            "roi_heads.box_predictor.cls_score": "cls_score",
            "roi_heads.box_predictor.bbox_pred": "bbox_pred",
            "roi_heads.box_predictor.fc_attr": "fc_attr",
            "roi_heads.box_predictor.attr_score": "attr_score",
            "roi_heads.box_predictor.cls_embedding": "cls_embedding"}
    m = re.match(r"^(.*)\.(weight|bias)$", k)
    assert m and m.group(1) in flat, f"unexpected d2 key {k}"
    return flat[m.group(1)] + "_" + ("w" if m.group(2) == "weight" else "b")


def test_c4_caffe_pkl_inventory_roundtrip():
    """Full R101+VG-head key inventory in raw caffe naming: the converter
    must consume EVERY key and reproduce the source pytree."""
    from clg_vqa_tpu.models.detector.extractor import init_extractor_params
    params0 = jax.tree.map(np.asarray,
                           init_extractor_params(jax.random.key(0)))
    d2_sd = cd.pytree_to_detectron2_c4(params0)
    caffe = {_d2_to_caffe_name(k): v for k, v in d2_sd.items()}
    assert len(caffe) == len(d2_sd)          # renamer is injective
    # real pkl inventory size: R101-C4 = 33 bottlenecks x 9 tensors
    # + 4 shortcuts x 3 + stem 3 + rpn 6 + predictor 9
    assert len(caffe) > 300
    got = cd.detectron2_c4_to_pytree(caffe)   # strict: raises on leftovers
    _assert_trees_equal(got, params0)


def test_c4_unmapped_key_raises():
    from clg_vqa_tpu.models.detector.extractor import init_extractor_params
    params0 = jax.tree.map(np.asarray,
                           init_extractor_params(jax.random.key(4)))
    sd = cd.pytree_to_detectron2_c4(params0)
    sd["roi_heads.mask_head.deconv.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(KeyError, match="unmapped"):
        cd.detectron2_c4_to_pytree(sd)
    # ignore list: pixel stats / anchors are expected non-weight entries
    sd.pop("roi_heads.mask_head.deconv.weight")
    sd["pixel_mean"] = np.zeros((3,), np.float32)
    cd.detectron2_c4_to_pytree(sd)


def test_c4_d2_names_inventory_roundtrip():
    """Same at full R101 scale with detectron2 names + 'model.' prefix (the
    d2-converted pkl layout)."""
    from clg_vqa_tpu.models.detector.extractor import init_extractor_params
    params0 = jax.tree.map(np.asarray,
                           init_extractor_params(jax.random.key(1)))
    sd = {"model." + k: v
          for k, v in cd.pytree_to_detectron2_c4(params0).items()}
    got = cd.detectron2_c4_to_pytree(sd)
    _assert_trees_equal(got, params0)


# ---------------------------------------------------------------------------
# X101-64x4d FPN-512 .pth (vqa-maskrcnn-benchmark)
# ---------------------------------------------------------------------------

def _x101_state_dict(params0) -> dict:
    """Inverse mapping to the GeneralizedRCNN naming, with FrozenBatchNorm
    running stats (mean 0 / var 1-eps makes folding the identity)."""
    sd = {}

    def conv(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
        if "b" in p:
            sd[f"{name}.bias"] = np.asarray(p["b"])

    def bn(name, p):
        sd[f"{name}.weight"] = np.asarray(p["scale"])
        sd[f"{name}.bias"] = np.asarray(p["bias"])
        sd[f"{name}.running_mean"] = np.zeros_like(p["scale"])
        sd[f"{name}.running_var"] = np.full_like(p["scale"], 1.0 - cd.BN_EPS)

    def lin(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"]).T
        sd[f"{name}.bias"] = np.asarray(p["b"])

    bb = params0["backbone"]
    conv("backbone.body.stem.conv1", bb["stem"]["conv1"])
    bn("backbone.body.stem.bn1", bb["stem"]["bn1"])
    for s in (2, 3, 4, 5):
        for i, blk in enumerate(bb[f"res{s}"]):
            base = f"backbone.body.layer{s - 1}.{i}"
            for j in (1, 2, 3):
                conv(f"{base}.conv{j}", blk[f"conv{j}"])
                bn(f"{base}.bn{j}", blk[f"bn{j}"])
            if "shortcut" in blk:
                conv(f"{base}.downsample.0", blk["shortcut"])
                bn(f"{base}.downsample.1", blk["bn_sc"])
    for i in (1, 2, 3, 4):
        conv(f"backbone.fpn.fpn_inner{i}", params0["fpn"]["lateral"][i - 1])
        conv(f"backbone.fpn.fpn_layer{i}", params0["fpn"]["output"][i - 1])
    conv("rpn.head.conv", params0["rpn"]["conv"])
    conv("rpn.head.cls_logits", params0["rpn"]["objectness"])
    conv("rpn.head.bbox_pred", params0["rpn"]["deltas"])
    lin("roi_heads.box.feature_extractor.fc6", params0["box_head"]["fc6"])
    lin("roi_heads.box.feature_extractor.fc7", params0["box_head"]["fc7"])
    lin("roi_heads.box.predictor.cls_score",
        params0["predictor"]["cls_score"])
    lin("roi_heads.box.predictor.bbox_pred",
        params0["predictor"]["bbox_pred"])
    # non-weight buffers present in the real .pth (anchor_generator.py:49-58)
    for i in range(5):
        sd[f"rpn.anchor_generator.cell_anchors.{i}"] = \
            np.zeros((3, 4), np.float32)
    return sd


def test_x101_pth_inventory_roundtrip():
    from clg_vqa_tpu.models.detector.extractor_x101 import init_x101_params
    params0 = jax.tree.map(np.asarray, init_x101_params(jax.random.key(2)))
    sd = _x101_state_dict(params0)
    # DataParallel prefix as saved by mmf's training scripts
    sd = {"module." + k: v for k, v in sd.items()}
    # real inventory scale: 33 bottlenecks * ~18 tensors + stem/fpn/rpn/heads
    assert len(sd) > 550
    got = cd.maskrcnn_x101_to_pytree(sd)
    _assert_trees_equal(got, params0)


def test_x101_unmapped_key_raises():
    from clg_vqa_tpu.models.detector.extractor_x101 import init_x101_params
    params0 = jax.tree.map(np.asarray, init_x101_params(jax.random.key(3)))
    sd = _x101_state_dict(params0)
    sd["roi_heads.mask.predictor.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(KeyError, match="unmapped"):
        cd.maskrcnn_x101_to_pytree(sd)
