"""Composed X-101 backbone+FPN parity against the REFERENCE'S OWN torch
modules (vqa-maskrcnn-benchmark maskrcnn_benchmark/modeling/backbone/
{resnet,fpn}.py, imported with the _C extension stubbed): a tiny
ResNeXt-FPN built by THEIR code, with randomized frozen-BN statistics,
converted through utils/convert_detector.maskrcnn_x101_to_pytree, must
produce the same P2..P6 pyramid as our JAX backbone_stages + fpn.

This is the X101 counterpart of tests/test_detector_composed_parity.py
(which caught a res5-dilation bug on the C4 side); the lack of a
composed check here is how the 32x8d/stride-in-1x1 misconfiguration
slipped through rounds 1-2.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_ROOT = ("/root/reference/features_extraction/mmf/github/"
         "vqa-maskrcnn-benchmark")


def _import_ref_backbone():
    if _ROOT not in sys.path:
        sys.path.insert(0, _ROOT)
    # the layers package imports the compiled _C extension at module
    # import time; none of its symbols run in the backbone/FPN forward
    stub = types.ModuleType("maskrcnn_benchmark._C")
    stub.nms = None
    stub.roi_align_forward = None
    stub.roi_pool_forward = None
    sys.modules.setdefault("maskrcnn_benchmark._C", stub)
    from maskrcnn_benchmark.modeling.backbone import fpn as ref_fpn
    from maskrcnn_benchmark.modeling.backbone import resnet as ref_resnet
    return ref_resnet, ref_fpn


class _NS(types.SimpleNamespace):
    pass


def _tiny_cfg(groups: int, width: int):
    c = _NS()
    c.MODEL = _NS()
    c.MODEL.RESNETS = _NS(
        STEM_FUNC="StemWithFixedBatchNorm",
        TRANS_FUNC="BottleneckWithFixedBatchNorm",
        NUM_GROUPS=groups, WIDTH_PER_GROUP=width,
        STEM_OUT_CHANNELS=8, RES2_OUT_CHANNELS=16,
        STRIDE_IN_1X1=False, RES5_DILATION=1)
    c.MODEL.BACKBONE = _NS(CONV_BODY="R-101-FPN", FREEZE_CONV_BODY_AT=2)
    return c


def _randomize_(module, seed: int):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, t in list(module.state_dict().items()):
            if name.endswith("running_var"):
                t.copy_(torch.rand(t.shape, generator=g) + 0.5)
            else:
                t.copy_(torch.randn(t.shape, generator=g) * 0.2)


def test_x101_backbone_fpn_composed_parity():
    ref_resnet, ref_fpn = _import_ref_backbone()
    groups, width = 2, 2
    body = ref_resnet.ResNet(_tiny_cfg(groups, width)).eval()
    fpn_t = ref_fpn.FPN(in_channels_list=[16, 32, 64, 128], out_channels=24,
                        top_blocks=ref_fpn.LastLevelMaxPool()).eval()
    _randomize_(body, 0)
    _randomize_(fpn_t, 1)

    r = np.random.RandomState(2)
    x = r.randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        stages_t = body(torch.from_numpy(x))
        pyr_t = fpn_t(stages_t)
    assert len(stages_t) == 4 and len(pyr_t) == 5

    # ---- convert THEIR weights into OUR pytree through the real converter
    sd = {f"backbone.body.{k}": v.numpy() for k, v in
          body.state_dict().items()}
    sd.update({f"backbone.fpn.{k}": v.numpy() for k, v in
               fpn_t.state_dict().items()})
    # converter demands a complete GeneralizedRCNN inventory: provide the
    # (unused-here) rpn/box-head/predictor tensors with consistent shapes
    def lin(o, i):
        return {"weight": r.randn(o, i).astype(np.float32),
                "bias": r.randn(o).astype(np.float32)}

    def cv(o, i, k):
        return {"weight": r.randn(o, i, k, k).astype(np.float32),
                "bias": r.randn(o).astype(np.float32)}

    for name, p in (("rpn.head.conv", cv(24, 24, 3)),
                    ("rpn.head.cls_logits", cv(3, 24, 1)),
                    ("rpn.head.bbox_pred", cv(12, 24, 1)),
                    ("roi_heads.box.feature_extractor.fc6",
                     lin(32, 24 * 7 * 7)),
                    ("roi_heads.box.feature_extractor.fc7", lin(32, 32)),
                    ("roi_heads.box.predictor.cls_score", lin(10, 32)),
                    ("roi_heads.box.predictor.bbox_pred", lin(40, 32))):
        for suf, v in p.items():
            sd[f"{name}.{suf}"] = v

    from clg_vqa_tpu.utils.convert_detector import maskrcnn_x101_to_pytree
    params = maskrcnn_x101_to_pytree(sd)

    # ---- our JAX side
    import jax.numpy as jnp
    from clg_vqa_tpu.models.detector import fpn as F
    from clg_vqa_tpu.models.detector import resnet
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    stages_j = resnet.backbone_stages(x_nhwc, params["backbone"],
                                      groups=groups, caffe_pool=False,
                                      stride_in_1x1=False)
    pyr_j = F.fpn(stages_j, params["fpn"])

    for lvl, (t, j) in enumerate(zip(stages_t, stages_j)):
        np.testing.assert_allclose(
            np.asarray(j), np.transpose(t.numpy(), (0, 2, 3, 1)),
            rtol=1e-4, atol=1e-4, err_msg=f"stage C{lvl + 2}")
    for lvl, (t, j) in enumerate(zip(pyr_t, pyr_j)):
        np.testing.assert_allclose(
            np.asarray(j), np.transpose(t.numpy(), (0, 2, 3, 1)),
            rtol=1e-4, atol=1e-4, err_msg=f"pyramid P{lvl + 2}")


def _legacy_nms_numpy(boxes, scores, thresh):
    """Greedy NMS with the Detectron +1 IoU (csrc/cpu/nms_cpu.cpp) — the
    _C.nms stand-in for running the reference's python inference path."""
    b = boxes.numpy()
    s = scores.numpy()
    order = np.argsort(-s, kind="stable")
    areas = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    keep = []
    alive = np.ones(len(s), bool)
    for i in order:
        if not alive[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(b[i, 0], b[:, 0])
        yy1 = np.maximum(b[i, 1], b[:, 1])
        xx2 = np.minimum(b[i, 2], b[:, 2])
        yy2 = np.minimum(b[i, 3], b[:, 3])
        inter = (np.maximum(xx2 - xx1 + 1, 0) * np.maximum(yy2 - yy1 + 1, 0))
        iou = inter / (areas[i] + areas - inter)
        alive &= iou <= thresh
    return torch.as_tensor(np.asarray(keep, np.int64))


def test_x101_rpn_proposals_composed_parity(monkeypatch):
    """Our extractor's RPN proposal stage == the reference's own
    RPNPostProcessor (inference.py), run on identical random feature
    maps with converted head weights, their AnchorGenerator, and a
    numpy legacy NMS standing in for _C.nms."""
    # the 2019-era reference uses the np.float alias removed in numpy>=1.24
    monkeypatch.setattr(np, "float", float, raising=False)
    _import_ref_backbone()                 # installs the _C stub + path
    sys.modules["maskrcnn_benchmark._C"].nms = _legacy_nms_numpy
    import maskrcnn_benchmark.structures.boxlist_ops as blo
    blo._box_nms = _legacy_nms_numpy       # module already bound the name
    from maskrcnn_benchmark.modeling.box_coder import BoxCoder
    from maskrcnn_benchmark.modeling.rpn.anchor_generator import (
        AnchorGenerator)
    from maskrcnn_benchmark.modeling.rpn.inference import RPNPostProcessor
    from maskrcnn_benchmark.structures.image_list import ImageList
    import math as _math

    import jax
    import jax.numpy as jnp
    from clg_vqa_tpu.models.detector.extractor_x101 import (ExtractorX101,
                                                            X101Config,
                                                            init_x101_params)

    H, W, CH = 64, 96, 24
    cfg = X101Config(num_boxes=10, pre_nms_topk=200, post_nms_topk_level=200,
                     post_nms_topk=150, pad_h=H, pad_w=W, short=H,
                     max_size=W, bf16=False, fpn_channels=CH)
    params = init_x101_params(jax.random.key(0), cfg)
    ex = ExtractorX101(params, cfg)

    r = np.random.RandomState(4)
    pyr = [jnp.asarray(r.randn(1, -(-H // s), -(-W // s), CH)
                       .astype(np.float32) * 0.5)
           for s in ex._strides]
    props, scores, pvalid = jax.jit(ex._propose)(
        params, pyr, jnp.asarray((H, W), jnp.int32))
    props = np.asarray(props)[np.asarray(pvalid)]
    scores = np.asarray(scores)[np.asarray(pvalid)]

    # ---- reference side: same head weights, their anchors + postprocess
    import torch.nn.functional as TF
    wc = torch.from_numpy(np.transpose(
        np.asarray(params["rpn"]["conv"]["w"]), (3, 2, 0, 1)))
    bc = torch.from_numpy(np.asarray(params["rpn"]["conv"]["b"]))
    wo = torch.from_numpy(np.transpose(
        np.asarray(params["rpn"]["objectness"]["w"]), (3, 2, 0, 1)))
    bo = torch.from_numpy(np.asarray(params["rpn"]["objectness"]["b"]))
    wd = torch.from_numpy(np.transpose(
        np.asarray(params["rpn"]["deltas"]["w"]), (3, 2, 0, 1)))
    bd = torch.from_numpy(np.asarray(params["rpn"]["deltas"]["b"]))
    objs, regs = [], []
    for f in pyr:
        t = torch.from_numpy(np.transpose(np.asarray(f), (0, 3, 1, 2)))
        h = TF.relu(TF.conv2d(t, wc, bc, padding=1))
        # their head emits (N, A, H, W); ours is NHWC with A-last — the
        # permute inside forward_for_single_feature_map matches our
        # H,W,A flatten
        objs.append(TF.conv2d(h, wo, bo))
        regs.append(TF.conv2d(h, wd, bd))
    gen = AnchorGenerator(sizes=tuple((s,) for s in ex._sizes),
                          aspect_ratios=(0.5, 1.0, 2.0),
                          anchor_strides=tuple(ex._strides),
                          straddle_thresh=0)
    imgs = ImageList(torch.zeros(1, 3, H, W), [(H, W)])
    anchors = gen(imgs, objs)
    post = RPNPostProcessor(pre_nms_top_n=cfg.pre_nms_topk,
                            post_nms_top_n=cfg.post_nms_topk_level,
                            nms_thresh=cfg.rpn_nms_thresh, min_size=0,
                            box_coder=BoxCoder(
                                weights=(1.0, 1.0, 1.0, 1.0),
                                bbox_xform_clip=_math.log(1000.0 / 16)),
                            fpn_post_nms_top_n=cfg.post_nms_topk)
    post.eval()
    with torch.no_grad():
        ref = post(anchors, objs, regs)[0]
    ref_boxes = ref.bbox.numpy()
    ref_scores = ref.get_field("objectness").numpy()

    assert len(ref_boxes) == len(props), (len(ref_boxes), len(props))
    # ours carries logits, theirs sigmoid probs — same order; compare the
    # box SETS sorted by score
    o = np.argsort(-scores, kind="stable")
    q = np.argsort(-ref_scores, kind="stable")
    np.testing.assert_allclose(props[o], ref_boxes[q], rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(1.0 / (1.0 + np.exp(-scores[o])),
                               ref_scores[q], rtol=1e-4, atol=1e-6)
