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
