"""Detector model tests: backbone parity vs an independent torch replica,
RPN decode parity, anchor semantics, and an end-to-end extractor smoke on a
small synthetic image (random weights)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clg_vqa_tpu.models.detector import extractor, heads, resnet, rpn


# ---------------------------------------------------------------------------
# backbone vs torch replica (torch conv/bn are the independent oracle for the
# layout/stride/padding translation)
# ---------------------------------------------------------------------------

def torch_bottleneck(x, p, stride, stride_in_1x1):
    import torch
    import torch.nn.functional as F

    def conv(x, pc, s, pad):
        w = torch.from_numpy(np.asarray(pc["w"]).transpose(3, 2, 0, 1).copy())
        return F.conv2d(x, w, stride=s, padding=pad)

    def bn(x, pb):
        s = torch.from_numpy(np.asarray(pb["scale"]))[None, :, None, None]
        b = torch.from_numpy(np.asarray(pb["bias"]))[None, :, None, None]
        return x * s + b

    s1, s3 = (stride, 1) if stride_in_1x1 else (1, stride)
    out = F.relu(bn(conv(x, p["conv1"], s1, 0), p["bn1"]))
    out = F.relu(bn(conv(out, p["conv2"], s3, 1), p["bn2"]))
    out = bn(conv(out, p["conv3"], 1, 0), p["bn3"])
    if "shortcut" in p:
        sc = bn(conv(x, p["shortcut"], stride, 0), p["bn_sc"])
    else:
        sc = x
    return F.relu(out + sc)


@pytest.mark.parametrize("stride,in1x1", [(1, True), (2, True), (2, False)])
def test_bottleneck_matches_torch(stride, in1x1):
    import torch
    r = np.random.RandomState(0)
    p = resnet._init_bottleneck(jax.random.key(0), 32, 16, 64, shortcut=True)
    p = jax.tree.map(lambda x: jnp.asarray(r.randn(*x.shape), jnp.float32), p)
    x = r.randn(2, 9, 11, 32).astype(np.float32)
    ours = np.asarray(resnet.bottleneck(jnp.asarray(x), p, stride=stride,
                                        stride_in_1x1=in1x1))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    ref = torch_bottleneck(xt, p, stride, in1x1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_caffe_maxpool_matches_torch():
    import torch
    import torch.nn.functional as F
    for H, W in [(10, 10), (11, 13), (7, 8)]:
        x = np.random.RandomState(1).randn(1, H, W, 4).astype(np.float32)
        ours = np.asarray(resnet.caffe_maxpool(jnp.asarray(x)))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
        ref = F.max_pool2d(xt, 3, 2, 0, ceil_mode=True).numpy() \
            .transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_stem_output_stride():
    p = resnet.init_backbone_c4(jax.random.key(0), depth=50)
    x = jnp.zeros((1, 64, 96, 3))
    feat = resnet.backbone_c4(x, p)
    assert feat.shape == (1, 4, 6, 1024)        # stride 16


# ---------------------------------------------------------------------------
# anchors + box decode
# ---------------------------------------------------------------------------

def test_anchor_shapes_areas():
    a = rpn.generate_anchors(2, 3, stride=16, sizes=(64, 128),
                             ratios=(0.5, 1.0, 2.0))
    assert a.shape == (2 * 3 * 6, 4)
    w = a[:, 2] - a[:, 0]
    h = a[:, 3] - a[:, 1]
    areas = w * h
    # area-preserving anchors: every anchor's area equals its size squared
    np.testing.assert_allclose(
        np.sort(np.unique(areas.round(2))), [64.0 ** 2, 128.0 ** 2])
    # ratios h/w
    np.testing.assert_allclose(np.sort(np.unique((h / w).round(4))),
                               [0.5, 1.0, 2.0])
    # first cell centered at (0, 0)
    np.testing.assert_allclose(a[0, :2], -a[0, 2:])


def test_decode_boxes_identity_and_shift():
    anchors = jnp.asarray([[0.0, 0.0, 16.0, 16.0]])
    out = rpn.decode_boxes(anchors, jnp.zeros((1, 4)))
    np.testing.assert_allclose(np.asarray(out), [[0, 0, 16, 16]], atol=1e-5)
    out = rpn.decode_boxes(anchors, jnp.asarray([[0.5, 0.0, 0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(out), [[8, 0, 24, 16]], atol=1e-4)
    # dw clamp at log(1000/16)
    out = rpn.decode_boxes(anchors, jnp.asarray([[0.0, 0.0, 100.0, 0.0]]))
    assert np.asarray(out)[0, 2] - np.asarray(out)[0, 0] == pytest.approx(
        16 * 1000 / 16, rel=1e-3)


def test_predict_boxes_class_specific():
    props = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    C = 3
    deltas = jnp.zeros((1, C * 4)).at[0, 4].set(10.0)   # class 1 dx=10/wx=1
    out = heads.predict_boxes(props, deltas)
    assert out.shape == (1, C, 4)
    np.testing.assert_allclose(np.asarray(out[0, 0]), [0, 0, 10, 10], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[0, 1]), [10, 0, 20, 10], atol=1e-3)


# ---------------------------------------------------------------------------
# end-to-end extractor smoke (tiny shapes, random weights)
# ---------------------------------------------------------------------------

def test_extractor_end_to_end_smoke():
    cfg = extractor.ExtractorConfig(num_boxes=6, pre_nms_topk=200,
                                    post_nms_topk=50, pad_h=128, pad_w=160,
                                    short=96, max_size=160)
    params = extractor.init_extractor_params(jax.random.key(0))
    ex = extractor.Extractor36(params, cfg)
    img = (np.random.RandomState(0).rand(100, 140, 3) * 255).astype(np.uint8)
    rec = ex.extract(img, "img0")
    assert rec.features.shape == (6, 2048)
    assert rec.boxes.shape == (6, 4)
    assert rec.obj_id.shape == (6,)
    assert np.isfinite(rec.features).all()
    # boxes within the raw image
    assert (rec.boxes[:, 0] >= 0).all() and (rec.boxes[:, 2] <= 140).all()
    assert (rec.boxes[:, 1] >= 0).all() and (rec.boxes[:, 3] <= 100).all()
    assert (rec.img_w, rec.img_h) == (140.0, 100.0)


# ---------------------------------------------------------------------------
# FPN / X101 path
# ---------------------------------------------------------------------------

def test_fpn_shapes_and_levels():
    from clg_vqa_tpu.models.detector import fpn as F
    params = F.init_fpn(jax.random.key(0))
    H = W = 64
    feats = (jnp.zeros((1, H // 4, W // 4, 256)),
             jnp.zeros((1, H // 8, W // 8, 512)),
             jnp.zeros((1, H // 16, W // 16, 1024)),
             jnp.zeros((1, H // 32, W // 32, 2048)))
    pyr = F.fpn(feats, params)
    assert [p.shape[1] for p in pyr] == [16, 8, 4, 2, 1]
    assert all(p.shape[-1] == 256 for p in pyr)

    boxes = jnp.asarray([[0, 0, 32, 32], [0, 0, 112, 112], [0, 0, 224, 224],
                         [0, 0, 448, 448], [0, 0, 1000, 1000]], jnp.float32)
    lvls = np.asarray(F.assign_levels(boxes))
    # canonical: 224x224 -> P4 (index 2); small -> P2 (0); huge clamps at P5
    assert lvls[0] == 0 and lvls[2] == 2 and lvls[4] == 3


def test_select_top_by_class_nms_matches_reference_loop():
    """Vectorized per-class NMS selection == the reference's python loop
    (extract_features_vmb.py:186-206)."""
    from clg_vqa_tpu.models.detector.fpn import select_top_by_class_nms
    import sys
    sys.path.insert(0, "tests")
    from test_detector_ops import rand_boxes
    r = np.random.RandomState(7)
    N, C = 40, 6
    boxes = rand_boxes(r, N, 120, 120)
    logits = r.randn(N, C + 1).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)

    # reference loop — with the maskrcnn-benchmark legacy (+1 IoU) NMS the
    # extraction driver actually imports (extract_features_vmb.py:18)
    def legacy_nms(b, s, thresh):
        order = np.argsort(-s, kind="stable")
        areas = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
        keep, alive = [], np.ones(len(s), bool)
        for i in order:
            if not alive[i]:
                continue
            keep.append(i)
            inter = (np.maximum(np.minimum(b[i, 2], b[:, 2])
                                - np.maximum(b[i, 0], b[:, 0]) + 1, 0)
                     * np.maximum(np.minimum(b[i, 3], b[:, 3])
                                  - np.maximum(b[i, 1], b[:, 1]) + 1, 0))
            alive &= inter / (areas[i] + areas - inter) <= thresh
        return np.asarray(keep)

    max_conf = np.zeros(N)
    for cls_ind in range(1, C + 1):
        cls_scores = probs[:, cls_ind]
        keep = legacy_nms(boxes, cls_scores, 0.5)
        sel = (cls_scores[keep] > max_conf[keep]) & (cls_scores[keep] > 0)
        max_conf[keep] = np.where(sel, cls_scores[keep], max_conf[keep])
    ref_order = np.argsort(-max_conf, kind="stable")[:10]

    order, conf, objects = select_top_by_class_nms(
        jnp.asarray(boxes), jnp.asarray(probs), num_keep=10, legacy=True)
    np.testing.assert_allclose(np.sort(np.asarray(conf))[::-1],
                               np.sort(max_conf[ref_order])[::-1], rtol=1e-5)
    # same set of confidences => same boxes chosen (order may tie-break)
    np.testing.assert_allclose(np.asarray(conf), max_conf[ref_order],
                               rtol=1e-5)


def test_x101_extractor_smoke():
    from clg_vqa_tpu.models.detector.extractor_x101 import (ExtractorX101,
                                                            X101Config,
                                                            init_x101_params)
    cfg = X101Config(num_boxes=10, pre_nms_topk=64, post_nms_topk_level=32,
                     post_nms_topk=64, pad_h=128, pad_w=128, short=96,
                     max_size=128)
    params = init_x101_params(jax.random.key(0))
    ex = ExtractorX101(params, cfg)
    img = (np.random.RandomState(3).rand(90, 110, 3) * 255).astype(np.uint8)
    rec = ex.extract(img, "x0")
    assert rec.features.shape == (10, 2048)
    assert rec.boxes.shape == (10, 4)
    assert np.isfinite(rec.features).all()


def test_detector_checkpoint_roundtrip():
    """init -> d2 state dict -> pytree roundtrip is exact, incl. BN folding
    path (running stats form) and the caffe2 renamer."""
    from clg_vqa_tpu.models.detector.extractor import init_extractor_params
    from clg_vqa_tpu.utils.convert_detector import (
        caffe2_to_detectron2_names, detectron2_c4_to_pytree,
        pytree_to_detectron2_c4)
    params = init_extractor_params(jax.random.key(0))
    sd = pytree_to_detectron2_c4(params)
    assert "backbone.res4.22.conv2.weight" in sd         # 23 blocks in res4
    back = detectron2_c4_to_pytree(sd)
    for (p1, l1), (p2, l2) in zip(
            sorted_leaves(params), sorted_leaves(back)):
        assert p1 == p2, (p1, p2)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    # unfolded-BN path: expand an affine into gamma/beta/mean/var and fold
    sd2 = dict(sd)
    s = sd2.pop("backbone.stem.conv1.norm.weight")
    b = sd2.pop("backbone.stem.conv1.norm.bias")
    var = np.abs(np.random.RandomState(0).rand(len(s))).astype(np.float32)
    mean = np.random.RandomState(1).randn(len(s)).astype(np.float32)
    eps = 1e-5
    sd2["backbone.stem.conv1.norm.weight"] = s * np.sqrt(var + eps)
    sd2["backbone.stem.conv1.norm.bias"] = b + mean * s
    sd2["backbone.stem.conv1.norm.running_mean"] = mean
    sd2["backbone.stem.conv1.norm.running_var"] = var
    back2 = detectron2_c4_to_pytree(sd2)
    np.testing.assert_allclose(
        np.asarray(back2["backbone"]["stem"]["bn1"]["scale"]), np.asarray(s),
        rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(back2["backbone"]["stem"]["bn1"]["bias"]), np.asarray(b),
        rtol=1e-4, atol=1e-5)

    # caffe2 renamer spot checks
    c2 = {"conv1_w": sd["backbone.stem.conv1.weight"],
          "res2_0_branch2a_w": sd["backbone.res2.0.conv1.weight"],
          "res5_2_branch2c_bn_s": np.ones(3, np.float32),
          "cls_score_w": sd["roi_heads.box_predictor.cls_score.weight"]}
    renamed = caffe2_to_detectron2_names(c2)
    assert "backbone.stem.conv1.weight" in renamed
    assert "backbone.res2.0.conv1.weight" in renamed
    assert "roi_heads.res5.2.conv3.norm.weight" in renamed
    assert "roi_heads.box_predictor.cls_score.weight" in renamed


def sorted_leaves(tree, path=()):
    if isinstance(tree, dict):
        out = []
        for k in sorted(tree):
            out += sorted_leaves(tree[k], path + (str(k),))
        return out
    if isinstance(tree, list):
        out = []
        for i, v in enumerate(tree):
            out += sorted_leaves(v, path + (str(i),))
        return out
    return [("/".join(path), tree)]


def test_given_box_extractor_smoke():
    from clg_vqa_tpu.models.detector.extractor import (ExtractorConfig,
                                                       GivenBoxExtractor,
                                                       init_extractor_params)
    cfg = ExtractorConfig(pad_h=128, pad_w=160, short=96, max_size=160)
    params = init_extractor_params(jax.random.key(0))
    ex = GivenBoxExtractor(params, cfg, max_boxes=4)
    img = (np.random.RandomState(1).rand(100, 140, 3) * 255).astype(np.uint8)
    boxes = np.asarray([[5, 5, 60, 60], [30, 20, 120, 90]], np.float32)
    rec = ex.extract(img, boxes, "gb0")
    assert rec.features.shape == (2, 2048)
    np.testing.assert_array_equal(rec.boxes, boxes)
    assert np.isfinite(rec.features).all()


def test_extractor_deterministic():
    """Same image twice -> identical features/boxes (no hidden RNG in the
    extraction pipeline)."""
    cfg = extractor.ExtractorConfig(num_boxes=5, pre_nms_topk=128,
                                    post_nms_topk=32, pad_h=128, pad_w=160,
                                    short=96, max_size=160)
    params = extractor.init_extractor_params(jax.random.key(2))
    ex = extractor.Extractor36(params, cfg)
    img = (np.random.RandomState(5).rand(90, 120, 3) * 255).astype(np.uint8)
    r1 = ex.extract(img, "a")
    r2 = ex.extract(img, "a")
    np.testing.assert_array_equal(r1.features, r2.features)
    np.testing.assert_array_equal(r1.boxes, r2.boxes)


def test_x101_extract_many_device_batch_matches():
    """device_batch=2 (vmapped pipeline) must produce the same records as
    the per-image path, including the padded final partial group (3 images
    through batch 2)."""
    from clg_vqa_tpu.models.detector.extractor_x101 import (ExtractorX101,
                                                            X101Config,
                                                            init_x101_params)
    cfg = X101Config(num_boxes=10, pre_nms_topk=64, post_nms_topk_level=32,
                     post_nms_topk=64, pad_h=128, pad_w=128, short=96,
                     max_size=128, bf16=False)
    params = init_x101_params(jax.random.key(0))
    ex = ExtractorX101(params, cfg)
    r = np.random.RandomState(7)
    items = [((r.rand(90, 110, 3) * 255).astype(np.uint8), f"i{k}")
             for k in range(3)]
    singles = list(ex.extract_many(iter(items), device_batch=1))
    batched = list(ex.extract_many(iter(items), device_batch=2))
    assert [b.image_id for b in batched] == [s.image_id for s in singles]
    for s, b in zip(singles, batched):
        # vmapped (bs=2) and single convs differ in the last ulp, which
        # can flip a near-tied NMS/top-k pick under RANDOM weights; demand
        # the vast majority of rois identical and exact agreement on them
        agree = np.all(np.isclose(b.boxes, s.boxes, rtol=1e-5, atol=1e-4),
                       axis=1)
        assert agree.mean() >= 0.8, agree
        # scale-aware atol: random-init activations reach ~1e8 here and
        # vmapped convs accumulate in a different order
        scale = float(np.abs(s.features).max()) or 1.0
        np.testing.assert_allclose(b.features[agree], s.features[agree],
                                   rtol=2e-3, atol=1e-5 * scale)
        np.testing.assert_array_equal(b.obj_id[agree], s.obj_id[agree])


def test_c4_extract_many_device_batch_matches():
    """Extractor36 device_batch=2 (vmapped pipeline) == per-image path,
    incl. the padded final partial group (3 images through batch 2)."""
    cfg = extractor.ExtractorConfig(num_boxes=6, pre_nms_topk=200,
                                    post_nms_topk=50, pad_h=128, pad_w=160,
                                    short=96, max_size=160)
    params = extractor.init_extractor_params(jax.random.key(0))
    ex = extractor.Extractor36(params, cfg)
    r = np.random.RandomState(11)
    items = [((r.rand(100, 140, 3) * 255).astype(np.uint8), f"c{k}")
             for k in range(3)]
    singles = list(ex.extract_many(iter(items), device_batch=1))
    batched = list(ex.extract_many(iter(items), device_batch=2))
    assert [b.image_id for b in batched] == [s.image_id for s in singles]
    for s, b in zip(singles, batched):
        # vmapped (bs=2) and single convs differ in the last ulp, which
        # can flip a near-tied NMS/top-k pick under RANDOM weights; demand
        # the vast majority of rois identical and exact agreement on them
        agree = np.all(np.isclose(b.boxes, s.boxes, rtol=1e-5, atol=1e-4),
                       axis=1)
        assert agree.mean() >= 0.8, agree
        # scale-aware atol: random-init activations reach ~1e8 here and
        # vmapped convs accumulate in a different order
        scale = float(np.abs(s.features).max()) or 1.0
        np.testing.assert_allclose(b.features[agree], s.features[agree],
                                   rtol=2e-3, atol=1e-5 * scale)
        np.testing.assert_array_equal(b.obj_id[agree], s.obj_id[agree])
        np.testing.assert_array_equal(b.attr_id, s.attr_id)
