"""Composed-detector golden parity (VERDICT r1 #9): the FULL reference 36-box
pipeline — detectron2-fork GeneralizedRCNN (VG R-C4 + attr head) with random
weights, backbone -> RPN -> RoIPool+res5 -> predictors -> exact-36 NMS sweep
(features_extraction/detectron2_proposal_maxnms.py:74-137) — against our
Extractor36, box-for-box.

The reference model is built in-process at DEPTH=50 via tests/d2_compat.py
shims (fvcore/torchvision/_C are absent here); the image is fed pre-sized
(raw == network input, a stride multiple) so both sides see the identical
tensor and no resize interpolation enters the comparison.
"""
import os
import sys

import numpy as np
import pytest

D2_ROOT = "/root/reference/features_extraction/py-bottom-up-attention"
VG_YAML = os.path.join(
    D2_ROOT, "configs/VG-Detection/faster_rcnn_R_101_C4_attr_caffemaxpool.yaml")

pytestmark = pytest.mark.skipif(not os.path.isdir(D2_ROOT),
                                reason="reference not mounted")

H, W = 160, 256          # stride-16 multiples: zero padding on our side


@pytest.fixture(scope="module")
def reference_run():
    sys.path.insert(0, os.path.dirname(__file__))
    import d2_compat
    d2_compat.install()
    import torch
    from detectron2.config import get_cfg
    from detectron2.modeling import build_model
    from detectron2.layers import FrozenBatchNorm2d
    from detectron2.modeling.roi_heads.fast_rcnn import FastRCNNOutputs
    from detectron2.modeling.postprocessing import detector_postprocess
    from detectron2.structures import Boxes, Instances

    torch.manual_seed(3)
    cfg = get_cfg()
    cfg.merge_from_file(VG_YAML)
    cfg.MODEL.DEVICE = "cpu"
    cfg.MODEL.RESNETS.DEPTH = 50
    model = build_model(cfg)
    model.eval()
    # randomize the frozen-BN buffers too — all-default BN (scale 1, mean 0)
    # would under-test the converter's folding
    g = torch.Generator().manual_seed(17)
    for m in model.modules():
        if isinstance(m, FrozenBatchNorm2d):
            m.weight.copy_(1 + 0.2 * torch.randn(m.weight.shape, generator=g))
            m.bias.copy_(0.1 * torch.randn(m.bias.shape, generator=g))
            m.running_mean.copy_(
                0.1 * torch.randn(m.running_mean.shape, generator=g))
            m.running_var.copy_(
                (1 + 0.3 * torch.rand(m.running_var.shape, generator=g)))

    rimg = np.random.RandomState(5).randint(0, 255, (H, W, 3), np.uint8)

    # Random-init activations explode through the deep stack (res4 std ~900),
    # so raw head outputs saturate the box-delta clamp (log(1000/16)) and
    # every decoded box collapses to the full image. Rescale the head weights
    # adaptively so deltas/logits land in a realistic range — BEFORE the
    # state_dict export, so both pipelines share the exact same weights.
    with torch.no_grad():
        image = torch.as_tensor(rimg.astype("float32").transpose(2, 0, 1))
        images = model.preprocess_image([{"image": image,
                                          "height": H, "width": W}])
        feat = model.backbone(images.tensor)
        rh = model.proposal_generator.rpn_head
        hidden = torch.nn.functional.relu(rh.conv(feat["res4"]))
        dstd = rh.anchor_deltas(hidden).std().item()
        rh.anchor_deltas.weight *= 0.25 / dstd
        rh.anchor_deltas.bias.zero_()
        ostd = rh.objectness_logits(hidden).std().item()
        rh.objectness_logits.weight *= 3.0 / ostd

        proposals, _ = model.proposal_generator(images, feat, None)
        bf = model.roi_heads._shared_roi_transform(
            [feat[f] for f in model.roi_heads.in_features],
            [proposals[0].proposal_boxes])
        pooled = bf.mean(dim=[2, 3])
        bp = model.roi_heads.box_predictor
        cls_std = bp.cls_score(pooled).std().item()
        bp.cls_score.weight *= 2.5 / cls_std
        dstd2 = bp.bbox_pred(pooled).std().item()
        bp.bbox_pred.weight *= 0.25 / dstd2
        bp.bbox_pred.bias.zero_()
        _, attr_logits_probe, _ = bp(pooled)
        bp.attr_score.weight *= 2.5 / attr_logits_probe.std().item()

    # ---- replicate detectron2_proposal_maxnms.doit (74-137), transform
    # skipped because raw == network input ----
    with torch.no_grad():
        image = torch.as_tensor(
            rimg.astype("float32").transpose(2, 0, 1))
        inputs = [{"image": image, "height": H, "width": W}]
        images = model.preprocess_image(inputs)
        features = model.backbone(images.tensor)
        proposals, _ = model.proposal_generator(images, features, None)
        proposal_boxes = [x.proposal_boxes for x in proposals]
        feats = [features[f] for f in model.roi_heads.in_features]
        box_features = model.roi_heads._shared_roi_transform(
            feats, proposal_boxes)
        feature_pooled = box_features.mean(dim=[2, 3])
        (pred_class_logits, pred_attr_logits,
         pred_proposal_deltas) = model.roi_heads.box_predictor(feature_pooled)
        outputs = FastRCNNOutputs(
            model.roi_heads.box2box_transform, pred_class_logits,
            pred_proposal_deltas, proposals, model.roi_heads.smooth_l1_beta)
        probs = outputs.predict_probs()[0]
        boxes = outputs.predict_boxes()[0]
        attr_prob = pred_attr_logits[..., :-1].softmax(-1)
        max_attr_prob, max_attr_label = attr_prob.max(-1)

        # fast_rcnn_inference_single_image (43-71) + the 0.5->0.9 sweep
        # (126-132), without the .cuda() placement
        def sweep_once(nms_thresh):
            s = probs[:, :-1]
            num_reg = boxes.shape[1] // 4
            bb = Boxes(boxes.reshape(-1, 4))
            bb.clip((H, W))
            bb = bb.tensor.view(-1, num_reg, 4)
            max_scores, max_classes = s.max(1)
            n = bb.size(0)
            flat = bb.view(-1, 4)
            idxs = torch.arange(n) * num_reg + max_classes
            max_boxes = flat[idxs]
            keep = d2_compat.tv_nms(max_boxes, max_scores, nms_thresh)
            keep = keep[:36]
            res = Instances((H, W))
            res.pred_boxes = Boxes(max_boxes[keep])
            res.scores = max_scores[keep]
            res.pred_classes = max_classes[keep]
            return res, keep

        for nms_thresh in np.arange(0.5, 1.0, 0.1):
            instances, ids = sweep_once(nms_thresh)
            if len(ids) == 36:
                break
        instances = detector_postprocess(instances, H, W)

    ref = {
        "n_proposals": len(proposals[0]),
        "nms_thresh": float(nms_thresh),
        "boxes": instances.pred_boxes.tensor.numpy(),
        "scores": instances.scores.numpy(),
        "classes": instances.pred_classes.numpy(),
        "features": feature_pooled[ids].numpy(),
        "attr_conf": max_attr_prob[ids].numpy(),
        "attr_id": max_attr_label[ids].numpy(),
    }
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    rpn_cfg = {
        "pre_nms": cfg.MODEL.RPN.PRE_NMS_TOPK_TEST,
        "post_nms": cfg.MODEL.RPN.POST_NMS_TOPK_TEST,
        "nms_thresh": cfg.MODEL.RPN.NMS_THRESH,
    }
    del model
    return rimg, sd, ref, rpn_cfg


def test_extractor36_composed_parity(reference_run):
    rimg, sd, ref, rpn_cfg = reference_run
    from clg_vqa_tpu.models.detector.extractor import (Extractor36,
                                                       ExtractorConfig)
    from clg_vqa_tpu.utils.convert_detector import detectron2_c4_to_pytree

    params = detectron2_c4_to_pytree(sd, depth=50)
    cfg = ExtractorConfig(
        num_boxes=36, bf16=False, use_pallas_roi=False,
        pad_h=H, pad_w=W, short=min(H, W), max_size=max(H, W),
        pre_nms_topk=rpn_cfg["pre_nms"], post_nms_topk=rpn_cfg["post_nms"],
        rpn_nms_thresh=rpn_cfg["nms_thresh"])
    ex = Extractor36(params, cfg)
    rec = ex.extract(rimg, "img0")

    assert rec.features.shape == (36, 2048)
    assert ref["features"].shape[0] == 36, (
        f"reference sweep kept {ref['features'].shape[0]}")

    np.testing.assert_allclose(rec.boxes, ref["boxes"], rtol=1e-3, atol=0.05)
    np.testing.assert_array_equal(rec.obj_id, ref["classes"])
    np.testing.assert_allclose(rec.obj_conf, ref["scores"],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(rec.features, ref["features"],
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(rec.attr_id, ref["attr_id"])
    np.testing.assert_allclose(rec.attr_conf, ref["attr_conf"],
                               rtol=1e-3, atol=1e-4)
