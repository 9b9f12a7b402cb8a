"""X-101-FPN 100-box feature extractor (the M3P feature pipeline).

Mirrors mmf's extract_features_vmb.py driver over the
vqa-maskrcnn-benchmark detector with the released detectron_model.yaml
config: ResNeXt-101-**64x4d** backbone with **512-channel** FPN
(MODEL.RESNETS NUM_GROUPS=64 WIDTH_PER_GROUP=4, BACKBONE.OUT_CHANNELS=512),
channel-flipped input minus the (102.9801, 115.9465, 122.7717) mean (the
reference flips BGR->RGB *before* subtracting the BGR means — a quirk kept
as-is, extract_features_vmb.py:147-149), shortest-800/max-1333 resize,
multi-level RPN with **legacy caffe anchors + TO_REMOVE=1 box semantics**
(anchor_generator.py:183-232, box_coder.py:52-96, bounding_box.py:203-208,
csrc nms +1 IoU), RoIAlign 7x7 (sampling_ratio 2, unaligned) box head,
softmax over 1601 classes, per-class NMS(0.5) with shared proposal boxes,
top-100 by max kept confidence; features are the post-ReLU fc6
activations; boxes are the RAW RPN proposals divided by the image scale
(extract_features_vmb.py uses output['proposals'], NOT bbox_pred-refined
detections — the predictor's bbox_pred weights exist in the checkpoint
but are dead on this path; they are kept in the pytree only so released
checkpoints load key-complete).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ...data.features import RegionRecord
from ...ops.nms import batched_nms_fixpoint
from . import fpn as F
from . import resnet, rpn
from .extractor import PipelinedExtractor


@dataclasses.dataclass
class X101Config:
    num_boxes: int = 100
    pre_nms_topk: int = 1000       # per level
    post_nms_topk_level: int = 1000
    post_nms_topk: int = 1000
    rpn_nms_thresh: float = 0.7
    pad_h: int = 800
    pad_w: int = 1344
    short: int = 800
    max_size: int = 1333
    num_classes: int = 1600
    bf16: bool = True
    # detectron_model.yaml: RESNETS.NUM_GROUPS 64 / WIDTH_PER_GROUP 4,
    # BACKBONE.OUT_CHANNELS 512 — the released checkpoint's shapes
    groups: int = 64
    width_per_group: int = 4
    fpn_channels: int = 512
    # RoIAlign box-chunk (ops/roi.roi_align_flat): bounds the fp32
    # corner-product live set — the round-4 "db=24 compile OOM" was four
    # [512,1000,7,7]-per-image fp32 buffers from this op (1.87 GB each at
    # db=20). Bit-identical results at any value. None (default) is the
    # fastest at the recommended device_batch<=16 (chunking costs ~1.7%
    # same-day); set 256 to compile device_batch>=20 (measured: db 20/24/32
    # all fit, but img/s stays flat past 16 — the backbone conv MFU is the
    # bound, docs/PERFORMANCE.md round-5 X101 entry).
    roi_box_chunk: int | None = None


def init_x101_params(rng, cfg: X101Config | None = None) -> dict:
    cfg = cfg or X101Config()
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)

    def lin(rng, i, o, std=0.01):
        return {"w": jax.random.normal(rng, (i, o), jnp.float32) * std,
                "b": jnp.zeros((o,), jnp.float32)}

    ch = cfg.fpn_channels
    return {
        "backbone": resnet.init_backbone_x(
            k1, depth=101, groups=cfg.groups,
            width_per_group=cfg.width_per_group),
        "fpn": F.init_fpn(k2, out_channels=ch),
        "rpn": rpn.init_rpn(k3, in_channels=ch, hid_channels=ch,
                            num_anchors=3),
        "box_head": F.init_box_head_fc(k4, in_dim=ch * 7 * 7, rep_dim=2048),
        "predictor": {
            "cls_score": lin(k5, 2048, 1601),
            # dead on the extraction path (raw proposals are exported) but
            # present in released checkpoints — kept so loads are
            # key-complete, never applied
            "bbox_pred": lin(jax.random.fold_in(k5, 1), 2048, 1601 * 4,
                             0.001),
        },
    }


class ExtractorX101(PipelinedExtractor):
    def __init__(self, params: dict, cfg: X101Config | None = None):
        self.params = params
        self.cfg = cfg or X101Config()
        c = self.cfg
        self._strides = [4, 8, 16, 32, 64]
        self._sizes = [32, 64, 128, 256, 512]
        self._anchors = []
        for stride, size in zip(self._strides, self._sizes):
            fh, fw = -(-c.pad_h // stride), -(-c.pad_w // stride)
            self._anchors.append(jnp.asarray(rpn.generate_anchors_caffe(
                fh, fw, stride=stride, sizes=(size,))))
        self._jitted = jax.jit(self._pipeline)
        # device-batched variant: the pipeline is pure per-image, so vmap
        # batches the whole thing — the backbone convs become real batched
        # convs (better MXU utilization than bs=1), the fixpoint NMS /
        # top-k / RoIAlign stages vectorize over the leading axis
        self._jitted_batch = jax.jit(jax.vmap(self._pipeline,
                                              in_axes=(None, 0, 0)))
        import threading
        self._pre_cache = {}
        self._pre_lock = threading.Lock()

    def _propose(self, params, pyr, valid_hw):
        """RPN proposal stage over the FPN pyramid, mirroring the
        reference's RPNPostProcessor inference path
        (modeling/rpn/inference.py:73-175): per-level pre-NMS top-k +
        legacy decode/clip, then ONE batched fixpoint NMS over all 5
        levels (exact per-level greedy, no sequential recurrences) and a
        merged fpn_post_nms top-k. Returns (proposals [post, 4],
        scores [post] logits, valid [post]). Tested composed against the
        reference's own RPNPostProcessor
        (tests/test_x101_composed_backbone_parity.py)."""
        c = self.cfg
        cand_boxes, cand_scores = [], []
        for lvl, (feat, anchors, stride) in enumerate(
                zip(pyr, self._anchors, self._strides)):
            obj, deltas = rpn.rpn_head(
                feat.astype(jnp.float32), params["rpn"])
            obj, deltas = obj[0], deltas[0]
            vh = -(-valid_hw[0] // stride)
            vw = -(-valid_hw[1] // stride)
            cy = jnp.arange(obj.shape[0])[:, None, None]
            cx = jnp.arange(obj.shape[1])[None, :, None]
            vmask = jnp.broadcast_to((cy < vh) & (cx < vw),
                                     obj.shape).reshape(-1)
            logits = jnp.where(vmask, obj.reshape(-1), -jnp.inf)
            k = min(c.pre_nms_topk, logits.shape[0])
            top_s, top_i = jax.lax.top_k(logits, k)
            if k < c.pre_nms_topk:
                top_s = jnp.pad(top_s, (0, c.pre_nms_topk - k),
                                constant_values=-jnp.inf)
                top_i = jnp.pad(top_i, (0, c.pre_nms_topk - k))
            b = rpn.decode_boxes_legacy(anchors[top_i],
                                        deltas.reshape(-1, 4)[top_i])
            cand_boxes.append(
                rpn.clip_boxes_legacy(b, valid_hw[0], valid_hw[1]))
            cand_scores.append(top_s)
        lvl_boxes = jnp.stack(cand_boxes)               # [5, K, 4]
        lvl_scores = jnp.stack(cand_scores)             # [5, K]
        keep = batched_nms_fixpoint(
            lvl_boxes, lvl_scores, c.rpn_nms_thresh,
            valid=jnp.isfinite(lvl_scores), class_chunk=8, legacy=True)
        merged = jnp.where(keep, lvl_scores, -jnp.inf).reshape(-1)
        top_s, top_i = jax.lax.top_k(merged, c.post_nms_topk)
        proposals = lvl_boxes.reshape(-1, 4)[top_i]
        pvalid = jnp.isfinite(top_s)
        return proposals, top_s, pvalid

    def _pipeline(self, params, image, valid_hw):
        c = self.cfg
        if c.bf16:
            bb = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                              if x.dtype == jnp.float32 else x,
                              {"backbone": params["backbone"],
                               "fpn": params["fpn"]})
            params = {**params, **bb}
            image = image.astype(jnp.bfloat16)
        # STRIDE_IN_1X1 False (detectron_model.yaml: "default True for
        # MSRA; False for C2 or Torch models") — stride lives in the 3x3
        stages = resnet.backbone_stages(image[None], params["backbone"],
                                        groups=c.groups, caffe_pool=False,
                                        stride_in_1x1=False)
        pyr = F.fpn(stages, params["fpn"])

        proposals, top_s, pvalid = self._propose(params, pyr, valid_hw)

        # single flattened-pyramid RoIAlign pass (each box samples only its
        # assigned level) on the bf16 pyramid, fp32 accumulation; fc6/fc7 as
        # bf16 matmuls with fp32 accumulation when bf16 is on
        crops = F.multilevel_roi_align_flat(pyr, proposals,
                                            legacy_levels=True,
                                            box_chunk=c.roi_box_chunk)
        fc6, fc7 = F.box_head_fc(
            crops, params["box_head"],
            compute_dtype=jnp.bfloat16 if c.bf16 else None)
        cls_logits = fc7 @ params["predictor"]["cls_score"]["w"] \
            + params["predictor"]["cls_score"]["b"]
        probs = jax.nn.softmax(cls_logits, axis=-1)
        order, max_conf, objects = F.select_top_by_class_nms(
            proposals, probs, num_keep=c.num_boxes, valid=pvalid,
            legacy=True)
        return {
            "features": fc6[order],
            "boxes": proposals[order],
            "obj_id": objects,
            "obj_conf": max_conf,
            "num_valid": jnp.sum(max_conf > 0),
        }

    def _preprocess_prog(self, rh: int, rw: int, dtype):
        """ONE jitted program per raw shape (same rationale as
        Extractor36._preprocess_prog: the eager chain paid ~5 remote
        dispatches per image and compiled per shape anyway)."""
        from .extractor import PIXEL_MEAN_BGR, resize_shortest_edge

        def build():
            c = self.cfg
            nh, nw = resize_shortest_edge(rh, rw, c.short, c.max_size)

            def f(raw):
                # BGR->RGB flip BEFORE subtracting the BGR means, then
                # resize — the reference's quirk order
                img = raw[:, :, ::-1].astype(jnp.float32)
                img = img - jnp.asarray(PIXEL_MEAN_BGR, jnp.float32)
                img = jax.image.resize(img, (nh, nw, 3), method="linear")
                pad = jnp.zeros((c.pad_h, c.pad_w, 3), jnp.float32)
                return pad.at[:nh, :nw].set(img[:c.pad_h, :c.pad_w])

            return jax.jit(f), (nh, nw)

        return self._cached_program((rh, rw, np.dtype(dtype).str), build)
        return cache[key]

    def preprocess(self, raw_bgr: np.ndarray):
        rh, rw = raw_bgr.shape[:2]
        prog, (nh, nw) = self._preprocess_prog(rh, rw, raw_bgr.dtype)
        img = prog(jnp.asarray(np.ascontiguousarray(raw_bgr)))
        return img, (nh, nw), (rh, rw)

    def _finish(self, image_id, out, nh, nw, rh, rw) -> RegionRecord:
        out = jax.device_get(out)
        boxes = np.asarray(out["boxes"], np.float32) / (nh / rh)
        return RegionRecord(
            image_id=image_id,
            features=np.asarray(out["features"], np.float32),
            boxes=boxes, img_w=float(rw), img_h=float(rh),
            obj_id=out["obj_id"], obj_conf=out["obj_conf"])

    def extract(self, raw_bgr: np.ndarray, image_id: str) -> RegionRecord:
        img, (nh, nw), (rh, rw) = self.preprocess(raw_bgr)
        out = self._jitted(self.params, img, jnp.asarray((nh, nw), jnp.int32))
        return self._finish(image_id, out, nh, nw, rh, rw)
    # extract_many / _finish_group: inherited from PipelinedExtractor
    # (the reference driver runs bs=1 synchronously,
    # extract_features_vmb.py:229-244)
