"""Parity of the X-101 legacy box primitives against the REFERENCE's own
pure-python modules (vqa-maskrcnn-benchmark anchor_generator.py /
box_coder.py, loaded by path with the package stubbed out).

The released detectron_model.pth was trained against these caffe-legacy
semantics (rounded anchors, TO_REMOVE=1 widths); the detectron2-style
continuous variants differ by 1-2.5 px per anchor.
"""
import importlib.util
import math
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_MRB = ("/root/reference/features_extraction/mmf/github/"
        "vqa-maskrcnn-benchmark/maskrcnn_benchmark")


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _ref_anchor_module():
    bb = _load(f"{_MRB}/structures/bounding_box.py", "mrb_bounding_box")
    pkg = types.ModuleType("maskrcnn_benchmark")
    structures = types.ModuleType("maskrcnn_benchmark.structures")
    sys.modules.setdefault("maskrcnn_benchmark", pkg)
    sys.modules.setdefault("maskrcnn_benchmark.structures", structures)
    sys.modules["maskrcnn_benchmark.structures.bounding_box"] = bb
    return _load(f"{_MRB}/modeling/rpn/anchor_generator.py",
                 "mrb_anchor_generator")


def test_caffe_cell_anchors_match_reference(monkeypatch):
    from clg_vqa_tpu.models.detector import rpn
    # the 2019-era reference uses the np.float alias removed in numpy>=1.24
    monkeypatch.setattr(np, "float", float, raising=False)
    ref = _ref_anchor_module()
    for stride, size in zip((4, 8, 16, 32, 64), (32, 64, 128, 256, 512)):
        ref_cell = ref.generate_anchors(
            stride=stride, sizes=(size,),
            aspect_ratios=(0.5, 1.0, 2.0)).numpy()
        ours = np.asarray(rpn.generate_anchors_caffe(
            2, 3, stride=stride, sizes=(size,)))
        # our grid is cell + shifts at stride*i; position (0,0) IS the cell
        np.testing.assert_allclose(ours[:3], ref_cell, atol=1e-4)
        # shift structure: position (y=1, x=2) offsets by (stride*2, stride)
        np.testing.assert_allclose(
            ours[(1 * 3 + 2) * 3:(1 * 3 + 2) * 3 + 3],
            ref_cell + np.asarray([2 * stride, stride] * 2), atol=1e-4)


def test_legacy_box_decode_matches_reference_boxcoder():
    from clg_vqa_tpu.models.detector import rpn
    bc = _load(f"{_MRB}/modeling/box_coder.py", "mrb_box_coder")
    r = np.random.RandomState(0)
    anchors = np.stack([r.rand(64) * 100, r.rand(64) * 100,
                        100 + r.rand(64) * 100, 100 + r.rand(64) * 100],
                       1).astype(np.float32)
    deltas = (r.randn(64, 4) * 0.5).astype(np.float32)
    coder = bc.BoxCoder(weights=(1.0, 1.0, 1.0, 1.0),
                        bbox_xform_clip=math.log(1000.0 / 16))
    want = coder.decode(torch.from_numpy(deltas),
                        torch.from_numpy(anchors)).numpy().reshape(64, 4)
    got = np.asarray(rpn.decode_boxes_legacy(anchors, deltas))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_legacy_clip_and_iou_conventions():
    import jax.numpy as jnp
    from clg_vqa_tpu.models.detector import rpn
    from clg_vqa_tpu.ops.nms import iou_matrix
    b = jnp.asarray([[-5.0, -5.0, 150.0, 90.0]])
    np.testing.assert_allclose(
        np.asarray(rpn.clip_boxes_legacy(b, 80, 100))[0],
        [0, 0, 99, 79])                       # clamp to size-1
    # +1 IoU: two 10x10 (legacy 11x11) boxes offset by 5 px
    boxes = jnp.asarray([[0.0, 0, 10, 10], [5.0, 0, 15, 10]])
    got = float(iou_matrix(boxes, legacy=True)[0, 1])
    inter, union = 6 * 11, 2 * 11 * 11 - 6 * 11
    assert abs(got - inter / union) < 1e-6
    cont = float(iou_matrix(boxes)[0, 1])
    assert abs(cont - 50 / 150) < 1e-6
