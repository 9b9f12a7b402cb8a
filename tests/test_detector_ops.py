"""NMS / RoIAlign / RoIPool vs independent numpy oracles implementing the
documented torchvision/detectron2 algorithms (torchvision itself is not
installed here; the oracles below follow the published kernel semantics the
reference's CUDA code implements)."""
import numpy as np
import pytest

import jax.numpy as jnp

from clg_vqa_tpu.ops.nms import batched_nms, iou_matrix, nms
from clg_vqa_tpu.ops.roi import roi_align, roi_pool


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

def np_iou(a, b):
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / union, 0.0)


def np_nms(boxes, scores, thresh):
    order = np.argsort(-scores, kind="stable")
    keep = []
    iou = np_iou(boxes, boxes)
    sup = np.zeros(len(boxes), bool)
    for i in order:
        if sup[i]:
            continue
        keep.append(i)
        sup |= iou[i] > thresh
        sup[i] = True
    return np.array(keep)


def np_roi_align(feat, rois, out, scale, sr, aligned):
    C, H, W = feat.shape
    PH, PW = out
    R = len(rois)
    res = np.zeros((R, C, PH, PW), np.float32)
    off = 0.5 if aligned else 0.0
    for r in range(R):
        x1, y1, x2, y2 = rois[r] * scale - off
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bh, bw = rh / PH, rw / PW
        for ph in range(PH):
            for pw_ in range(PW):
                acc = np.zeros(C)
                for iy in range(sr):
                    for ix in range(sr):
                        y = y1 + (ph + (iy + 0.5) / sr) * bh
                        x = x1 + (pw_ + (ix + 0.5) / sr) * bw
                        if y < -1.0 or y > H or x < -1.0 or x > W:
                            continue
                        y_, x_ = min(max(y, 0), H - 1), min(max(x, 0), W - 1)
                        y0, x0 = int(np.floor(y_)), int(np.floor(x_))
                        y1_, x1_ = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
                        ly, lx = y_ - y0, x_ - x0
                        acc += (feat[:, y0, x0] * (1 - ly) * (1 - lx)
                                + feat[:, y0, x1_] * (1 - ly) * lx
                                + feat[:, y1_, x0] * ly * (1 - lx)
                                + feat[:, y1_, x1_] * ly * lx)
                res[r, :, ph, pw_] = acc / (sr * sr)
    return res


def np_roi_pool(feat, rois, out, scale):
    C, H, W = feat.shape
    PH, PW = out
    R = len(rois)
    res = np.zeros((R, C, PH, PW), np.float32)
    for r in range(R):
        # quantize in f32, like the reference CUDA kernel (and our op)
        q = np.round(rois[r].astype(np.float32) * np.float32(scale))
        x1, y1, x2, y2 = (int(v) for v in q)
        rh, rw = max(y2 - y1 + 1, 1), max(x2 - x1 + 1, 1)
        for ph in range(PH):
            for pw_ in range(PW):
                # exact integer bin boundaries (float64 ceil((p+1)*rh/PH)
                # overshoots when the boundary is an exact integer, e.g.
                # 14*(29/14) -> 29.000000000000004)
                hs = min(max((ph * rh) // PH + y1, 0), H)
                he = min(max(-((-(ph + 1) * rh) // PH) + y1, 0), H)
                ws = min(max((pw_ * rw) // PW + x1, 0), W)
                we = min(max(-((-(pw_ + 1) * rw) // PW) + x1, 0), W)
                if he > hs and we > ws:
                    res[r, :, ph, pw_] = feat[:, hs:he, ws:we].max((1, 2))
    return res


def rand_boxes(r, n, H, W):
    x1 = r.rand(n) * (W - 10)
    y1 = r.rand(n) * (H - 10)
    return np.stack([x1, y1, x1 + 1 + r.rand(n) * (W - x1 - 1),
                     y1 + 1 + r.rand(n) * (H - y1 - 1)], 1).astype(np.float32)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_iou_matrix():
    r = np.random.RandomState(0)
    b = rand_boxes(r, 40, 100, 100)
    np.testing.assert_allclose(np.asarray(iou_matrix(jnp.asarray(b))),
                               np_iou(b, b), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
def test_nms_matches_oracle(thresh):
    r = np.random.RandomState(1)
    b = rand_boxes(r, 60, 120, 120)
    s = r.rand(60).astype(np.float32)
    idx, keep = nms(jnp.asarray(b), jnp.asarray(s), thresh)
    ours = np.asarray(idx)[np.asarray(keep)]
    ref = np_nms(b, s, thresh)
    np.testing.assert_array_equal(ours, ref)


def test_nms_max_outputs_and_valid():
    r = np.random.RandomState(2)
    b = rand_boxes(r, 30, 80, 80)
    s = r.rand(30).astype(np.float32)
    valid = (np.arange(30) % 3 != 0)
    idx, keep = nms(jnp.asarray(b), jnp.asarray(s), 0.5, max_outputs=5,
                    valid=jnp.asarray(valid))
    ref = np_nms(b[valid], s[valid], 0.5)
    # map oracle (computed on the filtered set) back to original indices
    ref_orig = np.where(valid)[0][ref][:5]
    np.testing.assert_array_equal(np.asarray(idx)[np.asarray(keep)],
                                  ref_orig[:int(np.asarray(keep).sum())])
    assert np.asarray(keep).sum() <= 5


def test_batched_nms():
    r = np.random.RandomState(3)
    C, N = 5, 40
    b = rand_boxes(r, N, 100, 100)
    s = r.rand(C, N).astype(np.float32)
    idx, keep = batched_nms(jnp.asarray(b), jnp.asarray(s), 0.5)
    for c in range(C):
        ref = np_nms(b, s[c], 0.5)
        ours = np.asarray(idx[c])[np.asarray(keep[c])]
        np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("aligned,sr", [(True, 2), (False, 2), (True, 1)])
def test_roi_align_matches_oracle(aligned, sr):
    r = np.random.RandomState(4)
    C, H, W = 3, 20, 24
    feat = r.randn(C, H, W).astype(np.float32)
    rois = rand_boxes(r, 7, H * 4, W * 4)
    ours = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                output_size=(5, 5), spatial_scale=0.25,
                                sampling_ratio=sr, aligned=aligned))
    ref = np_roi_align(feat, rois, (5, 5), 0.25, sr, aligned)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_roi_pool_matches_oracle():
    r = np.random.RandomState(5)
    C, H, W = 3, 18, 22
    feat = r.randn(C, H, W).astype(np.float32)
    rois = rand_boxes(r, 6, H * 8, W * 8)
    ours = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois),
                               output_size=(7, 7), spatial_scale=0.125,
                               max_bin=8))
    ref = np_roi_pool(feat, rois, (7, 7), 0.125)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_roi_pool_14x14_c4_shape():
    """The C4 head's configuration: 14x14 pool at stride 16."""
    r = np.random.RandomState(6)
    feat = r.randn(8, 50, 84).astype(np.float32)
    rois = rand_boxes(r, 300, 800, 1333)
    out = roi_pool(jnp.asarray(feat), jnp.asarray(rois),
                   output_size=(14, 14), spatial_scale=1 / 16, max_bin=8)
    assert out.shape == (300, 8, 14, 14)
    ref = np_roi_pool(feat, rois, (14, 14), 1 / 16)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_roi_pool_pallas_matches_xla():
    """Pallas RoIPool (interpret mode) == the XLA op == the oracle."""
    from jax.experimental.pallas import tpu as pltpu
    from clg_vqa_tpu.ops.roi_pallas import roi_pool_pallas
    r = np.random.RandomState(11)
    C, H, W = 128, 20, 24
    feat = r.randn(H, W, C).astype(np.float32)
    rois = rand_boxes(r, 9, H * 8, W * 8)
    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(roi_pool_pallas(
            jnp.asarray(feat), jnp.asarray(rois), output_size=(7, 7),
            spatial_scale=0.125, max_bin=8))
    ref = np.asarray(roi_pool(
        jnp.asarray(feat.transpose(2, 0, 1)), jnp.asarray(rois),
        output_size=(7, 7), spatial_scale=0.125, max_bin=8))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                               rtol=1e-6, atol=1e-6)


def test_batched_nms_fixpoint_matches_oracle():
    """Parallel fixpoint per-class NMS == sequential greedy oracle, including
    dense-overlap cases that exercise long suppression chains."""
    from clg_vqa_tpu.ops.nms import batched_nms_fixpoint
    r = np.random.RandomState(13)
    for trial, (C, N, spread) in enumerate([(7, 50, 120), (3, 80, 30)]):
        b = rand_boxes(r, N, spread, spread)   # small spread => many overlaps
        s = r.rand(C, N).astype(np.float32)
        keep = np.asarray(batched_nms_fixpoint(
            jnp.asarray(b), jnp.asarray(s), 0.5, class_chunk=4))
        for c in range(C):
            ref = np_nms(b, s[c], 0.5)
            ours = np.where(keep[c])[0]
            np.testing.assert_array_equal(np.sort(ours), np.sort(ref),
                                          err_msg=f"trial{trial} class{c}")


def test_batched_nms_fixpoint_valid_mask():
    from clg_vqa_tpu.ops.nms import batched_nms_fixpoint
    r = np.random.RandomState(14)
    N, C = 30, 4
    b = rand_boxes(r, N, 60, 60)
    s = r.rand(C, N).astype(np.float32)
    valid = (np.arange(N) % 4 != 0)
    keep = np.asarray(batched_nms_fixpoint(
        jnp.asarray(b), jnp.asarray(s), 0.5, valid=jnp.asarray(valid),
        class_chunk=2))
    assert not keep[:, ~valid].any()
    for c in range(C):
        ref = np_nms(b[valid], s[c][valid], 0.5)
        ref_orig = np.where(valid)[0][ref]
        np.testing.assert_array_equal(np.sort(np.where(keep[c])[0]),
                                      np.sort(ref_orig))


def test_batched_nms_fixpoint_per_class_boxes():
    from clg_vqa_tpu.ops.nms import batched_nms_fixpoint
    r = np.random.RandomState(15)
    C, N = 5, 40
    boxes = np.stack([rand_boxes(r, N, 80, 80) for _ in range(C)])
    s = r.rand(C, N).astype(np.float32)
    keep = np.asarray(batched_nms_fixpoint(
        jnp.asarray(boxes), jnp.asarray(s), 0.5, class_chunk=2))
    for c in range(C):
        ref = np_nms(boxes[c], s[c], 0.5)
        np.testing.assert_array_equal(np.sort(np.where(keep[c])[0]),
                                      np.sort(ref))


def test_multilevel_roi_align_flat_matches_per_level():
    """The flattened-pyramid single-pass RoIAlign (ops/roi.py:roi_align_flat)
    must reproduce the align-on-every-level-then-select formulation exactly
    in fp32 (each box gathers only its assigned level)."""
    from clg_vqa_tpu.models.detector import fpn as F
    r = np.random.RandomState(7)
    pyr = [jnp.asarray(r.randn(1, 96 // (2 ** i), 160 // (2 ** i), 32),
                       jnp.float32) for i in range(5)]
    # box sizes spanning all 4 assignment levels (stride-4 image 384x640)
    sizes = np.concatenate([r.rand(16) * 60 + 10, r.rand(16) * 150 + 80,
                            r.rand(16) * 250 + 200, r.rand(16) * 300 + 400])
    cx = r.rand(64) * 500 + 50
    cy = r.rand(64) * 300 + 40
    boxes = jnp.asarray(np.stack([cx - sizes / 2, cy - sizes / 2,
                                  cx + sizes / 2, cy + sizes / 2], 1),
                        jnp.float32)
    a = np.asarray(F.multilevel_roi_align(pyr, boxes))
    b = np.asarray(F.multilevel_roi_align_flat(pyr, boxes))
    lvls = np.asarray(F.assign_levels(boxes))
    assert len(np.unique(lvls)) >= 3, "test should span several levels"
    np.testing.assert_array_equal(a, b)

    # box_chunk (sequential lax.map chunks — the X101 HBM-ceiling knob,
    # ops/roi.py) is BIT-identical at every chunking, incl. a non-divisor
    # request (falls back to the largest divisor <= box_chunk)
    for chunk in (16, 24, 64):
        c = np.asarray(F.multilevel_roi_align_flat(pyr, boxes,
                                                   box_chunk=chunk))
        np.testing.assert_array_equal(b, c)


def test_fixpoint_nms_close_scores_exact_priority():
    """Sub-1e-4 score gaps must not invert greedy priority (the old
    epsilon tie-break suppressed the HIGHER-scoring of two overlapping
    boxes when the lower-scoring one had a much smaller index)."""
    import jax.numpy as jnp
    import numpy as np
    from clg_vqa_tpu.ops.nms import batched_nms_fixpoint, nms
    n = 1000
    r = np.random.RandomState(3)
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = r.rand(n) * 100
    boxes[:, 1] = r.rand(n) * 100
    boxes[:, 2] = boxes[:, 0] + 10
    boxes[:, 3] = boxes[:, 1] + 10
    # two heavily overlapping boxes, low-index one scores SLIGHTLY lower
    boxes[900] = boxes[0] + np.asarray([1, 1, 1, 1], np.float32)
    scores = r.rand(n).astype(np.float32) * 0.5
    scores[0] = 0.51000
    scores[900] = 0.51005
    keep = np.asarray(batched_nms_fixpoint(
        jnp.asarray(boxes), jnp.asarray(scores)[None], 0.5))[0]
    assert keep[900] and not keep[0]
    # and the whole keep set matches the exact sequential greedy oracle
    idx, k = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
    seq = np.zeros(n, bool)
    seq[np.asarray(idx)[np.asarray(k)]] = True
    np.testing.assert_array_equal(keep, seq)
