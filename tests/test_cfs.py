"""CFS feature store: roundtrip, parity between native C++ gather and the
Python path, and parity with the reference's region-processing semantics."""
import numpy as np
import pytest

from clg_vqa_tpu.data.cfs import CfsReader, CfsWriter
from clg_vqa_tpu.data.features import RegionRecord, process_regions


def make_store(tmp_path, n_images=6, feat_dim=64, seed=0):
    r = np.random.RandomState(seed)
    path = str(tmp_path / "test.cfs")
    recs = []
    with CfsWriter(path) as w:
        for i in range(n_images):
            n = r.randint(3, 10)
            w_, h_ = r.randint(200, 800), r.randint(200, 800)
            x1 = r.rand(n) * w_ * 0.8; y1 = r.rand(n) * h_ * 0.8
            boxes = np.stack([x1, y1, x1 + r.rand(n) * (w_ - x1),
                              y1 + r.rand(n) * (h_ - y1)], 1).astype(np.float32)
            rec = RegionRecord(image_id=f"img{i}",
                               features=r.randn(n, feat_dim).astype(np.float32),
                               boxes=boxes, img_w=float(w_), img_h=float(h_))
            recs.append(rec)
            w.add(rec)
    return path, recs


def test_roundtrip(tmp_path):
    path, recs = make_store(tmp_path)
    rd = CfsReader(path)
    assert rd.n_records == len(recs)
    for rec in recs:
        got = rd.get(rec.image_id)
        np.testing.assert_array_equal(got.features, rec.features)
        np.testing.assert_array_equal(got.boxes, rec.boxes)
        assert (got.img_w, got.img_h) == (rec.img_w, rec.img_h)


@pytest.mark.parametrize("num_locs,norm,glob", [
    (5, False, None), (7, False, None), (5, True, None),
    (5, False, "first"), (7, True, "last"),
])
def test_native_gather_matches_python(tmp_path, num_locs, norm, glob):
    path, recs = make_store(tmp_path, n_images=8)
    rd = CfsReader(path)
    idx = np.array([3, 0, 7, 1, 3], np.int64)
    f_py, l_py, m_py = rd._gather_py(idx, 6, num_locs, norm, glob)
    f_c, l_c, m_c = rd.gather(idx, max_regions=6, num_locs=num_locs,
                              norm_embeddings=norm, add_global_imgfeat=glob)
    np.testing.assert_array_equal(m_c, m_py)
    if not norm and glob is None:
        # default path is BIT-identical (divisions + raw-coords area in
        # the kernel, memcpy'd features); norm/global paths accumulate in
        # a different order and are only numerically close
        np.testing.assert_array_equal(l_c, l_py)
        np.testing.assert_array_equal(f_c, f_py)
    else:
        np.testing.assert_allclose(l_c, l_py, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(f_c, f_py, rtol=1e-5, atol=1e-6)


def test_process_regions_semantics():
    """Locs layout matches _image_features_reader.py:141-205: normalized
    xyxy, area last, w/h at 4,5 when num_locs=7."""
    feats = np.ones((2, 8), np.float32)
    boxes = np.array([[10, 20, 110, 220], [0, 0, 100, 100]], np.float32)
    f, n, locs = process_regions(feats, boxes, 200.0, 400.0, num_locs=7)
    assert n == 2
    np.testing.assert_allclose(locs[0, :4], [0.05, 0.05, 0.55, 0.55])
    np.testing.assert_allclose(locs[0, 4], 0.5)      # w
    np.testing.assert_allclose(locs[0, 5], 0.5)      # h
    np.testing.assert_allclose(locs[0, 6], 0.25)     # area


def test_h5_cfs_roundtrip(tmp_path):
    """h5 (reference extractor schema) <-> CFS conversions preserve bytes."""
    import h5py
    from clg_vqa_tpu.data import convert_store as cs
    path, recs = make_store(tmp_path, n_images=4)
    h5p = str(tmp_path / "t.h5")
    assert cs.cfs_to_h5(path, h5p) == 4
    with h5py.File(h5p) as f:
        assert set(f.keys()) == {r.image_id for r in recs}
    cfs2 = str(tmp_path / "t2.cfs")
    assert cs.h5_to_cfs(h5p, cfs2) == 4
    rd = CfsReader(cfs2)
    for rec in recs:
        got = rd.get(rec.image_id)
        np.testing.assert_array_equal(got.features, rec.features)
        np.testing.assert_array_equal(got.boxes, rec.boxes)


def test_cfs_v2_detection_metadata_roundtrip(tmp_path):
    r = np.random.RandomState(9)
    path = str(tmp_path / "det.cfs")
    n = 5
    rec = RegionRecord(
        image_id="d0", features=r.randn(n, 8).astype(np.float32),
        boxes=(r.rand(n, 4) * 50 + [[0, 0, 60, 60]]).astype(np.float32),
        img_w=100.0, img_h=100.0,
        obj_id=r.randint(0, 1600, n).astype(np.int32),
        obj_conf=r.rand(n).astype(np.float32),
        attr_id=r.randint(0, 400, n).astype(np.int32),
        attr_conf=r.rand(n).astype(np.float32))
    with CfsWriter(path) as w:
        w.add(rec)
        w.add(RegionRecord("d1", r.randn(3, 8).astype(np.float32),
                           rec.boxes[:3], 100.0, 100.0))   # no metadata
    rd = CfsReader(path)
    got = rd.get("d0")
    np.testing.assert_array_equal(got.obj_id, rec.obj_id)
    np.testing.assert_array_equal(got.obj_conf, rec.obj_conf)
    np.testing.assert_array_equal(got.attr_id, rec.attr_id)
    np.testing.assert_array_equal(got.attr_conf, rec.attr_conf)
    assert rd.get("d1").obj_id is None
    # native gather still reads features/boxes correctly past the new fields
    f_c, l_c, m_c = rd.gather(np.array([0, 1]), max_regions=6, num_locs=5)
    f_p, l_p, m_p = rd._gather_py(np.array([0, 1]), 6, 5, False, None)
    np.testing.assert_allclose(f_c, f_p, rtol=1e-6)
    np.testing.assert_array_equal(m_c, m_p)


def test_tsv_to_cfs(tmp_path):
    """BUTD TSV -> CFS conversion (tsv_to_h5.py schema)."""
    import base64 as b64
    from clg_vqa_tpu.data.convert_store import tsv_to_cfs
    r = np.random.RandomState(3)
    rows = []
    for i in range(3):
        n = r.randint(2, 6)
        boxes = (r.rand(n, 4) * 100).astype(np.float32)
        feats = r.randn(n, 16).astype(np.float32)
        rows.append("\t".join([
            f"img{i}", "480", "640",
            b64.b64encode(r.randint(0, 1600, n).astype(np.int64).tobytes()).decode(),
            b64.b64encode(r.rand(n).astype(np.float32).tobytes()).decode(),
            b64.b64encode(r.randint(0, 400, n).astype(np.int64).tobytes()).decode(),
            b64.b64encode(r.rand(n).astype(np.float32).tobytes()).decode(),
            str(n),
            b64.b64encode(boxes.tobytes()).decode(),
            b64.b64encode(feats.tobytes()).decode(),
        ]))
    tsv = tmp_path / "t.tsv"
    tsv.write_text("\n".join(rows))
    out = str(tmp_path / "t.cfs")
    assert tsv_to_cfs(str(tsv), out, feat_dim=16) == 3
    rd = CfsReader(out)
    rec = rd.get("img1")
    assert rec.features.shape[1] == 16
    assert rec.obj_id is not None and rec.obj_id.dtype == np.int32


def test_cfs_concurrent_readers(tmp_path):
    """Multiple reader handles over one store + threaded gathers (the
    prefetch thread uses the reader concurrently with eval code)."""
    import threading
    path, recs = make_store(tmp_path, n_images=10)
    readers = [CfsReader(path) for _ in range(3)]
    idx = np.arange(10, dtype=np.int64)
    outs = [None] * 3

    def work(k):
        f, l, m = readers[k].gather(idx, max_regions=8, num_locs=5)
        outs[k] = (f, l, m)

    ts = [threading.Thread(target=work, args=(k,)) for k in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    for k in range(1, 3):
        np.testing.assert_array_equal(outs[0][0], outs[k][0])
        np.testing.assert_array_equal(outs[0][2], outs[k][2])


def test_cfs_rejects_corrupt_file(tmp_path):
    bad = tmp_path / "bad.cfs"
    bad.write_bytes(b"NOTCFS" + b"\x00" * 64)
    with pytest.raises(ValueError):
        CfsReader(str(bad))


def test_all_features_reader_reference_semantics(tmp_path):
    """AllFeaturesReader == a numpy replica of the reference all-reader
    (_all_image_features_reader.py:73-146): pixel-space ori copy before
    normalization, num_locs==5-only area column, global-feature variants,
    obj_confs row reshape, detection metadata pass-through."""
    from clg_vqa_tpu.data.features import AllFeaturesReader
    r = np.random.RandomState(3)
    n, d = 5, 8
    W, H = 640.0, 480.0
    feats = r.randn(n, d).astype(np.float32)
    x1 = r.rand(n).astype(np.float32) * 500
    y1 = r.rand(n).astype(np.float32) * 300
    boxes = np.stack([x1, y1, x1 + 30, y1 + 40], 1)
    obj_id = r.randint(0, 1600, n)
    obj_conf = r.rand(n).astype(np.float32)
    attr_id = r.randint(0, 400, n)
    attr_conf = r.rand(n).astype(np.float32)
    path = str(tmp_path / "all.cfs")
    with CfsWriter(path) as w:
        w.add(RegionRecord("im0", feats, boxes, W, H, obj_id=obj_id,
                           obj_conf=obj_conf, attr_id=attr_id,
                           attr_conf=attr_conf))
    rd = CfsReader(path)

    for glb in (None, "first", "last"):
        out = AllFeaturesReader(rd, num_locs=5, add_global_imgfeat=glb)["im0"]
        (f, nb, loc, loc_ori, cls, ol, oc, al, ac, attrs) = out
        # independent replica
        exp_loc = np.zeros((n, 5), np.float32)
        exp_loc[:, :4] = boxes
        exp_loc[:, 4] = (boxes[:, 3] - boxes[:, 1]) * \
            (boxes[:, 2] - boxes[:, 0]) / (W * H)
        exp_ori = exp_loc.copy()
        exp_loc = exp_loc / np.array([W, H, W, H, 1], np.float32)
        exp_f, exp_nb = feats, n
        if glb is not None:
            g = feats.sum(0, keepdims=True) / n
            gl = np.array([[0, 0, 1, 1, 1]], np.float32)
            go = np.array([[0, 0, W, H, W * H]], np.float32)
            exp_nb = n + 1
            order = ([g, feats], [gl, exp_loc], [go, exp_ori]) \
                if glb == "first" else \
                ([feats, g], [exp_loc, gl], [exp_ori, go])
            exp_f = np.concatenate(order[0], 0)
            exp_loc = np.concatenate(order[1], 0)
            exp_ori = np.concatenate(order[2], 0)
        assert nb == exp_nb
        np.testing.assert_allclose(f, exp_f, rtol=1e-6)
        np.testing.assert_allclose(loc, exp_loc, rtol=1e-6)
        np.testing.assert_allclose(loc_ori, exp_ori, rtol=1e-6)
        assert cls is None and attrs is None
        np.testing.assert_array_equal(ol, obj_id)
        assert oc.shape == (1, n)              # reference reshape quirk
        np.testing.assert_allclose(oc[0], obj_conf, rtol=1e-6)
        np.testing.assert_array_equal(al, attr_id)
        np.testing.assert_allclose(ac, attr_conf, rtol=1e-6)


def test_all_features_reader_no_area_for_7loc(tmp_path):
    """The all-reader computes the area column ONLY for num_locs == 5
    (_all_image_features_reader.py:91-97) — 7-loc rows keep zeros past xyxy."""
    from clg_vqa_tpu.data.features import AllFeaturesReader
    boxes = np.array([[10, 10, 50, 50]], np.float32)
    path = str(tmp_path / "a7.cfs")
    with CfsWriter(path) as w:
        w.add(RegionRecord("i", np.ones((1, 4), np.float32), boxes,
                           100.0, 100.0))
    out = AllFeaturesReader(CfsReader(path), num_locs=7)["i"]
    loc = out[2]
    np.testing.assert_array_equal(loc[:, 4:], np.zeros((1, 3), np.float32))


def test_native_gather_thread_safety(tmp_path):
    """Concurrent gathers from prefetch-style threads must agree with the
    serial result (shared mmap handle behind cfs_native._handle_for's
    lock; the C++ kernel itself spawns worker threads per call)."""
    import threading
    path, recs = make_store(tmp_path, n_images=12)
    rd = CfsReader(path)
    idx = np.array([3, 0, 7, 1, 11, 5], np.int64)
    want = rd.gather(idx, max_regions=6, num_locs=5)
    outs = [None] * 8
    errs = []

    def work(t):
        try:
            outs[t] = rd.gather(idx, max_regions=6, num_locs=5)
        except Exception as e:          # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=work, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    for got in outs:
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
