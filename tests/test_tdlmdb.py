"""td-lmdb (tensorpack LMDBSerializer) ingest: serialization wire format,
reader/writer roundtrip, the reference h5->tdlmdb join, tdlmdb->CFS ingest,
and a CLI training step fed directly from a td-lmdb."""
import glob
import json
import os
import pickle

import msgpack
import numpy as np
import pytest

from clg_vqa_tpu.data import tdlmdb as td


def test_msgpack_numpy_wire_format():
    """dumps() must put ndarrays on the wire in msgpack_numpy's documented
    {b'nd', b'type', b'kind', b'shape', b'data'} dict convention so real
    tensorpack/msgpack_numpy stacks can decode our stores (and vice versa)."""
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    blob = td.dumps({"features": arr, "img_id": "x", "n": 7})
    raw = msgpack.unpackb(blob, raw=False, strict_map_key=False)
    enc = raw["features"]
    assert enc[b"nd"] is True
    assert enc[b"type"] == "<f4"
    assert tuple(enc[b"shape"]) == (3, 4)
    assert enc[b"data"] == arr.tobytes()
    out = td.loads(blob)
    np.testing.assert_array_equal(out["features"], arr)
    assert out["img_id"] == "x" and out["n"] == 7


def test_serialization_roundtrip_types():
    item = {
        "features": np.random.RandomState(0).randn(5, 16).astype(np.float32),
        "boxes": np.zeros((5, 4), np.float32),
        "img_w": np.int64(640), "img_h": np.int64(480),
        "img_id": "2354786",
        "entry": {"question_id": 11, "image_id": "2354786",
                  "question": "what color?", "labels": [3],
                  "scores": [1.0]},
        "obj_id": np.arange(5, dtype=np.int64),
    }
    out = td.loads(td.dumps(item))
    np.testing.assert_array_equal(out["features"], item["features"])
    np.testing.assert_array_equal(out["obj_id"], item["obj_id"])
    assert out["img_w"] == 640 and isinstance(out["img_w"], np.integer)
    assert out["entry"] == item["entry"]


def _mk_datapoints(n_img=4, q_per_img=3, feat_dim=16, seed=0):
    r = np.random.RandomState(seed)
    dps = []
    qid = 0
    for i in range(n_img):
        feats = r.randn(6, feat_dim).astype(np.float32)
        boxes = np.stack([r.rand(6) * 50, r.rand(6) * 50,
                          50 + r.rand(6) * 50, 50 + r.rand(6) * 50],
                         1).astype(np.float32)
        for _ in range(q_per_img):
            dps.append({
                "features": feats, "boxes": boxes,
                "img_w": np.int64(100), "img_h": np.int64(100),
                "img_id": f"i{i}",
                "entry": {"question_id": qid, "image_id": f"i{i}",
                          "question": f"marker{qid % 4} thing ?",
                          "labels": [qid % 4], "scores": [1.0]},
            })
            qid += 1
    return dps


def test_write_read_roundtrip(tmp_path):
    path = str(tmp_path / "t.lmdb")
    dps = _mk_datapoints()
    n = td.write_tdlmdb(path, dps)
    assert n == 12
    rd = td.TdLmdbReader(path)
    assert len(rd) == 12
    # LMDBSerializer key scheme: zero-padded decimal index + __keys__
    assert rd.keys[0] == b"00000000" and rd.keys[-1] == b"00000011"
    for i, dp in enumerate(dps):
        item = rd[i]
        np.testing.assert_array_equal(item["features"], dp["features"])
        assert item["entry"] == dp["entry"]
        assert item["img_id"] == dp["img_id"]


def test_h5_to_tdlmdb_matches_reference_join(tmp_path):
    """gqa_boxes36_h5-to-tdlmdb.py:8-39: one record per question, each
    carrying the full h5 group + img_id + entry."""
    import h5py
    h5p = str(tmp_path / "f.h5")
    r = np.random.RandomState(1)
    with h5py.File(h5p, "w") as f:
        for i in range(3):
            g = f.create_group(f"i{i}")
            g["features"] = r.randn(6, 16).astype(np.float32)
            g["boxes"] = r.rand(6, 4).astype(np.float32) * 100
            g["img_w"] = np.int64(100)
            g["img_h"] = np.int64(100)
            g["obj_id"] = np.arange(6, dtype=np.int64)
    target = [{"question_id": q, "image_id": f"i{q % 3}",
               "question": f"q{q} ?", "labels": [q % 2], "scores": [1.0]}
              for q in range(7)]
    tpkl = str(tmp_path / "train_target.pkl")
    pickle.dump(target, open(tpkl, "wb"))
    out = str(tmp_path / "t.lmdb")
    n = td.h5_to_tdlmdb(h5p, tpkl, out)
    assert n == 7
    rd = td.TdLmdbReader(out)
    seen_qids = set()
    with h5py.File(h5p, "r") as f:
        for item in rd:
            img = item["img_id"]
            np.testing.assert_array_equal(item["features"],
                                          f[img]["features"][()])
            np.testing.assert_array_equal(item["obj_id"], f[img]["obj_id"][()])
            assert item["entry"]["image_id"] == img
            seen_qids.add(item["entry"]["question_id"])
    assert seen_qids == set(range(7))


def test_tdlmdb_to_cfs_ingest(tmp_path):
    from clg_vqa_tpu.data.cfs import CfsReader
    path = str(tmp_path / "t.lmdb")
    dps = _mk_datapoints()
    td.write_tdlmdb(path, dps)
    cfs = str(tmp_path / "t.cfs")
    epkl = str(tmp_path / "t_target.pkl")
    n_img, n_q = td.tdlmdb_to_cfs(path, cfs, epkl, feat_dim=16)
    assert (n_img, n_q) == (4, 12)
    rd = CfsReader(cfs)
    assert rd.n_records == 4
    rec = rd.get(dps[0]["img_id"])
    np.testing.assert_array_equal(rec.features, dps[0]["features"])
    np.testing.assert_array_equal(rec.boxes, dps[0]["boxes"])
    entries = pickle.load(open(epkl, "rb"))
    assert len(entries) == 12
    assert entries[0]["question"] == dps[0]["entry"]["question"]
    assert entries[0]["labels"] == dps[0]["entry"]["labels"]


def test_b64_record_variant():
    """The reference loader accepts b64-encoded buffers (older stores,
    gqa_..._code_mix.py:577-579); ingest must too."""
    import base64
    feats = np.arange(32, dtype=np.float32).reshape(2, 16)
    boxes = np.arange(8, dtype=np.float32).reshape(2, 4)
    item = {"features": base64.b64encode(feats.tobytes()),
            "boxes": base64.b64encode(boxes.tobytes())}
    f, b = td._record_arrays(item, feat_dim=16)
    np.testing.assert_array_equal(f, feats)
    np.testing.assert_array_equal(b, boxes)


def test_cli_train_from_tdlmdb(tmp_path, capsys):
    """VERDICT r1 #3 done-criterion: a CLI training run fed a td-lmdb as its
    train feature path (auto-ingested into CFS + entries)."""
    from clg_vqa_tpu.cli.__main__ import main
    L = 4
    dataroot = tmp_path / "annotations"
    dataroot.mkdir()
    label2ans = [f"ans{k}" for k in range(L)]
    pickle.dump({a: i for i, a in enumerate(label2ans)},
                open(dataroot / "trainval_ans2label.pkl", "wb"))
    pickle.dump(label2ans, open(dataroot / "trainval_label2ans.pkl", "wb"))
    # val split still reads target pkls; train comes from the td-lmdb
    val_items = [{"question_id": 900 + i, "image_id": f"i{i % 4}",
                  "question": f"marker{i % L} thing ?", "labels": [i % L],
                  "scores": [1.0]} for i in range(8)]
    pickle.dump(val_items, open(dataroot / "val_target.pkl", "wb"))

    tdp = str(tmp_path / "train.lmdb")
    td.write_tdlmdb(tdp, _mk_datapoints(n_img=4, q_per_img=8))
    # the val path needs a per-image store; ingest the same td-lmdb
    cfs = str(tmp_path / "val.cfs")
    td.tdlmdb_to_cfs(tdp, cfs, None, feat_dim=16)

    import sys
    if os.path.dirname(__file__) not in sys.path:
        sys.path.insert(0, os.path.dirname(__file__))
    from tools_cfg_helper import make_ref_cfg_dict  # noqa: E402
    model_json = str(tmp_path / "model.json")
    json.dump(make_ref_cfg_dict(2, hidden=32, heads=2, inter=64, vocab=128,
                                vfeat=16, labels=L), open(model_json, "w"))
    (tmp_path / "task.yml").write_text(f"""TASK15:
  name: GQA
  type: VL-classifier-GQA
  num_labels: {L}
  loss: CrossEntropyLoss
  dataroot: {dataroot}
  features_h5path1: {tdp}
  features_h5path2: {cfs}
  max_seq_length: 8
  max_region_num: 6
  batch_size: 8
  eval_batch_size: 8
  train_split: train
  val_split: val
  lr: 0.005
  num_epoch: 1
  semantic_lambda: 1
""")
    out = str(tmp_path / "run")
    main(["train", "--config_file", model_json,
          "--tasks_config_file", str(tmp_path / "task.yml"),
          "--output_dir", out, "--fp32", "--grad_acc_steps", "2"])
    text = capsys.readouterr().out
    assert "ingested td-lmdb" in text
    assert "Best validation score" in text
    assert glob.glob(os.path.join(out, "ingest_train_*.cfs"))  # source-signed cache key
    assert os.path.isdir(os.path.join(out, "params_best"))


def test_ingest_cache_keyed_by_source(tmp_path):
    """A cached ingest from a DIFFERENT td-lmdb in the same output dir
    must not be silently reused — the cache key carries the source's
    path+size+mtime signature."""
    from clg_vqa_tpu.cli import common as C
    out = str(tmp_path / "out")
    a = str(tmp_path / "a.lmdb")
    b = str(tmp_path / "b.lmdb")
    td.write_tdlmdb(a, _mk_datapoints(n_img=2, q_per_img=3, seed=0))
    td.write_tdlmdb(b, _mk_datapoints(n_img=3, q_per_img=3, seed=1))
    cfs_a, items_a = C.ingest_tdlmdb(a, out, "train")
    cfs_b, items_b = C.ingest_tdlmdb(b, out, "train")
    assert cfs_a != cfs_b
    assert len(items_a) == 6 and len(items_b) == 9
    # same source again -> same cache entry (no re-ingest)
    cfs_a2, _ = C.ingest_tdlmdb(a, out, "train")
    assert cfs_a2 == cfs_a
