"""LMDB codec (data/lmdb_lite.py): on-disk format invariants, B-tree search
correctness at depth >= 3, overflow (big value) pages, py-lmdb shim."""
import os
import struct

import numpy as np
import pytest

from clg_vqa_tpu.data import lmdb_lite as ll


def _pairs(n, seed=0, vmin=1, vmax=64):
    r = np.random.RandomState(seed)
    out = {}
    while len(out) < n:
        k = bytes(r.randint(0, 256, r.randint(1, 24), dtype=np.uint8))
        if not k:
            continue
        out[k] = bytes(r.randint(0, 256, r.randint(vmin, vmax),
                                 dtype=np.uint8))
    return out


def test_roundtrip_small(tmp_path):
    path = str(tmp_path / "small.mdb")
    data = {b"alpha": b"1", b"beta": b"22", b"gamma": b"333", b"": None}
    data.pop(b"")
    n = ll.write_lmdb(path, data.items())
    assert n == 3
    with ll.Reader(path) as r:
        assert len(r) == 3
        for k, v in data.items():
            assert r.get(k) == v
        assert r.get(b"missing") is None
        assert r.get(b"alph") is None       # prefix of a key, not a key
        assert r.get(b"alphaa") is None
        assert list(r.items()) == sorted(data.items())


def test_roundtrip_empty(tmp_path):
    path = str(tmp_path / "empty.mdb")
    ll.write_lmdb(path, [])
    with ll.Reader(path) as r:
        assert len(r) == 0
        assert r.get(b"x") is None
        assert list(r.items()) == []


def test_deep_tree_binary_search(tmp_path):
    """50k random keys -> depth >= 3 B-tree; every key findable, iteration
    sorted, negative probes miss."""
    path = str(tmp_path / "deep.mdb")
    data = _pairs(50_000, seed=1)
    ll.write_lmdb(path, data.items())
    with ll.Reader(path) as r:
        assert r.depth >= 3
        assert len(r) == 50_000
        keys = sorted(data)
        for k in keys[::997] + [keys[0], keys[-1]]:
            assert r.get(k) == data[k]
        it = list(r.items())
        assert [k for k, _ in it] == keys
        assert all(v == data[k] for k, v in it)
        rr = np.random.RandomState(2)
        for _ in range(200):
            probe = bytes(rr.randint(0, 256, rr.randint(1, 24),
                                     dtype=np.uint8))
            assert r.get(probe) == data.get(probe)


def test_overflow_values(tmp_path):
    """Values over the inline node limit ((psize-16)/2) go to overflow pages
    and read back exactly, including multi-page (>psize) chunks."""
    path = str(tmp_path / "ovf.mdb")
    r = np.random.RandomState(3)
    data = {
        b"tiny": b"x",
        b"at-limit": bytes(r.randint(0, 256, 2000, dtype=np.uint8)),
        b"one-page": bytes(r.randint(0, 256, 3000, dtype=np.uint8)),
        b"multi-page": bytes(r.randint(0, 256, 300_000, dtype=np.uint8)),
        b"exact-psize": bytes(r.randint(0, 256, 4096, dtype=np.uint8)),
    }
    ll.write_lmdb(path, data.items())
    with ll.Reader(path) as rd:
        for k, v in data.items():
            assert rd.get(k) == v, k
        assert dict(rd.items()) == data


def test_on_disk_format_invariants(tmp_path):
    """Meta pages carry the LMDB magic/version, page size in FREE_DBI md_pad,
    entry count, and a root consistent with the file; all pages addressable
    by pgno * psize."""
    path = str(tmp_path / "fmt.mdb")
    data = _pairs(500, seed=4, vmin=1, vmax=5000)
    ll.write_lmdb(path, data.items())
    raw = open(path, "rb").read()
    assert len(raw) % ll.PSIZE == 0
    for pg in (0, 1):
        off = pg * ll.PSIZE
        pgno, _pad, flags, _lo, _up = struct.unpack_from("<QHHHH", raw, off)
        assert pgno == pg and flags == ll.P_META
        magic, version, _addr, mapsize = struct.unpack_from(
            "<IIQQ", raw, off + 16)
        assert magic == ll.MDB_MAGIC and version == ll.MDB_VERSION
        assert mapsize >= len(raw)
        psize_in_free = struct.unpack_from("<I", raw, off + 16 + 24)[0]
        assert psize_in_free == ll.PSIZE
        entries, root = struct.unpack_from("<QQ", raw, off + 16 + 24 + 48 + 32)
        assert entries == 500
        assert root * ll.PSIZE < len(raw)
        last_pg, txnid = struct.unpack_from("<QQ", raw, off + 16 + 24 + 96)
        assert last_pg == len(raw) // ll.PSIZE - 1
        assert txnid >= 1


def test_write_shim_and_merge(tmp_path):
    """py-lmdb style env: write txn commits on context exit; a second write
    txn merges with existing contents."""
    path = str(tmp_path / "env.mdb")
    env = ll.open(path, subdir=False, map_size=1 << 20)
    with env.begin(write=True) as txn:
        txn.put(b"a", b"1")
        txn.put(b"b", b"2")
    with env.begin(write=False) as txn:
        assert txn.get(b"a") == b"1"
    with env.begin(write=True) as txn:
        txn.put(b"b", b"2b")
        txn.put(b"c", b"3")
    with env.begin(write=False) as txn:
        assert txn.get(b"a") == b"1"
        assert txn.get(b"b") == b"2b"
        assert dict(txn.cursor()) == {b"a": b"1", b"b": b"2b", b"c": b"3"}


def test_subdir_layout(tmp_path):
    """Directory envs keep data in <dir>/data.mdb (py-lmdb default layout);
    the reader accepts either the dir or the file."""
    d = str(tmp_path / "envdir")
    env = ll.open(d)          # subdir=True default, creates the dir
    with env.begin(write=True) as txn:
        txn.put(b"k", b"v")
    assert os.path.isfile(os.path.join(d, "data.mdb"))
    assert ll.Reader(d).get(b"k") == b"v"
    assert ll.Reader(os.path.join(d, "data.mdb")).get(b"k") == b"v"


def test_feature_store_lmdb_roundtrip(tmp_path):
    """cfs -> per-image LMDB (reference schema: pickled b64 records +
    b'keys') -> LmdbFeatureReader -> cfs again; previously untestable
    without py-lmdb."""
    from clg_vqa_tpu.data.cfs import CfsReader, CfsWriter
    from clg_vqa_tpu.data.convert_store import cfs_to_lmdb, lmdb_to_cfs
    from clg_vqa_tpu.data.features import LmdbFeatureReader, RegionRecord

    r = np.random.RandomState(5)
    cfs1 = str(tmp_path / "a.cfs")
    with CfsWriter(cfs1) as w:
        for i in range(5):
            n = r.randint(3, 9)
            w.add(RegionRecord(
                f"img{i}", r.randn(n, 2048).astype(np.float32),
                (r.rand(n, 4) * 100).astype(np.float32), 640.0, 480.0))
    mdb = str(tmp_path / "b.lmdb")
    assert cfs_to_lmdb(cfs1, mdb) == 5

    rd = LmdbFeatureReader(mdb)
    src = CfsReader(cfs1)
    assert sorted(k.decode() if isinstance(k, bytes) else k
                  for k in rd.keys()) == sorted(
        src.get_by_index(i).image_id for i in range(5))
    rec = rd.get("img3")
    ref = src.get("img3")
    np.testing.assert_array_equal(rec.features, ref.features)
    np.testing.assert_array_equal(rec.boxes, ref.boxes)
    assert rec.img_w == 640.0 and rec.img_h == 480.0

    cfs2 = str(tmp_path / "c.cfs")
    assert lmdb_to_cfs(mdb, cfs2) == 5
    back = CfsReader(cfs2)
    for i in range(5):
        a = src.get_by_index(i)
        b = back.get(a.image_id)
        np.testing.assert_array_equal(a.features, b.features)
        np.testing.assert_array_equal(a.boxes, b.boxes)


def test_rejects_non_lmdb(tmp_path):
    p = tmp_path / "not.mdb"
    p.write_bytes(b"\0" * 8192)
    with pytest.raises(ValueError):
        ll.Reader(str(p))


def test_long_key_rejected(tmp_path):
    with pytest.raises(ValueError):
        ll.write_lmdb(str(tmp_path / "x.mdb"), [(b"k" * 600, b"v")])


def test_write_txn_reads_through_committed_store(tmp_path):
    """py-lmdb write transactions see committed data: txn.get of a key
    not in the pending puts must resolve against the store on disk."""
    from clg_vqa_tpu.data import lmdb_lite as L
    p = str(tmp_path / "db")
    env = L.open(p, map_size=1 << 20)
    with env.begin(write=True) as t:
        t.put(b"a", b"1")
    with env.begin(write=True) as t:
        assert t.get(b"a") == b"1"          # read-through
        t.put(b"b", b"2")
        assert t.get(b"b") == b"2"          # pending shadows
    with env.begin() as t:
        assert t.get(b"a") == b"1" and t.get(b"b") == b"2"


def test_lmdb_feature_reader_store_protocol(tmp_path):
    """LmdbFeatureReader exposes the same store surface as CfsReader
    (n_records / id2idx / get_by_index / gather) so the advertised
    '--features_path <lmdb dir>' CLI path actually feeds GQADataset and
    the device bank; gather must be bit-identical to CfsReader's."""
    from clg_vqa_tpu.data.cfs import CfsReader, CfsWriter
    from clg_vqa_tpu.data.convert_store import cfs_to_lmdb
    from clg_vqa_tpu.data.features import LmdbFeatureReader, RegionRecord

    r = np.random.RandomState(6)
    cfs1 = str(tmp_path / "a.cfs")
    with CfsWriter(cfs1) as w:
        for i in range(4):
            n = r.randint(3, 9)
            w.add(RegionRecord(
                f"img{i}", r.randn(n, 2048).astype(np.float32),
                (r.rand(n, 4) * 100).astype(np.float32), 640.0, 480.0))
    mdb = str(tmp_path / "b.lmdb")
    cfs_to_lmdb(cfs1, mdb)

    rd = LmdbFeatureReader(mdb)
    src = CfsReader(cfs1)
    assert rd.n_records == 4
    assert set(rd.id2idx) == set(src.id2idx)
    got = rd.gather([rd.id2idx[f"img{i}"] for i in range(4)],
                    max_regions=8, num_locs=5)
    want = src.gather([src.id2idx[f"img{i}"] for i in range(4)],
                      max_regions=8, num_locs=5, native=False)
    for g, w_ in zip(got, want):
        np.testing.assert_array_equal(g, w_)     # same shared python path
    native = src.gather([src.id2idx[f"img{i}"] for i in range(4)],
                        max_regions=8, num_locs=5)
    for g, w_ in zip(got, native):
        np.testing.assert_allclose(g, w_, atol=1e-7)
