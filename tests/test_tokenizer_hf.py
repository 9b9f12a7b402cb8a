"""Real (HF sentencepiece-style) tokenizer path — the reference tokenizes
with AutoTokenizer (task_utils.py:468) and truncates
``[t0] + t[1:-1][:max-2] + [t_last]`` (gqa_..._code_mix.py:629-630).

Uses the in-repo miniature XLM-R-style fixture (tools/make_tiny_tokenizer.py:
Unigram + Metaspace, XLM-R special-token layout) since no xlm-roberta-base
snapshot exists in this offline environment.
"""
import os

import numpy as np
import pytest

from clg_vqa_tpu.data.tokenizer import (HFTokenizer, encode_padded,
                                        truncate_encoded)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_xlmr_tok")


@pytest.fixture(scope="module")
def hf():
    return HFTokenizer(FIXTURE)


def test_hf_specials_match_xlmr_layout(hf):
    assert (hf.bos_id, hf.pad_id, hf.eos_id) == (0, 1, 2)
    ids = hf.encode("what color is the car ?")
    assert ids[0] == hf.bos_id and ids[-1] == hf.eos_id
    assert all(i != hf.pad_id for i in ids)


def test_hf_encode_matches_autotokenizer(hf):
    from transformers import AutoTokenizer
    ref = AutoTokenizer.from_pretrained(FIXTURE)
    for q in ["what color is the dog ?",
              "is there a fire hydrant near the bench ?",
              "überraschung non-ascii ¿cuántos?"]:
        assert hf.encode(q) == ref.encode(q)


def test_truncation_contract_on_real_pieces(hf):
    """The reference expression applied to AutoTokenizer.encode output must
    equal our truncate_encoded on the same tokens, preserving BOS/EOS."""
    q = " ".join(["what color is the car near the red fire hydrant"] * 8) + " ?"
    t = hf.encode(q)
    assert len(t) > 40
    for max_len in (8, 16, 40):
        ours = truncate_encoded(t, max_len)
        reference = [t[0]] + t[1:-1][: max_len - 2] + [t[-1]]
        assert ours == reference
        assert len(ours) == max_len
        assert ours[0] == hf.bos_id and ours[-1] == hf.eos_id


def test_encode_padded_hf(hf):
    ids, mask, seg = encode_padded(hf, "what color ?", 16)
    n = sum(mask)
    assert ids[:n] == hf.encode("what color ?")[:n]
    assert ids[n:] == [hf.pad_id] * (16 - n)
    assert mask == [1] * n + [0] * (16 - n)
    assert seg == [0] * 16


def test_hf_through_gqa_dataset_make_batch(hf, tmp_path):
    """End-to-end: GQADataset batches built with the HF tokenizer (VERDICT r1
    #4 done-criterion)."""
    from clg_vqa_tpu.data.cfs import CfsReader, CfsWriter
    from clg_vqa_tpu.data.features import RegionRecord
    from clg_vqa_tpu.data.gqa import Entry, GQADataset

    r = np.random.RandomState(0)
    store = str(tmp_path / "f.cfs")
    with CfsWriter(store) as w:
        for i in range(3):
            n = r.randint(3, 6)
            boxes = np.stack([r.rand(n) * 40, r.rand(n) * 40,
                              50 + r.rand(n) * 40, 50 + r.rand(n) * 40],
                             1).astype(np.float32)
            w.add(RegionRecord(f"i{i}", r.randn(n, 16).astype(np.float32),
                               boxes, 100.0, 100.0))
    questions = ["what color is the car ?",
                 "is there a dog near the bench ?",
                 "how many people are sitting on the bench near the red "
                 "fire hydrant by the open window under the yellow lamp ?"]
    entries = [Entry(question_id=i, image_id=f"i{i}", question=questions[i],
                     labels=[i], scores=[1.0]) for i in range(3)]
    ds = GQADataset(entries, CfsReader(store), hf, max_seq_length=12,
                    max_region_num=6, num_locs=7, num_labels=4)
    b = ds.make_batch([0, 1, 2])
    assert b["input_ids"].shape == (3, 12)
    for j in range(3):
        expect = truncate_encoded(hf.encode(questions[j]), 12)
        n = len(expect)
        assert b["input_ids"][j, :n].tolist() == expect
        assert b["input_ids"][j, n:].tolist() == [hf.pad_id] * (12 - n)
        assert b["input_mask"][j].tolist() == [1] * n + [0] * (12 - n)
    assert b["input_ids"].dtype == np.int32
    assert b["features"].shape == (3, 6, 16)


def test_hf_tokenize_and_ids_roundtrip(hf):
    """tokenize/convert_tokens_to_ids (used by embed_clf classifier init,
    train_task.py:218-238) agree with encode minus specials."""
    q = "what color is the dog ?"
    toks = hf.tokenize(q)
    ids = hf.convert_tokens_to_ids(toks)
    assert ids == hf.encode(q)[1:-1]
