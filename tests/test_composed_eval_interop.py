"""Composed data+model+eval interop: the reference's OWN eval flow over
OUR artifacts must produce the same result.json as `cli eval`'s runner.

The strongest accuracy proxy available offline (no released checkpoints,
zero egress): write the feature store and eval annotations with OUR
converters, export OUR model to a torch state dict, then run the
reference stack END TO END — its ImageFeaturesH5Reader over the per-image
LMDB our cfs_to_lmdb wrote (through the pure-Python lmdb_lite codec
standing in for py-lmdb), its GQAClassificationDataset tokenizing the
same annotations with the same HF tokenizer, its BertForVLTasks loaded
from our export, and the eval_task.py result loop — and assert its
{questionId, prediction} json is identical to run_eval's on the same
inputs. Covers jointly what the golden-parity (model), store-roundtrip
(data), and checkpoint-interop (weights) tests each cover alone.

Reference flow replicated: eval_task.py:96-213 (dataset via
task_utils.py:632-691 LoadDatasetEval semantics; per-batch loop
task_utils.py:815-841 VL-classifier-GQA branch — argmax ->
{"questionId": str(qid), "prediction": label2ans[idx]}). The .cuda()
transfer at task_utils.py:717 is the only line not reproduced (CPU run).
"""
import json
import os
import pickle
import sys
import types

import numpy as np
import pytest

import jax

REF = "/root/reference/volta"
TINY_TOK = os.path.join(os.path.dirname(__file__), "fixtures",
                        "tiny_xlmr_tok")


def _install_reference_stubs():
    """Make the reference's dataset stack importable without its CUDA/IO
    deps: stub boto3/tensorpack/msgpack_numpy, alias py-lmdb to our
    lmdb_lite codec, and register volta.datasets as a namespace package so
    importing the GQA module skips the package __init__ (which pulls the
    prompt-variant dataset and other unused modules)."""
    for m in ["boto3", "requests", "botocore", "botocore.exceptions",
              "tensorboardX"]:
        sys.modules.setdefault(m, types.ModuleType(m))
    sys.modules["botocore.exceptions"].ClientError = Exception

    from clg_vqa_tpu.data import lmdb_lite
    sys.modules.setdefault("lmdb", lmdb_lite)

    tp = types.ModuleType("tensorpack")
    tp.dataflow = types.ModuleType("tensorpack.dataflow")
    sys.modules.setdefault("tensorpack", tp)
    sys.modules.setdefault("tensorpack.dataflow", tp.dataflow)
    mn = types.ModuleType("msgpack_numpy")
    mn.patch = lambda: None
    sys.modules.setdefault("msgpack_numpy", mn)

    sys.path.insert(0, REF)
    import volta  # noqa: F401  (real package)
    if "volta.datasets" not in sys.modules:
        pkg = types.ModuleType("volta.datasets")
        pkg.__path__ = [os.path.join(REF, "volta", "datasets")]
        sys.modules["volta.datasets"] = pkg


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
@pytest.mark.skipif(not os.path.isdir(TINY_TOK),
                    reason="run tools/make_tiny_tokenizer.py first")
def test_reference_eval_flow_on_our_artifacts(tmp_path):
    from clg_vqa_tpu.config import UC2Config
    from clg_vqa_tpu.data.convert_store import cfs_to_lmdb
    from clg_vqa_tpu.data.cfs import CfsReader, CfsWriter
    from clg_vqa_tpu.data.features import RegionRecord
    from clg_vqa_tpu.data.gqa import GQADataset, load_entries
    from clg_vqa_tpu.data.tokenizer import HFTokenizer
    from clg_vqa_tpu.eval import runner
    from clg_vqa_tpu.models import uc2
    from clg_vqa_tpu.utils.convert import pytree_to_volta_uc2

    n_blocks, n_imgs, n_q, L = 2, 6, 21, 50
    seq_len, max_regions = 12, 8

    # ---- OUR artifacts -------------------------------------------------
    r = np.random.RandomState(0)
    cfs_path = str(tmp_path / "feat.cfs")
    with CfsWriter(cfs_path) as w:
        for i in range(n_imgs):
            n = int(r.randint(4, max_regions + 1))
            boxes = np.stack([r.rand(n) * 40, r.rand(n) * 40,
                              60 + r.rand(n) * 40, 60 + r.rand(n) * 40],
                             1).astype(np.float32)
            w.add(RegionRecord(f"img{i}",
                               r.randn(n, 2048).astype(np.float32),
                               boxes, img_w=128.0, img_h=96.0))

    words = ("car dog tree lamp boat bench plate fence chair table "
             "window mirror").split()
    ann = {str(5000 + i): {"imageId": f"img{i % n_imgs}",
                           "question": f"is there a {words[i % len(words)]}"
                                       f" near the {words[(i+3) % len(words)]} ?"}
           for i in range(n_q)}
    ann_path = str(tmp_path / "test_en.json")
    json.dump(ann, open(ann_path, "w"))

    dataroot = tmp_path / "dataroot"
    dataroot.mkdir()
    (dataroot / "cache").mkdir()      # the reference pickles tokenized
    # entries here and assumes the dir exists (train_task creates it)
    label2ans = [f"ans{k}" for k in range(L)]
    ans2label = {a: k for k, a in enumerate(label2ans)}
    pickle.dump(ans2label, open(dataroot / "trainval_ans2label.pkl", "wb"))
    pickle.dump(label2ans, open(dataroot / "trainval_label2ans.pkl", "wb"))

    cfg = UC2Config(vocab_size=1000, hidden_size=96, num_layers=n_blocks,
                    num_heads=4, intermediate_size=384, v_feature_size=2048,
                    num_locs=7, pooler_size=96, clf_hidden_size=96,
                    num_labels=L)
    params = uc2.init_params(jax.random.key(7), cfg)

    # ---- OUR eval ------------------------------------------------------
    tok = HFTokenizer(TINY_TOK)
    entries = load_entries(str(dataroot), "test_en", ann_path)
    ds = GQADataset(entries, CfsReader(cfs_path), tok,
                    max_seq_length=seq_len, max_region_num=max_regions,
                    num_locs=7, num_labels=L)
    out_ours = str(tmp_path / "test_en_result.json")
    runner.run_eval(uc2.forward, params, cfg, ds, label2ans, batch_size=8,
                    compute_dtype=None, out_path=out_ours)
    ours = {e["questionId"]: e["prediction"]
            for e in json.load(open(out_ours))}

    # ---- the REFERENCE flow over the same artifacts --------------------
    _install_reference_stubs()
    import torch
    from transformers import AutoTokenizer
    from volta.config import BertConfig
    from volta.encoders import BertForVLTasks
    from volta.datasets._image_features_reader import ImageFeaturesH5Reader
    from volta.datasets.gqa_dataset_semantic_code_mix import (
        GQAClassificationDataset)
    sys.path.insert(0, os.path.dirname(__file__))
    from tools_cfg_helper import make_ref_cfg_dict

    lmdb_path = str(tmp_path / "feat_lmdb")
    assert cfs_to_lmdb(cfs_path, lmdb_path) == n_imgs

    ref_cfg = BertConfig.from_dict(make_ref_cfg_dict(n_blocks, vfeat=2048))
    ref_cfg.norm_embeddings = False          # UC2: no feature normalization
    reader = ImageFeaturesH5Reader(lmdb_path, ref_cfg, in_memory=False)
    ref_tok = AutoTokenizer.from_pretrained(TINY_TOK)
    dset = GQAClassificationDataset(
        task="GQA-ci", dataroot=str(dataroot),
        annotations_jsonpath=ann_path, split="test_en",
        image_features_reader=reader, gt_image_features_reader=None,
        tokenizer=ref_tok, bert_model=TINY_TOK,
        padding_index=ref_tok.pad_token_id, max_seq_length=seq_len,
        max_region_num=max_regions, num_locs=7, add_global_imgfeat=None)

    task_cfg = {"TASK15": {"type": "VL-classifier-GQA", "num_labels": L}}
    model = BertForVLTasks(ref_cfg, task_cfg, ["TASK15"])
    exported = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in pytree_to_volta_uc2(params).items()}
    _, unexpected = model.load_state_dict(exported, strict=False)
    assert not unexpected, unexpected
    model.eval()

    loader = torch.utils.data.DataLoader(dset, batch_size=8, shuffle=False)
    results = []
    for batch in loader:
        (features, spatials, image_mask, question, _target, input_mask,
         segment_ids, question_id, _ixs) = batch
        with torch.no_grad():
            vil_prediction, _, _, _ = model(
                question, features, spatials, "TASK15", segment_ids,
                input_mask, image_mask)
        logits = torch.max(vil_prediction, 1)[1].data
        for i in range(logits.size(0)):
            results.append({"questionId": str(question_id[i].item()),
                            "prediction":
                                dset.label2ans[logits[i].item()]})
    out_ref = str(tmp_path / "ref_test_en_result.json")
    json.dump(results, open(out_ref, "w"))

    theirs = {e["questionId"]: e["prediction"]
              for e in json.load(open(out_ref))}
    assert set(theirs) == {str(5000 + i) for i in range(n_q)}
    assert ours == theirs
