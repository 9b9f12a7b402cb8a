"""`cli extract` end-to-end + the composed L2->L6 provenance chain.

The reference's feature pipeline is a chain: the extractor writes region
features (detectron2_proposal_maxnms.py:181-220) -> store join
(features_extraction/datasets/gqa/gqa_boxes36_h5-to-tdlmdb.py:23-39) ->
training consumes the store (train_task.py). Here the same chain runs as
one scripted flow: `cli extract` (images dir -> CFS store, tiny-size C4
pipeline, random weights) -> `cli train` consumes the extracted store and
learns. Also the only previously-untested CLI command (cmd_extract: PIL
decode, lazy loaders, undecodable-file skip, --limit, --device_batch,
writer wiring) gets covered.
"""
import json
import os
import pickle

import numpy as np
import pytest

from clg_vqa_tpu.cli.__main__ import main
from clg_vqa_tpu.data.cfs import CfsReader

TINY = ["--short", "96", "--max_size", "160", "--pad_h", "128",
        "--pad_w", "160", "--num_boxes", "6", "--pre_nms_topk", "200",
        "--post_nms_topk", "50"]


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("chain")
    images = tmp / "images"
    images.mkdir()
    r = np.random.RandomState(0)
    from PIL import Image
    n_imgs = 7
    for i in range(n_imgs - 1):          # i0..i5: PNGs of varied sizes
        h, w = 80 + 10 * (i % 3), 100 + 12 * (i % 4)
        Image.fromarray((r.rand(h, w, 3) * 255).astype(np.uint8)).save(
            images / f"i{i}.png")
    # one .npy image (the extract driver accepts pre-decoded arrays) and one
    # undecodable file (must be skipped, not crash, not consume a record)
    np.save(images / f"i{n_imgs - 1}.npy",
            (r.rand(90, 110, 3) * 255).astype(np.uint8))
    (images / "notes.txt").write_text("not an image")
    return tmp, images, n_imgs


def test_extract_writes_store(world):
    tmp, images, n_imgs = world
    store = tmp / "ext.cfs"
    main(["extract", "--images", str(images), "--out", str(store),
          "--detector", "c4", "--device_batch", "2", *TINY])
    rd = CfsReader(str(store))
    assert sorted(rd.keys()) == [f"i{i}" for i in range(n_imgs)]
    for i in range(n_imgs):
        rec = rd.get(f"i{i}")
        assert rec.features.shape == (6, 2048)
        assert rec.boxes.shape == (6, 4)
        assert np.isfinite(rec.features).all()
        assert (rec.boxes[:, 2] <= rec.img_w + 1e-3).all()


def test_extract_limit(world):
    tmp, images, _ = world
    store = tmp / "lim.cfs"
    main(["extract", "--images", str(images), "--out", str(store),
          "--detector", "c4", "--limit", "3", *TINY])
    assert len(CfsReader(str(store)).keys()) == 3


def test_extracted_store_trains(world):
    """The composed handoff: train consumes the store `cli extract` wrote."""
    tmp, images, n_imgs = world
    store = tmp / "ext.cfs"
    if not store.exists():       # ordering-independent
        main(["extract", "--images", str(images), "--out", str(store),
              "--detector", "c4", *TINY])
    L, n_q = 6, 48
    dataroot = tmp / "annotations"
    dataroot.mkdir(exist_ok=True)
    label2ans = [f"ans{k}" for k in range(L)]
    pickle.dump({a: i for i, a in enumerate(label2ans)},
                open(dataroot / "trainval_ans2label.pkl", "wb"))
    pickle.dump(label2ans, open(dataroot / "trainval_label2ans.pkl", "wb"))

    def items(lo, hi):
        return [{"question_id": i, "image_id": f"i{i % n_imgs}",
                 "question": f"marker{i % L} thing ?", "labels": [i % L],
                 "scores": [1.0]} for i in range(lo, hi)]

    pickle.dump(items(0, n_q), open(dataroot / "train_target.pkl", "wb"))
    pickle.dump(items(0, 16), open(dataroot / "val_target.pkl", "wb"))

    model_cfg = {
        "attention_probs_dropout_prob": 0.1, "hidden_act": "gelu",
        "hidden_dropout_prob": 0.1, "hidden_size": 32,
        "initializer_range": 0.02, "intermediate_size": 64,
        "max_position_embeddings": 514, "num_attention_heads": 2,
        "pooler_size": 32, "type_vocab_size": 2, "vocab_size": 128,
        "pad_token_id": 1, "num_locs": 7, "add_global_imgfeat": None,
        "image_embeddings": "uc2", "model": "roberta",
        "v_attention_probs_dropout_prob": 0.1, "v_hidden_act": "gelu",
        "v_hidden_dropout_prob": 0.1, "v_feature_size": 2048,
        "visual_target_weights": {}, "v_hidden_size": 32,
        "v_initializer_range": 0.02, "v_pooler_size": 32,
        "v_num_attention_heads": 2, "v_intermediate_size": 64,
        "layer_norm_eps": 1e-5, "fusion_method": "text",
        "clf_hidden_size": 32,
        "tt_attn_sublayers": [0, 2], "tv_attn_sublayers": [0, 2],
        "vt_attn_sublayers": [0, 2], "vv_attn_sublayers": [0, 2],
        "t_ff_sublayers": [1, 3], "v_ff_sublayers": [1, 3],
        "shared_sublayers": [0, 1, 2, 3], "single_ln_sublayers": [0, 1, 2, 3],
        "sublayer2attn_hidden_size": {}, "sublayer2num_attention_heads": {},
        "sublayer2intermediate_size": {}, "sublayer2v_attn_hidden_size": {},
        "sublayer2v_num_attention_heads": {},
        "sublayer2v_intermediate_size": {},
        "bert_layer2attn_sublayer": {"0": 0, "1": 2},
        "bert_layer2ff_sublayer": {"0": 1, "1": 3},
    }
    json.dump(model_cfg, open(tmp / "model.json", "w"))
    (tmp / "task.yml").write_text(f"""TASK15:
  name: GQA
  type: VL-classifier-GQA
  num_labels: {L}
  loss: CrossEntropyLoss
  dataroot: {dataroot}
  features_h5path1: {store}
  features_h5path2: {store}
  max_seq_length: 8
  max_region_num: 6
  batch_size: 16
  eval_batch_size: 16
  train_split: train
  val_split: val
  lr: 0.005
  num_epoch: 1
  semantic_lambda: 1
  semantic_dict_path: ''
""")
    main(["train", "--config_file", str(tmp / "model.json"),
          "--tasks_config_file", str(tmp / "task.yml"),
          "--output_dir", str(tmp / "ft"), "--fp32",
          "--grad_acc_steps", "2"])
    assert os.path.isdir(tmp / "ft" / "params_best")
