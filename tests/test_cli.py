"""CLI smoke: a miniature on-disk world (target pkls, answer vocab, task
YAML, CFS store) driven through `python -m clg_vqa_tpu.cli` train/eval/score."""
import json
import os
import pickle

import numpy as np
import pytest

from clg_vqa_tpu.cli.__main__ import main
from clg_vqa_tpu.data.cfs import CfsWriter
from clg_vqa_tpu.data.features import RegionRecord


@pytest.fixture(scope="module")
def cli_world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    r = np.random.RandomState(0)
    L, n_imgs, n_q = 6, 6, 48
    dataroot = tmp / "annotations"
    dataroot.mkdir()
    label2ans = [f"ans{k}" for k in range(L)]
    ans2label = {a: i for i, a in enumerate(label2ans)}
    pickle.dump(ans2label, open(dataroot / "trainval_ans2label.pkl", "wb"))
    pickle.dump(label2ans, open(dataroot / "trainval_label2ans.pkl", "wb"))

    def items(lo, hi):
        return [{"question_id": i, "image_id": f"i{i % n_imgs}",
                 "question": f"marker{i % L} thing ?", "labels": [i % L],
                 "scores": [1.0]} for i in range(lo, hi)]

    pickle.dump(items(0, n_q), open(dataroot / "train_target.pkl", "wb"))
    pickle.dump(items(0, 16), open(dataroot / "val_target.pkl", "wb"))
    test_d = {str(9000 + i): {"imageId": f"i{i % n_imgs}",
                              "question": f"marker{i % L} thing ?",
                              "answer": f"ans{i % L}"} for i in range(12)}
    json.dump(test_d, open(dataroot / "testdev_balanced_questions.json", "w"))

    store = tmp / "f.cfs"
    with CfsWriter(str(store)) as w:
        for i in range(n_imgs):
            n = r.randint(3, 8)
            boxes = np.stack([r.rand(n) * 40, r.rand(n) * 40,
                              50 + r.rand(n) * 40, 50 + r.rand(n) * 40],
                             1).astype(np.float32)
            w.add(RegionRecord(f"i{i}", r.randn(n, 16).astype(np.float32),
                               boxes, 100.0, 100.0))

    model_cfg = {
        "attention_probs_dropout_prob": 0.1, "hidden_act": "gelu",
        "hidden_dropout_prob": 0.1, "hidden_size": 32,
        "initializer_range": 0.02, "intermediate_size": 64,
        "max_position_embeddings": 514, "num_attention_heads": 2,
        "pooler_size": 32, "type_vocab_size": 2, "vocab_size": 128,
        "pad_token_id": 1, "num_locs": 7, "add_global_imgfeat": None,
        "image_embeddings": "uc2", "model": "roberta",
        "v_attention_probs_dropout_prob": 0.1, "v_hidden_act": "gelu",
        "v_hidden_dropout_prob": 0.1, "v_feature_size": 16,
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

    yaml_text = f"""TASK15:
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
"""
    (tmp / "task.yml").write_text(yaml_text)
    return tmp


def _common(tmp, out):
    return ["--config_file", str(tmp / "model.json"),
            "--tasks_config_file", str(tmp / "task.yml"),
            "--output_dir", str(tmp / out), "--fp32"]


def test_cli_train_eval_score(cli_world, capsys):
    tmp = cli_world
    main(["train", *_common(tmp, "ft"), "--grad_acc_steps", "2"])
    assert os.path.isdir(tmp / "ft" / "params_best")
    out = capsys.readouterr().out
    assert "Best validation score" in out

    main(["eval", *_common(tmp, "ev"),
          "--from_pretrained", str(tmp / "ft" / "params_best"),
          "--split", "test"])
    res_file = tmp / "ev" / "test_result.json"
    assert res_file.exists()
    preds = json.load(open(res_file))
    assert len(preds) == 12

    main(["score", "--preds_file", str(res_file), "--truth_file",
          str(tmp / "annotations" / "testdev_balanced_questions.json")])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert 0.0 <= float(out) <= 100.0


def test_cli_prune_then_sft(cli_world, capsys):
    tmp = cli_world
    main(["prune", *_common(tmp, "imp"), "--grad_acc_steps", "2"])
    assert (tmp / "imp" / "mask_best.npz").exists()
    first = capsys.readouterr().out
    assert "IMP best epoch" in first
    # prune --resume on the COMPLETED run: replays the recorded result from
    # prune_meta.json without retraining (full kill/resume semantics in
    # tests/test_prune_resume.py)
    main(["prune", *_common(tmp, "imp"), "--grad_acc_steps", "2", "--resume"])
    resumed = capsys.readouterr().out
    line = [l for l in first.splitlines() if "IMP best epoch" in l][0]
    assert line in resumed
    main(["sft", *_common(tmp, "sft"), "--grad_acc_steps", "2",
          "--mask_file", str(tmp / "imp" / "mask_best.npz")])
    out = capsys.readouterr().out
    assert "SFT best validation score" in out
    assert (tmp / "sft" / "model_best_sft.bin").exists()
