"""embed_clf wiring (VERDICT r1 #6): classifier output initialized from mean
answer word-embeddings (train_task.py:218-238), including the sorted-
iteration row-order quirk, and the flag-on CLI path."""
import json
import os
import pickle

import numpy as np
import pytest

import jax

from clg_vqa_tpu.cli import common as C
from clg_vqa_tpu.config import UC2Config
from clg_vqa_tpu.data.tokenizer import HFTokenizer
from clg_vqa_tpu.models import uc2

FIXTURE_TOK = os.path.join(os.path.dirname(__file__), "fixtures",
                           "tiny_xlmr_tok")


@pytest.fixture(scope="module")
def setup():
    cfg = UC2Config(vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
                    intermediate_size=64, v_feature_size=16, num_locs=7,
                    pooler_size=32, clf_hidden_size=32, num_labels=3)
    params = uc2.init_params(jax.random.key(0), cfg)
    tok = HFTokenizer(FIXTURE_TOK)
    return cfg, params, tok


def _reference_loop(word, tok, ans2label):
    """Literal replication of train_task.py:224-233: append in
    sorted(ans2label.items()) order (sorted by answer STRING)."""
    rows = []
    for answer, _label in sorted(ans2label.items()):
        ids = tok.convert_tokens_to_ids(tok.tokenize(answer))
        if len(ids):
            rows.append(word[np.asarray(ids)].mean(0))
        else:
            unk = tok.convert_tokens_to_ids(tok.tokenize("<unk>"))[0]
            rows.append(word[unk])
    return np.stack(rows)


def test_rows_are_mean_word_embeddings(setup):
    cfg, params, tok = setup
    ans2label = {"window": 0, "apple": 1, "zebra crossing": 2}
    out = C.init_classifier_from_answers(params, tok, ans2label)
    word = np.asarray(params["embeddings"]["word"])
    expect = _reference_loop(word, tok, ans2label)
    got = np.asarray(out["classifier"]["fc2"]["w"]).T   # ours [hidden, L]
    np.testing.assert_allclose(got, expect, rtol=1e-6)
    # everything else untouched
    np.testing.assert_array_equal(
        np.asarray(out["classifier"]["fc1"]["w"]),
        np.asarray(params["classifier"]["fc1"]["w"]))


def test_sorted_iteration_order_quirk(setup):
    """Answer-string sort order != label-id order: row i carries the i-th
    SORTED answer's embedding (the reference quirk), not label i's."""
    cfg, params, tok = setup
    # label ids deliberately reversed vs string order
    ans2label = {"zebra": 0, "apple": 1, "mango": 2}
    out = C.init_classifier_from_answers(params, tok, ans2label)
    word = np.asarray(params["embeddings"]["word"])

    def mean_emb(ans):
        ids = tok.convert_tokens_to_ids(tok.tokenize(ans))
        return word[np.asarray(ids)].mean(0)

    got = np.asarray(out["classifier"]["fc2"]["w"]).T
    # sorted order: apple, mango, zebra -> rows 0,1,2
    np.testing.assert_allclose(got[0], mean_emb("apple"), rtol=1e-6)
    np.testing.assert_allclose(got[1], mean_emb("mango"), rtol=1e-6)
    np.testing.assert_allclose(got[2], mean_emb("zebra"), rtol=1e-6)
    # and NOT label-id order
    assert not np.allclose(got[0], mean_emb("zebra"))


def test_shape_guard_for_m3p_style_clf(setup):
    cfg, params, tok = setup
    import jax.numpy as jnp
    bad = dict(params)
    bad["classifier"] = dict(params["classifier"])
    bad["classifier"]["fc2"] = {"w": jnp.zeros((64, 3)),
                                "b": jnp.zeros((3,))}
    with pytest.raises(ValueError, match="clf_hidden"):
        C.init_classifier_from_answers(bad, tok, {"a": 0})


def test_cli_flag_initializes_runner_params(tmp_path, monkeypatch, capsys):
    """Flag-on training run reaches FinetuneRunner with the embedding-
    initialized classifier."""
    from clg_vqa_tpu.cli.__main__ import main
    from clg_vqa_tpu.data.cfs import CfsWriter
    from clg_vqa_tpu.data.features import RegionRecord
    from clg_vqa_tpu.train.driver import FinetuneRunner
    import sys
    if os.path.dirname(__file__) not in sys.path:
        sys.path.insert(0, os.path.dirname(__file__))
    from tools_cfg_helper import make_ref_cfg_dict  # noqa: E402

    r = np.random.RandomState(0)
    L = 3
    dataroot = tmp_path / "annotations"
    dataroot.mkdir()
    answers = ["zebra", "apple", "mango"]          # sorted != label order
    ans2label = {a: i for i, a in enumerate(answers)}
    pickle.dump(ans2label, open(dataroot / "trainval_ans2label.pkl", "wb"))
    pickle.dump(answers, open(dataroot / "trainval_label2ans.pkl", "wb"))
    items = [{"question_id": i, "image_id": f"i{i % 2}",
              "question": f"marker{i % L} thing ?", "labels": [i % L],
              "scores": [1.0]} for i in range(8)]
    pickle.dump(items, open(dataroot / "train_target.pkl", "wb"))
    pickle.dump(items, open(dataroot / "val_target.pkl", "wb"))
    store = str(tmp_path / "f.cfs")
    with CfsWriter(store) as w:
        for i in range(2):
            w.add(RegionRecord(f"i{i}", r.randn(4, 16).astype(np.float32),
                               (r.rand(4, 4) * 50 + [[0, 0, 50, 50]])
                               .astype(np.float32), 100.0, 100.0))
    model_json = str(tmp_path / "model.json")
    json.dump(make_ref_cfg_dict(2, hidden=32, heads=2, inter=64, vocab=128,
                                vfeat=16, labels=L), open(model_json, "w"))
    (tmp_path / "task.yml").write_text(f"""TASK15:
  name: GQA
  type: VL-classifier-GQA
  num_labels: {L}
  loss: CrossEntropyLoss
  dataroot: {dataroot}
  features_h5path1: {store}
  features_h5path2: {store}
  max_seq_length: 8
  max_region_num: 4
  batch_size: 4
  eval_batch_size: 4
  train_split: train
  val_split: val
  lr: 0.005
  num_epoch: 1
  semantic_lambda: 1
  embed_clf: true
""")

    captured = {}

    def fake_finetune(self, *, resume=False):
        captured["params0"] = jax.tree.map(np.asarray, self.params0)
        captured["tokenizer_vocab"] = None
        return 0.0

    monkeypatch.setattr(FinetuneRunner, "finetune", fake_finetune)
    main(["train", "--config_file", model_json,
          "--tasks_config_file", str(tmp_path / "task.yml"),
          "--output_dir", str(tmp_path / "run"), "--fp32",
          "--grad_acc_steps", "2", "--tokenizer", FIXTURE_TOK])
    assert "embed_clf: classifier initialized" in capsys.readouterr().out

    tok = HFTokenizer(FIXTURE_TOK)
    word = captured["params0"]["embeddings"]["word"]
    expect = _reference_loop(word, tok, ans2label)
    got = captured["params0"]["classifier"]["fc2"]["w"].T
    np.testing.assert_allclose(got, expect, rtol=1e-6)
