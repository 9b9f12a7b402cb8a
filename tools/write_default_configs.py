"""Emit VOLTA-layout model JSONs and task YAML templates from our typed
config defaults (so experiment scripts are runnable without the reference
checkout). Run: python tools/write_default_configs.py [outdir=configs]"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from clg_vqa_tpu.config import M3PConfig, UC2Config  # noqa: E402


def uc2_json(cfg: UC2Config) -> dict:
    n = 2 * cfg.num_layers
    evens, odds = list(range(0, n, 2)), list(range(1, n, 2))
    return {
        "attention_probs_dropout_prob": cfg.attention_probs_dropout_prob,
        "hidden_act": "gelu", "hidden_dropout_prob": cfg.hidden_dropout_prob,
        "hidden_size": cfg.hidden_size,
        "initializer_range": cfg.initializer_range,
        "intermediate_size": cfg.intermediate_size,
        "max_position_embeddings": cfg.max_position_embeddings,
        "num_attention_heads": cfg.num_heads, "pooler_size": cfg.pooler_size,
        "type_vocab_size": cfg.type_vocab_size, "vocab_size": cfg.vocab_size,
        "pad_token_id": cfg.pad_token_id, "num_locs": cfg.num_locs,
        "add_global_imgfeat": cfg.add_global_imgfeat,
        "image_embeddings": "uc2", "model": "roberta",
        "v_attention_probs_dropout_prob": cfg.attention_probs_dropout_prob,
        "v_hidden_act": "gelu",
        "v_hidden_dropout_prob": cfg.hidden_dropout_prob,
        "v_feature_size": cfg.v_feature_size,
        "visual_target_weights": {"0": 1.0},
        "v_hidden_size": cfg.hidden_size, "v_initializer_range": 0.02,
        "v_pooler_size": 1024, "v_num_attention_heads": cfg.num_heads,
        "v_intermediate_size": cfg.intermediate_size,
        "layer_norm_eps": cfg.layer_norm_eps,
        "fusion_method": cfg.fusion_method,
        "clf_hidden_size": cfg.clf_hidden_size,
        "tt_attn_sublayers": evens, "tv_attn_sublayers": evens,
        "vt_attn_sublayers": evens, "vv_attn_sublayers": evens,
        "t_ff_sublayers": odds, "v_ff_sublayers": odds,
        "shared_sublayers": list(range(n)),
        "single_ln_sublayers": list(range(n)),
        "sublayer2attn_hidden_size": {}, "sublayer2num_attention_heads": {},
        "sublayer2intermediate_size": {}, "sublayer2v_attn_hidden_size": {},
        "sublayer2v_num_attention_heads": {},
        "sublayer2v_intermediate_size": {},
        "bert_layer2attn_sublayer": {str(i): 2 * i
                                     for i in range(cfg.num_layers)},
        "bert_layer2ff_sublayer": {str(i): 2 * i + 1
                                   for i in range(cfg.num_layers)},
    }


def m3p_json(cfg: M3PConfig) -> dict:
    return {
        "attention_probs_dropout_prob": cfg.attention_dropout,
        "hidden_act": "gelu", "hidden_dropout_prob": cfg.dropout,
        "hidden_size": cfg.hidden_size, "initializer_range": 0.02,
        "intermediate_size": cfg.intermediate_size,
        "max_position_embeddings": cfg.max_position_embeddings,
        "n_heads": cfg.num_heads, "n_layers": cfg.num_layers,
        "pooler_size": cfg.pooler_size, "type_vocab_size": 1,
        "vocab_size": cfg.vocab_size, "pad_token_id": cfg.pad_token_id,
        "num_locs": cfg.num_locs, "image_embeddings": "m3p",
        "model": "roberta", "v_attention_probs_dropout_prob": 0.1,
        "v_hidden_act": "gelu", "v_hidden_dropout_prob": 0.1,
        "v_feature_size": cfg.v_feature_size,
        "visual_target_weights": {"0": 1.0},
        "v_hidden_size": cfg.hidden_size, "v_initializer_range": 0.02,
        "v_pooler_size": cfg.pooler_size, "v_num_attention_heads": 12,
        "v_intermediate_size": cfg.intermediate_size,
        "norm_embeddings": cfg.norm_embeddings, "fusion_method": "text",
        "itm_dim": 1, "clf_hidden_size": cfg.clf_hidden_size,
        "max_boxes": cfg.max_boxes,
    }


TASK_YAML = """TASK15:
  name: GQA
  type: VL-classifier-GQA
  num_labels: 1842
  loss: CrossEntropyLoss
  process: normal
  task_id: 15
  dataroot: datasets/gqa/annotations
  features_h5path1: features/gqa-train_{feat}.cfs
  features_h5path2: features/gqa-valid_{feat}.cfs
  train_annotations_jsonpath: ''
  val_annotations_jsonpath: ''
  max_seq_length: 40
  max_region_num: {regions}
  batch_size: 256
  eval_batch_size: 1024
  train_split: train
  val_split: val
  lr: 0.00004
  num_epoch: 5
  ratio: 1
  cross: 0.9
  dictionary_path: datasets/dictionary/MUSE
  code_mixing: False
  semantic_dict_path: datasets/gqa/id2label/embedding_distance.pkl
  semantic_lambda: 10
"""


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "configs"
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "uc2_base.json"), "w") as f:
        json.dump(uc2_json(UC2Config()), f, indent=2)
    with open(os.path.join(out, "m3p_base.json"), "w") as f:
        json.dump(m3p_json(M3PConfig()), f, indent=2)
    with open(os.path.join(out, "gqa_boxes36.yml"), "w") as f:
        f.write(TASK_YAML.format(feat="boxes36", regions=36))
    with open(os.path.join(out, "gqa_X101.yml"), "w") as f:
        f.write(TASK_YAML.format(feat="X101", regions=100))
    print(f"wrote configs to {out}/")


if __name__ == "__main__":
    main()
