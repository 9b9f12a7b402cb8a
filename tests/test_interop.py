"""Checkpoint interop: weights exported by our framework load into the
REFERENCE torch stack and reproduce identical logits (the reverse direction
of the golden-parity tests). Skipped when the reference checkout is absent."""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/volta"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_exported_uc2_loads_into_reference():
    for m in ["boto3", "requests", "botocore", "botocore.exceptions",
              "tensorboardX"]:
        sys.modules.setdefault(m, types.ModuleType(m))
    sys.modules["botocore.exceptions"].ClientError = Exception
    sys.path.insert(0, REF)
    import torch
    from volta.config import BertConfig
    from volta.encoders import BertForVLTasks

    from clg_vqa_tpu.config import UC2Config
    from clg_vqa_tpu.utils.convert import (normalize_volta_keys,
                                           pytree_to_volta_uc2,
                                           volta_uc2_to_pytree)

    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "uc2_golden.npz")
    if not os.path.exists(fixture):
        pytest.skip("run tools/make_golden_uc2.py first")
    g = np.load(fixture)
    n_blocks = int(g["n_blocks"])
    cfg = UC2Config(vocab_size=1000, hidden_size=96, num_layers=n_blocks,
                    num_heads=4, intermediate_size=384, v_feature_size=64,
                    num_locs=7, pooler_size=96, clf_hidden_size=96,
                    num_labels=50)
    sd0 = {k[len("sd::"):]: g[k] for k in g.files if k.startswith("sd::")}
    params = volta_uc2_to_pytree(normalize_volta_keys(sd0), cfg)

    # export with VOLTA names and load into the reference model
    exported = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in pytree_to_volta_uc2(params).items()}

    sys.path.insert(0, os.path.dirname(__file__))
    from tools_cfg_helper import make_ref_cfg_dict
    ref_cfg = BertConfig.from_dict(make_ref_cfg_dict(n_blocks))
    task_cfg = {"TASK15": {"type": "VL-classifier-GQA", "num_labels": 50}}
    model = BertForVLTasks(ref_cfg, task_cfg, ["TASK15"])
    missing, unexpected = model.load_state_dict(exported, strict=False)
    # only reference-side extras (tied aliases etc.) may be missing
    assert not [k for k in unexpected], unexpected
    model.eval()

    with torch.no_grad():
        logits, _, _, _ = model(
            torch.from_numpy(g["input_ids"]),
            torch.from_numpy(g["features"]),
            torch.from_numpy(g["locs"]), "TASK15",
            attention_mask=torch.from_numpy(g["input_mask"]),
            image_attention_mask=torch.from_numpy(g["image_mask"]))
    np.testing.assert_allclose(logits.numpy(), g["logits"],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_exported_m3p_loads_into_reference():
    for m in ["boto3", "requests", "botocore", "botocore.exceptions",
              "tensorboardX"]:
        sys.modules.setdefault(m, types.ModuleType(m))
    sys.modules["botocore.exceptions"].ClientError = Exception
    sys.path.insert(0, REF)
    import torch
    from volta.config import M3PConfig as RefM3PConfig
    from volta.encoders import M3PForVLTasks

    from clg_vqa_tpu.config import M3PConfig
    from clg_vqa_tpu.utils.convert import (pytree_to_volta_m3p,
                                           volta_m3p_to_pytree)

    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "m3p_golden.npz")
    if not os.path.exists(fixture):
        pytest.skip("run tools/make_golden_m3p.py first")
    g = np.load(fixture)
    cfg = M3PConfig(vocab_size=500, hidden_size=96,
                    num_layers=int(g["n_layers"]), num_heads=4,
                    intermediate_size=384, v_feature_size=2048, num_locs=5,
                    pooler_size=96, clf_hidden_size=192, num_labels=50,
                    max_boxes=8)
    sd0 = {k[len("sd::"):]: g[k] for k in g.files if k.startswith("sd::")}
    params = volta_m3p_to_pytree(sd0, cfg)
    exported = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in pytree_to_volta_m3p(params).items()}

    cfg_dict = dict(
        hidden_size=96, n_heads=4, n_layers=int(g["n_layers"]),
        intermediate_size=384, pooler_size=96, hidden_dropout_prob=0.1,
        attention_probs_dropout_prob=0.1, max_position_embeddings=514,
        type_vocab_size=1, vocab_size=500, pad_token_id=1, num_locs=5,
        image_embeddings="m3p", model="roberta", v_feature_size=2048,
        v_hidden_size=96, v_num_attention_heads=4, v_intermediate_size=384,
        norm_embeddings=True, fusion_method="text", itm_dim=1,
        clf_hidden_size=192, emb_dim=96, n_words=500, n_langs=2,
        id2lang={0: "en", 1: "de"}, lang2id={"en": 0, "de": 1}, eos_index=2,
        pad_index=1, dropout=0.1, attention_dropout=0.1,
        sinusoidal_embeddings=False, refine_layers=1, attention_setting="v1",
        use_externel_att=False, gelu_activation=True, max_boxes=8,
        visualization=False)
    torch.manual_seed(0)
    ref_cfg = RefM3PConfig.from_dict(cfg_dict)
    task_cfg = {"TASK15": {"type": "VL-classifier-GQA", "num_labels": 50}}
    model = M3PForVLTasks(ref_cfg, task_cfg, ["TASK15"])
    missing, unexpected = model.load_state_dict(exported, strict=False)
    assert not list(unexpected), unexpected
    model.eval()
    with torch.no_grad():
        logits, _, _, _ = model(
            torch.from_numpy(g["input_ids"]),
            torch.from_numpy(g["features"]),
            torch.from_numpy(g["locs"]), "TASK15",
            attention_mask=torch.from_numpy(g["input_mask"]),
            image_attention_mask=torch.from_numpy(g["image_mask"]))
    np.testing.assert_allclose(logits.numpy(), g["logits"],
                               rtol=1e-5, atol=1e-6)


def test_hf_xlmr_state_dict_loads_via_collapse_renumbering():
    """A raw HF-style XLM-R state dict (roberta.* names, .attention.self.,
    per-LAYER numbering) loads through the UC2 sublayer-collapse
    renumbering (conversions/convert_uc2.py:26 + utils.py:483-518):
    text-encoder weights land in the right sublayers, parts the HF ckpt
    lacks keep a fresh init."""
    import jax
    import numpy as np
    from clg_vqa_tpu.config import UC2Config
    from clg_vqa_tpu.models import uc2
    from clg_vqa_tpu.utils.convert import (hf_xlmr_to_uc2_pytree,
                                           pytree_to_volta_uc2)
    cfg = UC2Config(vocab_size=64, hidden_size=16, num_layers=2, num_heads=2,
                    intermediate_size=32, v_feature_size=8, num_locs=5,
                    pooler_size=16, clf_hidden_size=16, num_labels=4)
    sd = pytree_to_volta_uc2(uc2.init_params(jax.random.key(1), cfg))

    # invert the volta naming back to HF style for the encoder slice,
    # doubling values as a provenance marker
    hf = {}
    for k, v in sd.items():
        if ".layer." in k:
            num = int(k.split(".layer.")[-1].split(".")[0])
            if "attention_" in k and num % 2 == 0:
                nk = k.replace(f".layer.{num}.attention_",
                               f".layer.{num // 2}.attention.")
            elif num % 2 == 1 and (".intermediate." in k or ".output." in k):
                nk = k.replace(f".layer.{num}.", f".layer.{num // 2}.")
            else:
                continue
        elif k == "bert.embeddings.word_embeddings.weight":
            nk = k
        else:
            continue
        hf[nk.replace("bert.", "roberta.")] = np.asarray(v) * 2.0

    out = hf_xlmr_to_uc2_pytree(hf, cfg, seed=0)
    flat = pytree_to_volta_uc2(out)
    base = pytree_to_volta_uc2(uc2.init_params(jax.random.key(0), cfg))
    for k in ("bert.encoder.layer.0.attention_self.query.weight",
              "bert.encoder.layer.1.intermediate.dense.weight",
              "bert.encoder.layer.1.output.LayerNorm.weight",
              "bert.embeddings.word_embeddings.weight"):
        np.testing.assert_allclose(flat[k], np.asarray(sd[k]) * 2.0,
                                   rtol=1e-6, err_msg=k)
    # absent from the HF dict -> fresh seed-0 init preserved
    for k in ("bert.embeddings.image_embeddings.weight",
              "bert.t_pooler.dense.weight"):
        if k in base:
            np.testing.assert_allclose(flat[k], base[k], rtol=1e-6,
                                       err_msg=k)


def test_m3p_original_checkpoint_loads():
    """An original microsoft/M3P checkpoint (module.* names, the inventory
    the reference's conversion notebooks remap) loads into the M3P pytree:
    body weights land, absent parts (classifier) keep a fresh init."""
    import jax
    import numpy as np
    from clg_vqa_tpu.config import M3PConfig
    from clg_vqa_tpu.models import m3p
    from clg_vqa_tpu.utils.convert import (m3p_original_to_pytree,
                                           pytree_to_volta_m3p)
    cfg = M3PConfig(vocab_size=64, hidden_size=16, num_layers=2, num_heads=2,
                    intermediate_size=32, v_feature_size=8, num_locs=5,
                    pooler_size=16, clf_hidden_size=16, num_labels=4)
    sd = pytree_to_volta_m3p(m3p.init_params(jax.random.key(1), cfg))
    orig = {("module." + k[len("bert.encoder."):]): np.asarray(v) * 2.0
            for k, v in sd.items() if k.startswith("bert.encoder.")}
    out = m3p_original_to_pytree(orig, cfg, seed=0)
    flat = pytree_to_volta_m3p(out)
    base = pytree_to_volta_m3p(m3p.init_params(jax.random.key(0), cfg))
    for k in ("bert.encoder.attentions.0.q_lin.weight",
              "bert.encoder.ffns.1.lin2.bias",
              "bert.encoder.image_embeddings.image_embeddings.weight",
              "bert.encoder.pooled_layer.dense.weight"):
        np.testing.assert_allclose(flat[k], np.asarray(sd[k]) * 2.0,
                                   rtol=1e-6, err_msg=k)
    for k in flat:
        if k.startswith("clfs_dict."):
            np.testing.assert_allclose(flat[k], base[k], rtol=1e-6,
                                       err_msg=k)
