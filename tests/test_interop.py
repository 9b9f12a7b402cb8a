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
