"""Generate golden-parity fixtures for UC2 by running the *reference* torch
model (read-only at /root/reference) on a shrunk config with random weights.

The fixture stores the torch state_dict, the inputs, and the reference
logits/pooled outputs; tests then convert the state_dict with
clg_vqa_tpu.utils.convert and assert our JAX forward matches.

Run once:  python tools/make_golden_uc2.py
Output:    tests/fixtures/uc2_golden.npz
"""
import sys
import types
import os

import numpy as np

# Stub network-only deps so the reference imports on this machine.
for name in ["boto3", "requests", "botocore", "botocore.exceptions",
             "tensorboardX"]:
    sys.modules.setdefault(name, types.ModuleType(name))
sys.modules["botocore.exceptions"].ClientError = Exception

sys.path.insert(0, "/root/reference/volta")
import torch  # noqa: E402
from volta.config import BertConfig  # noqa: E402
from volta.encoders import BertForVLTasks  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tests", "fixtures", "uc2_golden.npz")

N_BLOCKS = 3
H, HEADS, F, V, VF, LOCS, LABELS = 96, 4, 384, 1000, 64, 7, 50

cfg_dict = dict(
    attention_probs_dropout_prob=0.1, hidden_act="gelu",
    hidden_dropout_prob=0.1, hidden_size=H, initializer_range=0.02,
    intermediate_size=F, max_position_embeddings=514,
    num_attention_heads=HEADS, pooler_size=H, type_vocab_size=2,
    vocab_size=V, pad_token_id=1, num_locs=LOCS, add_global_imgfeat=None,
    image_embeddings="uc2", model="roberta",
    v_attention_probs_dropout_prob=0.1, v_hidden_act="gelu",
    v_hidden_dropout_prob=0.1, v_feature_size=VF,
    visual_target_weights={"0": 1.0}, v_hidden_size=H,
    v_initializer_range=0.02, v_pooler_size=H, v_num_attention_heads=HEADS,
    v_intermediate_size=F, layer_norm_eps=1e-5, fusion_method="text",
    clf_hidden_size=H,
    tt_attn_sublayers=list(range(0, 2 * N_BLOCKS, 2)),
    tv_attn_sublayers=list(range(0, 2 * N_BLOCKS, 2)),
    vt_attn_sublayers=list(range(0, 2 * N_BLOCKS, 2)),
    vv_attn_sublayers=list(range(0, 2 * N_BLOCKS, 2)),
    t_ff_sublayers=list(range(1, 2 * N_BLOCKS, 2)),
    v_ff_sublayers=list(range(1, 2 * N_BLOCKS, 2)),
    shared_sublayers=list(range(2 * N_BLOCKS)),
    single_ln_sublayers=list(range(2 * N_BLOCKS)),
    sublayer2attn_hidden_size={}, sublayer2num_attention_heads={},
    sublayer2intermediate_size={}, sublayer2v_attn_hidden_size={},
    sublayer2v_num_attention_heads={}, sublayer2v_intermediate_size={},
    bert_layer2attn_sublayer={str(i): 2 * i for i in range(N_BLOCKS)},
    bert_layer2ff_sublayer={str(i): 2 * i + 1 for i in range(N_BLOCKS)},
)


def main():
    torch.manual_seed(0)
    config = BertConfig.from_dict(cfg_dict)
    task_cfg = {"TASK15": {"type": "VL-classifier-GQA", "num_labels": LABELS}}
    model = BertForVLTasks(config, task_cfg, ["TASK15"])
    model.eval()

    rng = np.random.RandomState(7)
    B, T, R = 3, 12, 8
    txt = rng.randint(3, V, (B, T)).astype(np.int64)
    txt[:, 0] = 0
    txt[0, -4:] = 1           # padded text row
    tmask = (txt != 1).astype(np.int64)
    feats = rng.randn(B, R, VF).astype(np.float32)
    locs = rng.rand(B, R, LOCS).astype(np.float32)
    vmask = np.ones((B, R), np.int64)
    vmask[1, -3:] = 0         # padded vision row

    with torch.no_grad():
        logits, _, _, _ = model(
            torch.from_numpy(txt), torch.from_numpy(feats),
            torch.from_numpy(locs), "TASK15",
            attention_mask=torch.from_numpy(tmask),
            image_attention_mask=torch.from_numpy(vmask))
        # also capture pooled output for finer-grained debugging
        _, _, pooled_t, _, _ = model.bert(
            torch.from_numpy(txt), torch.from_numpy(feats),
            torch.from_numpy(locs), None,
            torch.from_numpy(tmask), torch.from_numpy(vmask))

    sd = {f"sd::{k}": v.numpy() for k, v in model.state_dict().items()}
    np.savez_compressed(
        OUT,
        input_ids=txt, input_mask=tmask, features=feats, locs=locs,
        image_mask=vmask, logits=logits.numpy(), pooled=pooled_t.numpy(),
        n_blocks=np.array(N_BLOCKS), **sd)
    print(f"wrote {OUT}: logits {logits.shape}, {len(sd)} sd tensors")


if __name__ == "__main__":
    main()
