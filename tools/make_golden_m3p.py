"""Generate golden-parity fixtures for M3P by running the reference torch
model (jointfwd path) on a shrunk config with random weights.

Run once:  python tools/make_golden_m3p.py
Output:    tests/fixtures/m3p_golden.npz
"""
import sys
import types
import os

import numpy as np

for name in ["boto3", "requests", "botocore", "botocore.exceptions",
             "tensorboardX"]:
    sys.modules.setdefault(name, types.ModuleType(name))
sys.modules["botocore.exceptions"].ClientError = Exception

sys.path.insert(0, "/root/reference/volta")
import torch  # noqa: E402
from volta.config import M3PConfig  # noqa: E402
from volta.encoders import M3PForVLTasks  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tests", "fixtures", "m3p_golden.npz")

N_LAYERS, H, HEADS, V, VF, LOCS, LABELS = 3, 96, 4, 500, 2048, 5, 50  # BertImageEmbeddings hardcodes Linear(2048,d) and Linear(5,d) (m3p_transformer.py:238-240)

cfg_dict = dict(
    hidden_size=H, n_heads=HEADS, n_layers=N_LAYERS, intermediate_size=4 * H,
    pooler_size=H, hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
    max_position_embeddings=514, type_vocab_size=1, vocab_size=V,
    pad_token_id=1, num_locs=LOCS, image_embeddings="m3p", model="roberta",
    v_feature_size=VF, v_hidden_size=H, v_num_attention_heads=HEADS,
    v_intermediate_size=4 * H, norm_embeddings=True, fusion_method="text",
    itm_dim=1, clf_hidden_size=2 * H,
    # jointfwd-path params read by M3PTransformerModel.__init__
    emb_dim=H, n_words=V, n_langs=2, id2lang={0: "en", 1: "de"},
    lang2id={"en": 0, "de": 1}, eos_index=2, pad_index=1, dropout=0.1,
    attention_dropout=0.1, sinusoidal_embeddings=False, refine_layers=1,
    attention_setting="v1", use_externel_att=False, gelu_activation=True,
    max_boxes=8, visualization=False,
)


def main():
    torch.manual_seed(0)
    config = M3PConfig.from_dict(cfg_dict)
    task_cfg = {"TASK15": {"type": "VL-classifier-GQA", "num_labels": LABELS}}
    model = M3PForVLTasks(config, task_cfg, ["TASK15"])
    model.eval()

    rng = np.random.RandomState(11)
    B, T, R = 3, 10, 6
    txt = rng.randint(3, V, (B, T)).astype(np.int64)
    txt[:, 0] = 0
    txt[0, -3:] = 1
    tmask = (txt != 1).astype(np.int64)
    feats = rng.randn(B, R, VF).astype(np.float32)
    locs = rng.rand(B, R, LOCS).astype(np.float32)
    vmask = np.ones((B, R), np.int64)
    vmask[1, -2:] = 0    # exercises the prefix-length mask quirk

    with torch.no_grad():
        logits, _, _, _ = model(
            torch.from_numpy(txt), torch.from_numpy(feats),
            torch.from_numpy(locs), "TASK15",
            attention_mask=torch.from_numpy(tmask),
            image_attention_mask=torch.from_numpy(vmask))
        seq, pooled = model.bert(
            torch.from_numpy(txt), torch.from_numpy(feats),
            torch.from_numpy(locs), None,
            torch.from_numpy(tmask), torch.from_numpy(vmask))

    # keep only jointfwd-path tensors (drop AoA/VAE/generation heads: big and
    # unused)
    keep_prefixes = (
        "bert.encoder.embeddings.", "bert.encoder.position_embeddings.",
        "bert.encoder.layer_norm_emb.", "bert.encoder.image_embeddings.",
        "bert.encoder.attentions.", "bert.encoder.layer_norm1.",
        "bert.encoder.ffns.", "bert.encoder.layer_norm2.",
        "bert.encoder.pooled_layer.", "clfs_dict.",
    )
    sd = {f"sd::{k}": v.numpy() for k, v in model.state_dict().items()
          if k.startswith(keep_prefixes)}
    np.savez_compressed(
        OUT, input_ids=txt, input_mask=tmask, features=feats, locs=locs,
        image_mask=vmask, logits=logits.numpy(), pooled=pooled.numpy(),
        sequence=seq.numpy(), n_layers=np.array(N_LAYERS), **sd)
    print(f"wrote {OUT}: logits {logits.shape}, {len(sd)} sd tensors")


if __name__ == "__main__":
    main()
