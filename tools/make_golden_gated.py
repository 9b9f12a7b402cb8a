"""Golden-parity fixtures for the general gated encoder (models/gated.py)
by running the REFERENCE torch stack (volta/volta/encoders.py BertForVLTasks)
in-process on five shrunk wirings that jointly exercise every code path of
the machinery:

  vilbert-style    dual-stream: text-only (tt) and vision-only (vv)
                   sublayers, a tv+vt co-attention sublayer, dual
                   ViLBertImageEmbeddings, fusion mul, model=bert
  lxmert-style     dual-stream with LxmertImageEmbeddings, a per-sublayer
                   intermediate-size override, fusion sum
  visualbert-style single-stream: all four gates, shared, single-LN,
                   VisualBertEmbeddings, fusion text
  uniter-style     single-stream, all four gates but NOT shared (dual LN,
                   separate v_* weights), UniterEmbeddings, model=roberta,
                   fusion mul
  vl-bert-style    single-stream shared, VLBertEmbeddings (coordinate
                   embeddings, end token, position surgery),
                   fusion vl-bert_vqa (VLBertTextPooler)

Each fixture stores the state dict, inputs, logits and pooled outputs.
Run once:  python tools/make_golden_gated.py
Output:    tests/fixtures/gated_golden_{name}.npz
"""
import json
import os
import sys
import types

import numpy as np

for name in ["boto3", "requests", "botocore", "botocore.exceptions",
             "tensorboardX"]:
    sys.modules.setdefault(name, types.ModuleType(name))
sys.modules["botocore.exceptions"].ClientError = Exception

sys.path.insert(0, "/root/reference/volta")
import torch  # noqa: E402

# VisualBertEmbeddings hardcodes .cuda() on its visual position ids
# (embeddings.py:457, :460) — neutralize for this CPU-only generator
torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
from volta.config import BertConfig  # noqa: E402
from volta.encoders import BertForVLTasks  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
OUTDIR = os.path.join(HERE, "..", "tests", "fixtures")

H, HEADS, F, V, VF, LABELS = 96, 4, 384, 500, 64, 50

BASE = dict(
    attention_probs_dropout_prob=0.1, hidden_act="gelu",
    hidden_dropout_prob=0.1, hidden_size=H, initializer_range=0.02,
    intermediate_size=F, max_position_embeddings=128,
    num_attention_heads=HEADS, pooler_size=H, type_vocab_size=3,
    vocab_size=V, pad_token_id=0, num_locs=5, add_global_imgfeat=None,
    model="bert", v_attention_probs_dropout_prob=0.1, v_hidden_act="gelu",
    v_hidden_dropout_prob=0.1, v_feature_size=VF,
    visual_target_weights={"0": 1.0}, v_hidden_size=H,
    v_initializer_range=0.02, v_pooler_size=H, v_num_attention_heads=HEADS,
    v_intermediate_size=F, layer_norm_eps=1e-12, clf_hidden_size=H,
    v_coordinate_embeddings_dim=VF // 8,
    sublayer2attn_hidden_size={}, sublayer2num_attention_heads={},
    sublayer2intermediate_size={}, sublayer2v_attn_hidden_size={},
    sublayer2v_num_attention_heads={}, sublayer2v_intermediate_size={},
    bert_layer2attn_sublayer={}, bert_layer2ff_sublayer={},
)


def wirings():
    yield "vilbert", dict(
        BASE, image_embeddings="vilbert", fusion_method="mul",
        tt_attn_sublayers=[0], t_ff_sublayers=[1, 5],
        vv_attn_sublayers=[2], v_ff_sublayers=[3, 5],
        tv_attn_sublayers=[4], vt_attn_sublayers=[4],
        shared_sublayers=[], single_ln_sublayers=[])
    yield "lxmert", dict(
        BASE, image_embeddings="lxmert", fusion_method="sum",
        tt_attn_sublayers=[0], t_ff_sublayers=[1, 5],
        vv_attn_sublayers=[2], v_ff_sublayers=[3, 5],
        tv_attn_sublayers=[4], vt_attn_sublayers=[4],
        shared_sublayers=[], single_ln_sublayers=[],
        sublayer2intermediate_size={"1": 2 * F})
    yield "visualbert", dict(
        BASE, image_embeddings="visualbert", fusion_method="text",
        tt_attn_sublayers=[0, 2], tv_attn_sublayers=[0, 2],
        vt_attn_sublayers=[0, 2], vv_attn_sublayers=[0, 2],
        t_ff_sublayers=[1, 3], v_ff_sublayers=[1, 3],
        shared_sublayers=[0, 1, 2, 3], single_ln_sublayers=[0, 1, 2, 3])
    yield "uniter", dict(
        BASE, image_embeddings="uniter", fusion_method="mul",
        model="roberta", pad_token_id=1,
        tt_attn_sublayers=[0, 2], tv_attn_sublayers=[0, 2],
        vt_attn_sublayers=[0, 2], vv_attn_sublayers=[0, 2],
        t_ff_sublayers=[1, 3], v_ff_sublayers=[1, 3],
        shared_sublayers=[], single_ln_sublayers=[])
    yield "vl-bert", dict(
        BASE, image_embeddings="vl-bert", fusion_method="vl-bert_vqa",
        tt_attn_sublayers=[0, 2], tv_attn_sublayers=[0, 2],
        vt_attn_sublayers=[0, 2], vv_attn_sublayers=[0, 2],
        t_ff_sublayers=[1, 3], v_ff_sublayers=[1, 3],
        shared_sublayers=[0, 1, 2, 3], single_ln_sublayers=[])


def main():
    os.makedirs(OUTDIR, exist_ok=True)
    for name, cfg_dict in wirings():
        torch.manual_seed(hash(name) % (2 ** 31))
        config = BertConfig.from_dict(cfg_dict)
        task_cfg = {"TASK15": {"type": "VL-classifier-GQA",
                               "num_labels": LABELS}}
        model = BertForVLTasks(config, task_cfg, ["TASK15"])
        model.eval()

        rng = np.random.RandomState(11)
        B, T, R = 3, 10, 6
        pad = cfg_dict["pad_token_id"]
        txt = rng.randint(3, V, (B, T)).astype(np.int64)
        txt[:, 0] = 2
        txt[0, -3:] = pad
        tmask = (txt != pad).astype(np.int64)
        feats = rng.randn(B, R, VF).astype(np.float32)
        if name == "vl-bert":
            feats[1, -2:] = 0.0     # all-zero rows hit the mvrc mask path
        locs = rng.rand(B, R, 5).astype(np.float32)
        vmask = np.ones((B, R), np.int64)
        vmask[2, -2:] = 0

        with torch.no_grad():
            logits, _, _, _ = model(
                torch.from_numpy(txt), torch.from_numpy(feats.copy()),
                torch.from_numpy(locs), "TASK15",
                attention_mask=torch.from_numpy(tmask),
                image_attention_mask=torch.from_numpy(vmask))
            seq_t, seq_v, pooled_t, pooled_v, _ = model.bert(
                torch.from_numpy(txt), torch.from_numpy(feats.copy()),
                torch.from_numpy(locs), None,
                torch.from_numpy(tmask), torch.from_numpy(vmask))

        sd = {f"sd::{k}": v.numpy() for k, v in model.state_dict().items()}
        out = os.path.join(OUTDIR, f"gated_golden_{name}.npz")
        np.savez_compressed(
            out, cfg_json=np.array(json.dumps(cfg_dict)),
            input_ids=txt, input_mask=tmask, features=feats, locs=locs,
            image_mask=vmask, logits=logits.numpy(),
            seq_t=seq_t.numpy(), seq_v=seq_v.numpy(),
            pooled_t=pooled_t.numpy(),
            pooled_v=(pooled_v.numpy() if pooled_v is not None
                      else np.zeros(0)),
            **sd)
        print(f"wrote {out}: logits {tuple(logits.shape)}, "
              f"{len(sd)} sd tensors")


if __name__ == "__main__":
    main()
