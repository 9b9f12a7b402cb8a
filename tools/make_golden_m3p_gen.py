"""Golden fixtures for the M3P GENERATION surface by driving the reference
M3PTransformerModel directly (volta/volta/m3p_transformer.py) on a shrunk
config: crossfwd (plain + causal-with-source), ImageEmbedding with the
AoA refiner, greedy generate(), generate_beam(), the predict() head
family, and the VAE latent modules.

Run once:  python tools/make_golden_m3p_gen.py
Output:    tests/fixtures/m3p_gen_golden.npz
"""
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
# the reference's generate() EOS backstop calls masked_fill_ with a .byte()
# mask (m3p_transformer.py:1312) — legal on the torch it was written for,
# rejected by modern torch; restore the old behavior for this generator
_orig_mf = torch.Tensor.masked_fill_
torch.Tensor.masked_fill_ = (
    lambda self, mask, value: _orig_mf(self, mask.bool(), value))

from volta.config import M3PConfig  # noqa: E402
from volta.m3p_transformer import M3PTransformerModel  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tests", "fixtures", "m3p_gen_golden.npz")

N_LAYERS, H, HEADS, V = 2, 64, 4, 300
REFINE_LAYERS = 2

cfg_dict = dict(
    hidden_size=H, n_heads=HEADS, n_layers=N_LAYERS, intermediate_size=4 * H,
    pooler_size=H, hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
    max_position_embeddings=128, type_vocab_size=1, vocab_size=V,
    pad_token_id=1, num_locs=5, image_embeddings="m3p", model="roberta",
    v_feature_size=2048, v_hidden_size=H, v_num_attention_heads=HEADS,
    v_intermediate_size=4 * H, norm_embeddings=True, fusion_method="text",
    itm_dim=1, clf_hidden_size=2 * H,
    emb_dim=H, n_words=V, n_langs=2, id2lang={0: "en", 1: "de"},
    lang2id={"en": 0, "de": 1}, eos_index=2, pad_index=1, dropout=0.1,
    attention_dropout=0.1, sinusoidal_embeddings=False,
    refine_layers=REFINE_LAYERS, attention_setting="v1",
    use_externel_att=False, gelu_activation=True, max_boxes=8,
    visualization=False, asm=False, share_inout_emb=True,
)


def main():
    torch.manual_seed(3)
    config = M3PConfig.from_dict(cfg_dict)
    model = M3PTransformerModel(config, is_encoder=True, with_output=True,
                                is_crossModal=True)
    model.eval()
    with torch.no_grad():
        # discourage <EOS> so greedy/beam run for several steps (random
        # weights otherwise emit EOS immediately); the bias is part of the
        # saved state dict, so both stacks see the same tilt
        model.pred_layer.proj.bias[2] = -8.0

    rng = np.random.RandomState(5)
    B, T, S_SRC, R = 3, 9, 7, 6
    x = rng.randint(3, V, (B, T)).astype(np.int64)
    lengths = np.array([T, T - 2, T - 4], np.int64)
    src_enc = rng.randn(B, S_SRC, H).astype(np.float32)
    src_len = np.array([S_SRC, S_SRC - 1, S_SRC - 3], np.int64)
    feats = rng.randn(R, B, 2048).astype(np.float32)   # (slen, bs, 2048)
    locs = rng.rand(R, B, 5).astype(np.float32)
    img_len = np.array([R, R - 1, R - 2], np.int64)

    with torch.no_grad():
        # 1. plain text crossfwd (encoder direction, no source)
        t_plain = model.crossfwd(x=torch.from_numpy(x.T),
                                 lengths=torch.from_numpy(lengths),
                                 causal=False, stream_="text")
        # 2. decoder direction: causal self-attn + cross-attn over src_enc
        t_causal = model.crossfwd(x=torch.from_numpy(x.T),
                                  lengths=torch.from_numpy(lengths),
                                  causal=True, stream_="text",
                                  src_enc=torch.from_numpy(src_enc),
                                  src_len=torch.from_numpy(src_len))
        # 3. ImageEmbedding + AoA refiner
        img_t, img_m = model.ImageEmbedding(
            x=torch.from_numpy(feats), lengths=torch.from_numpy(img_len),
            causal=False, image_loc=torch.from_numpy(locs),
            refine_image=True)
        # 4. greedy generation
        gen, gen_len = model.generate(torch.from_numpy(src_enc),
                                      torch.from_numpy(src_len),
                                      tgt_lang_id=None, max_len=12)
        # 5. beam generation
        beam, beam_len = model.generate_beam(
            torch.from_numpy(src_enc), torch.from_numpy(src_len),
            tgt_lang_id=0, beam_size=3, length_penalty=1.0,
            early_stopping=False, max_len=12)
        # 6. predict() heads over the causal decoder output
        # understanding heads consume batch-major tensors (BertPooler
        # takes hidden[:, 0] = position 0 per batch row)
        t_bm = t_causal.transpose(0, 1)
        rel = model.predict(t_bm, is_relation=True)
        clcm = model.predict(t_bm, is_clcm=True)
        mrfr = model.predict(t_bm, is_mrfr=True)
        pred_mask = torch.zeros(T, B, dtype=torch.bool)
        pred_mask[2, :] = True
        pred_mask[4, 0] = True
        y = torch.from_numpy(rng.randint(3, V, (int(pred_mask.sum()),)))
        mlm_scores, mlm_l = model.predict(t_causal, pred_mask=pred_mask,
                                          y=y, get_scores=True)
        obj_scores, _ = model.predict(t_causal.transpose(0, 1), y=None,
                                      is_obj=True) \
            if False else (None, None)
        # obj head: scores only (loss needs labels; compare scores)
        obj_h = model.transformer_obj(t_bm)
        obj_scores = model.pred_obj_layer.proj(obj_h)
        # 7. VAE latents (eval path: z = [mu; c]) + LatentDecoder
        vx = torch.from_numpy(rng.randn(B, H).astype(np.float32))
        vc = torch.from_numpy(rng.randn(B, H).astype(np.float32))
        v_out, _ = model.latent_transforms[0](vx, vc)
        ld_in = torch.from_numpy(rng.randn(B, T, H).astype(np.float32))
        ld_out = model.original_transforms[0](ld_in)

    sd = {f"sd::{k}": v.numpy() for k, v in model.state_dict().items()}
    np.savez_compressed(
        OUT,
        x=x, lengths=lengths, src_enc=src_enc, src_len=src_len,
        feats=feats, locs=locs, img_len=img_len,
        t_plain=t_plain.transpose(0, 1).numpy(),
        t_causal=t_causal.transpose(0, 1).numpy(),
        img_refined=img_t.numpy(), gen=gen.numpy(),
        gen_len=gen_len.numpy(), beam=beam.numpy(),
        beam_len=beam_len.numpy(), rel=rel.numpy(), clcm=clcm.numpy(),
        mrfr=mrfr.numpy(), pred_mask=pred_mask.numpy(),
        mlm_y=y.numpy(), mlm_scores=mlm_scores.numpy(),
        mlm_loss=np.float32(mlm_l.item()),
        obj_scores=obj_scores.numpy(),
        vae_x=vx.numpy(), vae_c=vc.numpy(), vae_out=v_out.numpy(),
        ld_in=ld_in.numpy(), ld_out=ld_out.numpy(),
        n_layers=np.array(N_LAYERS), refine_layers=np.array(REFINE_LAYERS),
        **sd)
    print(f"wrote {OUT}: gen {tuple(gen.shape)}, beam {tuple(beam.shape)}, "
          f"{len(sd)} sd tensors")


if __name__ == "__main__":
    main()
