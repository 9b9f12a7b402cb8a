"""M3P non-VQA modes: cross-modal decode (crossfwd), greedy generation
with a fixed-shape KV cache, the AoA image refiner, the predict() head
family, and the VAE latent modules — the last reference surface that was
previously documented-as-omitted (volta/volta/m3p_transformer.py:
crossfwd :966-1110, ImageEmbedding :1112-1132, predict :1178-1209,
generate :1211-1316, AoA :272-423, VAE :501-546).

These paths share the SAME encoder weights as the VQA jointfwd
(models/m3p.py: attentions/ffns/layer_norm1/2, embeddings) and add the
generation-only components: per-layer encoder_attn cross-attention +
layer_norm15, the tied PredLayer (proj.weight = embeddings.weight,
share_inout_emb — m3p_transformer.py:727-728), the AoA refiner stack, the
understanding heads (seq_relationship/clcm/mrfr/obj), and the
VaeEncoder/LatentDecoder pair. Params ride under ``params["gen"]`` on top
of the m3p.py tree.

TPU mapping of generation: the reference's Python while-loop with a
growing dict cache becomes ONE compiled `lax.while_loop` over a
fixed-shape carry — preallocated [L, B, H, max_len, hd] self-attention
K/V buffers written by dynamic_update_slice, cross-attention K/V
projected once before the loop (the reference computes them on first use
and caches, :184-199), and the stop condition `all finished or
cur_len == max_len`. Per-step work is a static single-position program;
no retracing, no host round trips per token.

Numerics pinned to the reference: q/sqrt(hd) pre-scale, masked_fill(-inf)
+ fp32 softmax, post-LN blocks, `tensor *= mask` after every block, the
causal attention mask being the PURE lower triangle (get_masks :59-79 —
padded keys are not masked in causal attention; their hidden states are
zeroed instead).
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from ..config import M3PConfig
from . import layers as L

Params = dict[str, Any]
NEG_INF = -jnp.inf


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def init_gen_params(rng: jax.Array, cfg: M3PConfig, *, base: Params | None
                    = None, refine_layers: int = 3) -> Params:
    """Extend (or create) an m3p.py param tree with the generation-only
    components. The MLM projection is TIED to embeddings['word']
    (share_inout_emb) — only its bias is a new parameter."""
    from . import m3p

    params = dict(base) if base is not None else m3p.init_params(
        jax.random.fold_in(rng, 0), cfg)
    ks = iter(jax.random.split(jax.random.fold_in(rng, 1),
                               16 + 8 * refine_layers))
    H, nL = cfg.hidden_size, cfg.num_layers
    std = 0.02

    def lin(i, o):
        return L.init_linear(next(ks), i, o, std)

    def stack_lin(i, o):
        k = next(ks)
        return {"w": jax.random.normal(k, (nL, i, o), jnp.float32) * std,
                "b": jnp.zeros((nL, o), jnp.float32)}

    def stack_ln():
        return {"scale": jnp.ones((nL, H), jnp.float32),
                "bias": jnp.zeros((nL, H), jnp.float32)}

    refiner = {
        "layers": tuple(
            {"attn": {"q": lin(H, H), "k": lin(H, H), "v": lin(H, H)},
             "aoa": lin(2 * H, 2 * H),
             "ln_a": L.init_ln(H), "ln_b": L.init_ln(H),
             "ffn": {"w1": lin(H, cfg.intermediate_size),
                     "w2": lin(cfg.intermediate_size, H)}}
            for _ in range(refine_layers)),
        "norm": L.init_ln(H),
    }
    params["gen"] = {
        "encoder_attn": {"q": stack_lin(H, H), "k": stack_lin(H, H),
                         "v": stack_lin(H, H), "o": stack_lin(H, H)},
        "ln15": stack_ln(),
        "pred_bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
        # cross_lang_embeddings (m3p_transformer.py:656): added to the
        # token embedding when a language id is given (the beam decoder
        # always passes one, :1361)
        "cross_lang": jax.random.normal(next(ks), (2, H), jnp.float32) * std,
        "refiner": refiner,
        "seq_relationship": lin(H, 1),
        "pooler2": lin(H, H),
        "seq_relationship2": lin(H, 1),
        "mrfr": lin(H, 2048),
        "obj_transform": {"dense": lin(H, H), "ln": L.init_ln(H)},
        "obj_proj": lin(H, 1600),
        "vae": {"x_to_mu": lin(H, H), "x_to_logvar": lin(H, H),
                "out_dense": lin(2 * H, H)},
        "latent_decoder": {"dense": lin(H, H), "dense_mu": lin(H, H),
                           "ln": L.init_ln(H)},
    }
    return params


# ---------------------------------------------------------------------------
# Masks + primitives (deterministic/inference path: generation and the
# understanding heads run under torch.no_grad()/model.eval() in the
# reference drivers; dropout is off)
# ---------------------------------------------------------------------------

def get_masks(slen: int, lengths: jnp.ndarray, causal: bool):
    """XLM get_masks (m3p_transformer.py:59-79): (mask [B, S],
    attn_mask [B, S] non-causal | [B, S, S] pure lower triangle causal)."""
    alen = jnp.arange(slen)
    mask = alen[None, :] < lengths[:, None]
    if causal:
        attn_mask = jnp.broadcast_to(
            alen[None, None, :] <= alen[None, :, None],
            (lengths.shape[0], slen, slen))
    else:
        attn_mask = mask
    return mask, attn_mask


def _mha(x_q, kv, p, num_heads: int, mask) -> jnp.ndarray:
    """XLM MultiHeadAttention (m3p_transformer.py:126-210): q pre-scaled
    by 1/sqrt(hd), masked_fill(-inf) where mask==0, fp32 softmax. mask is
    [B, K] or [B, Q, K] boolean."""
    B, Q, D = x_q.shape
    hd = D // num_heads

    def split(t):
        return t.reshape(B, -1, num_heads, hd).transpose(0, 2, 1, 3)

    q = split(L.linear(x_q, p["q"])) / math.sqrt(hd)
    k = split(L.linear(kv, p["k"]))
    v = split(L.linear(kv, p["v"]))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    m4 = (mask[:, None, None, :] if mask.ndim == 2
          else mask[:, None, :, :])
    scores = jnp.where(m4, scores.astype(jnp.float32), NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, Q, D)
    return L.linear(ctx, p["o"])


def _layer(i: int, tree: Params):
    return {k: jax.tree.map(lambda a: a[i], v) if isinstance(v, dict)
            else v[i] for k, v in tree.items()}


# ---------------------------------------------------------------------------
# AoA refiner (m3p_transformer.py:272-423)
# ---------------------------------------------------------------------------

def aoa_refine(gen: Params, cfg: M3PConfig, x: jnp.ndarray,
               attn_mask: jnp.ndarray) -> jnp.ndarray:
    """AoA_Refiner_Core: pre-norm sublayers (SublayerConnection), a
    multi-head dot attention whose output feeds a GLU
    attention-on-attention gate (aoa: Linear(2d->2d) + GLU over
    [ctx; query]), then a GeLU FFN; final LayerNorm."""
    H, nh = cfg.hidden_size, cfg.num_heads
    hd = H // nh
    eps = 1e-12
    for lp in gen["refiner"]["layers"]:
        # sublayer 0: x + attn(norm(x))
        q_in = L.layer_norm(x, lp["ln_a"]["scale"], lp["ln_a"]["bias"], eps)
        B, S, _ = q_in.shape

        def split(t):
            return t.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)

        q = split(L.linear(q_in, lp["attn"]["q"]))
        k = split(L.linear(q_in, lp["attn"]["k"]))
        v = split(L.linear(q_in, lp["attn"]["v"]))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
        m4 = attn_mask[:, None, None, :]
        scores = jnp.where(m4, scores, NEG_INF)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, -1), v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, H)
        # AoA gate: GLU(Linear([ctx; q_in]))
        g = L.linear(jnp.concatenate([ctx, q_in], -1), lp["aoa"])
        attn_out = g[..., :H] * jax.nn.sigmoid(g[..., H:])
        x = x + attn_out
        # sublayer 1: x + ffn(norm(x))
        h = L.layer_norm(x, lp["ln_b"]["scale"], lp["ln_b"]["bias"], eps)
        ff = L.linear(L.gelu(L.linear(h, lp["ffn"]["w1"])), lp["ffn"]["w2"])
        x = x + ff
    n = gen["refiner"]["norm"]
    return L.layer_norm(x, n["scale"], n["bias"], eps)


def image_embed_refined(params: Params, cfg: M3PConfig, features, locs,
                        lengths) -> tuple[jnp.ndarray, jnp.ndarray]:
    """ImageEmbedding mode (m3p_transformer.py:1112-1132): image
    embeddings, zero padded slots, AoA-refine. features [B, R, 2048],
    locs [B, R, num_locs], lengths [B]. Returns (tensor [B, R, H],
    attn_mask [B, R])."""
    e = params["embeddings"]
    eps = cfg.layer_norm_eps
    img = (L.linear(features, e["image"]) + L.linear(locs, e["loc"]))
    img = L.layer_norm(img, e["img_ln"]["scale"], e["img_ln"]["bias"], eps)
    mask, attn_mask = get_masks(features.shape[1], lengths, False)
    img = img * mask[:, :, None]
    return aoa_refine(params["gen"], cfg, img, attn_mask), attn_mask


# ---------------------------------------------------------------------------
# crossfwd (text stream) — the decoder path (m3p_transformer.py:966-1110)
# ---------------------------------------------------------------------------

def crossfwd(params: Params, cfg: M3PConfig, x: jnp.ndarray,
             lengths: jnp.ndarray, *, causal: bool,
             src_enc: jnp.ndarray | None = None,
             src_len: jnp.ndarray | None = None,
             positions: jnp.ndarray | None = None,
             lang_id: int | None = None) -> jnp.ndarray:
    """Text-stream crossfwd, full sequence (no cache): embeddings + abs
    positions + LN_emb, then per layer: self-attn (+LN1), optional
    cross-attention over src_enc (+LN15, only when causal — the decoder
    branch at :1083-1087), FFN (+LN2), tensor *= mask. x [B, S] int32;
    returns [B, S, H]."""
    e = params["embeddings"]
    enc = params["encoder"]
    gen = params["gen"]
    eps = cfg.layer_norm_eps
    B, S = x.shape

    mask, attn_mask = get_masks(S, lengths, causal)
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    h = (L.embedding_lookup(e["word"], x) + e["position"][positions])
    if lang_id is not None:
        h = h + gen["cross_lang"][lang_id][None, None, :]
    h = L.layer_norm(h, e["ln"]["scale"], e["ln"]["bias"], eps)
    h = h * mask[:, :, None]

    if src_enc is not None:
        src_mask = (jnp.arange(src_enc.shape[1])[None, :]
                    < src_len[:, None])

    for i in range(cfg.num_layers):
        sp = _layer(i, enc["attn"])
        attn = _mha(h, h, sp, cfg.num_heads, attn_mask)
        ln1 = _layer(i, enc["ln1"])
        h = L.layer_norm(h + attn, ln1["scale"], ln1["bias"], eps)
        if causal and src_enc is not None:
            cp = _layer(i, gen["encoder_attn"])
            attn = _mha(h, src_enc, cp, cfg.num_heads, src_mask)
            ln15 = _layer(i, gen["ln15"])
            h = L.layer_norm(h + attn, ln15["scale"], ln15["bias"], eps)
        fp = _layer(i, enc["ffn"])
        ff = L.linear(L.gelu(L.linear(h, fp["w1"])), fp["w2"])
        ln2 = _layer(i, enc["ln2"])
        h = L.layer_norm(h + ff, ln2["scale"], ln2["bias"], eps)
        h = h * mask[:, :, None]
    return h


# ---------------------------------------------------------------------------
# PredLayer + predict() heads (m3p_transformer.py:84-123, 1178-1209)
# ---------------------------------------------------------------------------

def pred_scores(params: Params, h: jnp.ndarray) -> jnp.ndarray:
    """PredLayer.get_scores with the tied projection: h @ word_emb^T +
    bias (share_inout_emb, :727-728)."""
    return (h @ params["embeddings"]["word"].T.astype(h.dtype)
            + params["gen"]["pred_bias"])


def mlm_loss(scores: jnp.ndarray, y: jnp.ndarray,
             pred_mask: jnp.ndarray) -> jnp.ndarray:
    """F.cross_entropy(scores[pred_mask], y, reduction='mean') with fixed
    shapes: mean over masked positions."""
    logp = jax.nn.log_softmax(scores.astype(jnp.float32), -1)
    ce = -jnp.take_along_axis(logp, y[..., None], -1)[..., 0]
    m = pred_mask.astype(jnp.float32)
    return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)


def predict(params: Params, cfg: M3PConfig, tensor: jnp.ndarray, *,
            head: str = "mlm"):
    """The predict() head family (:1178-1209): 'relation' (ITM over the
    BertPooler of position 0), 'clcm' (second pooler pair), 'mrfr'
    (feature regression to 2048), 'obj' (transform + 1600-way object
    head), 'mlm' (tied-vocabulary scores for the caller to mask)."""
    gen = params["gen"]
    if head == "relation":
        pooled = jnp.tanh(L.linear(tensor[:, 0], params["pooler"]))
        return L.linear(pooled, gen["seq_relationship"])
    if head == "clcm":
        pooled = jnp.tanh(L.linear(tensor[:, 0], gen["pooler2"]))
        return L.linear(pooled, gen["seq_relationship2"])
    if head == "mrfr":
        return L.linear(tensor, gen["mrfr"])
    if head == "obj":
        t = gen["obj_transform"]
        h = L.gelu(L.linear(tensor, t["dense"]))
        h = L.layer_norm(h, t["ln"]["scale"], t["ln"]["bias"], 1e-12)
        return L.linear(h, gen["obj_proj"])
    if head == "mlm":
        return pred_scores(params, tensor)
    raise ValueError(head)


# ---------------------------------------------------------------------------
# VAE latents (m3p_transformer.py:501-546)
# ---------------------------------------------------------------------------

def vae_encode(gen: Params, x: jnp.ndarray, c: jnp.ndarray, *,
               rng=None):
    """VaeEncoder.reparameterize: deterministic (eval) path when rng is
    None — z = [mu; c] -> out_dense, kld None; training path draws
    z ~ N(mu, exp(logvar)) and returns the analytic KLD."""
    v = gen["vae"]
    mu = L.linear(x, v["x_to_mu"])
    if rng is None:
        z = jnp.concatenate([mu, c], axis=-1)
        return L.linear(z, v["out_dense"]), None
    logvar = L.linear(x, v["x_to_logvar"])
    eps = jax.random.normal(rng, mu.shape, mu.dtype)
    z = mu + eps * jnp.exp(0.5 * logvar)
    kld = -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar), axis=1)
    z = jnp.concatenate([z, c], axis=-1)
    return L.linear(z, v["out_dense"]), kld


def latent_decode(gen: Params, h: jnp.ndarray) -> jnp.ndarray:
    """LatentDecoder: dense -> dense_mu -> LN -> tanh."""
    d = gen["latent_decoder"]
    out = L.linear(L.linear(h, d["dense"]), d["dense_mu"])
    out = L.layer_norm(out, d["ln"]["scale"], d["ln"]["bias"], 1e-12)
    return jnp.tanh(out)


# ---------------------------------------------------------------------------
# Greedy generation with a fixed-shape KV cache (m3p_transformer.py:1211-1316)
# ---------------------------------------------------------------------------

def generate_greedy(params: Params, cfg: M3PConfig, src_enc: jnp.ndarray,
                    src_len: jnp.ndarray, *, max_len: int = 32):
    """The reference's generate() with sample_temperature=None, compiled
    to one lax.while_loop: <EOS>-seeded prefix, per-step single-position
    crossfwd with cached self-attn K/V and once-projected cross-attn K/V,
    argmax next token, pad-after-finish, EOS backstop at max_len.
    Returns (generated [max_len, B] int32, gen_len [B] int32) — the
    reference returns generated[:cur_len]; rows past gen_len are PAD."""
    enc = params["encoder"]
    gen = params["gen"]
    e = params["embeddings"]
    eps = cfg.layer_norm_eps
    B = src_enc.shape[0]
    nL, nh, H = cfg.num_layers, cfg.num_heads, cfg.hidden_size
    hd = H // nh
    pad_i, eos_i = cfg.pad_token_id, 2      # XLM eos_index=2 (config)

    def split_heads(t):
        return t.reshape(B, -1, nh, hd).transpose(0, 2, 1, 3)

    # cross-attention K/V: projected once (the reference caches them on
    # first use, m3p_transformer.py:184-199)
    src_mask = jnp.arange(src_enc.shape[1])[None, :] < src_len[:, None]
    ck, cv = [], []
    for i in range(nL):
        cp = _layer(i, gen["encoder_attn"])
        ck.append(split_heads(L.linear(src_enc, cp["k"])))
        cv.append(split_heads(L.linear(src_enc, cp["v"])))
    ck = jnp.stack(ck)                      # [L, B, nh, S_src, hd]
    cv = jnp.stack(cv)

    generated0 = jnp.full((max_len, B), pad_i, jnp.int32).at[0].set(eos_i)
    kc0 = jnp.zeros((nL, B, nh, max_len, hd), jnp.float32)
    vc0 = jnp.zeros_like(kc0)

    def step(carry):
        generated, gen_len, unfinished, cur, kc, vc = carry
        p = cur - 1                          # position being processed
        tok = jax.lax.dynamic_slice_in_dim(generated, p, 1, 0)[0]  # [B]
        pos_valid = p < gen_len              # hidden-state mask at p
        # jnp.take: the tables may be host numpy (converter output), whose
        # __getitem__ rejects traced indices
        h = (jnp.take(jnp.asarray(e["word"]), tok, axis=0)
             + jnp.take(jnp.asarray(e["position"]), p, axis=0))[:, None, :]
        h = L.layer_norm(h, e["ln"]["scale"], e["ln"]["bias"], eps)
        h = h * pos_valid[:, None, None]
        key_ok = (jnp.arange(max_len) <= p)[None, :]   # causal triangle row

        for i in range(nL):
            sp = _layer(i, enc["attn"])
            q = split_heads(L.linear(h, sp["q"])) / math.sqrt(hd)
            kn = split_heads(L.linear(h, sp["k"]))  # [B, nh, 1, hd]
            vn = split_heads(L.linear(h, sp["v"]))
            kc = jax.lax.dynamic_update_slice(kc, kn[None], (i, 0, 0, p, 0))
            vc = jax.lax.dynamic_update_slice(vc, vn[None], (i, 0, 0, p, 0))
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, kc[i])
            scores = jnp.where(key_ok[:, None, None, :],
                               scores.astype(jnp.float32), NEG_INF)
            ctx = jnp.einsum("bhqk,bhkd->bhqd",
                             jax.nn.softmax(scores, -1), vc[i])
            attn = L.linear(ctx.transpose(0, 2, 1, 3).reshape(B, 1, H),
                            sp["o"])
            ln1 = _layer(i, enc["ln1"])
            h = L.layer_norm(h + attn, ln1["scale"], ln1["bias"], eps)

            cp = _layer(i, gen["encoder_attn"])
            q = split_heads(L.linear(h, cp["q"])) / math.sqrt(hd)
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, ck[i])
            scores = jnp.where(src_mask[:, None, None, :],
                               scores.astype(jnp.float32), NEG_INF)
            ctx = jnp.einsum("bhqk,bhkd->bhqd",
                             jax.nn.softmax(scores, -1), cv[i])
            attn = L.linear(ctx.transpose(0, 2, 1, 3).reshape(B, 1, H),
                            cp["o"])
            ln15 = _layer(i, gen["ln15"])
            h = L.layer_norm(h + attn, ln15["scale"], ln15["bias"], eps)

            fp = _layer(i, enc["ffn"])
            ff = L.linear(L.gelu(L.linear(h, fp["w1"])), fp["w2"])
            ln2 = _layer(i, enc["ln2"])
            h = L.layer_norm(h + ff, ln2["scale"], ln2["bias"], eps)
            h = h * pos_valid[:, None, None]

        scores = pred_scores(params, h[:, 0])          # [B, V]
        nxt = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        nxt = nxt * unfinished + pad_i * (1 - unfinished)
        generated = jax.lax.dynamic_update_index_in_dim(
            generated, nxt, cur, 0)
        gen_len = gen_len + unfinished
        unfinished = unfinished * (nxt != eos_i).astype(jnp.int32)
        return generated, gen_len, unfinished, cur + 1, kc, vc

    def cond(carry):
        _, _, unfinished, cur, _, _ = carry
        return (cur < max_len) & (jnp.max(unfinished) > 0)

    init = (generated0, jnp.ones((B,), jnp.int32),
            jnp.ones((B,), jnp.int32), jnp.int32(1), kc0, vc0)
    generated, gen_len, unfinished, cur, _, _ = jax.lax.while_loop(
        cond, step, init)
    # EOS backstop: rows still unfinished at max_len get their LAST slot
    # overwritten with <EOS>; gen_len is NOT adjusted (:1310-1312)
    backstop = (cur >= max_len) & (unfinished > 0)
    generated = generated.at[max_len - 1].set(
        jnp.where(backstop, eos_i, generated[max_len - 1]))
    return generated, gen_len


# ---------------------------------------------------------------------------
# Beam search (m3p_transformer.py:1317-1511 + BeamHypotheses :1513-1556)
# ---------------------------------------------------------------------------

def generate_beam(params: Params, cfg: M3PConfig, src_enc: jnp.ndarray,
                  src_len: jnp.ndarray, *, beam_size: int,
                  length_penalty: float = 1.0, early_stopping: bool = False,
                  max_len: int = 32, lang_id: int = 0):
    """The reference's generate_beam as ONE compiled lax.while_loop with
    fixed shapes. Faithful bookkeeping:

     - beam-expanded batch of B*K rows, beam_scores init [0, -1e9...];
     - per step: single-position cached decode, log-softmax scores,
       top-2K over the K*V lattice per sentence, then the candidate sweep
       in sorted order — EOS (or forced at max_len-1) candidates go to the
       per-sentence hypothesis store (capacity K, replace-worst with the
       reference's strictly-greater gate and worst-score tracking), others
       fill the next beam until K are taken;
     - done sentences (BeamHypotheses.is_done: store full AND
       worst >= best/(max_len-1)^penalty unless early_stopping) emit the
       reference's literal (score 0, PAD, global row 0) padding rows —
       including the quirky gather of sentence 0's cache into done rows;
     - hypothesis scores are sum-logprob / len(prefix)^penalty with the
       prefix INCLUDING the <EOS> seed (len = cur_len at add time);
     - final: best-scoring hypothesis per sentence, +1 slot for the
       terminal <EOS> (tgt_len), PAD after.

    Returns (decoded [max_len, B] int32, tgt_len [B] int32); the reference
    returns decoded[:tgt_len.max()].
    """
    enc = params["encoder"]
    gen = params["gen"]
    e = params["embeddings"]
    eps = cfg.layer_norm_eps
    B = src_enc.shape[0]
    K = beam_size
    BK = B * K
    V = cfg.vocab_size
    nL, nh, H = cfg.num_layers, cfg.num_heads, cfg.hidden_size
    hd = H // nh
    pad_i, eos_i = cfg.pad_token_id, 2
    lp = float(length_penalty)

    src_enc_x = jnp.repeat(src_enc, K, axis=0)
    src_len_x = jnp.repeat(src_len, K, axis=0)
    src_mask = (jnp.arange(src_enc.shape[1])[None, :]
                < src_len_x[:, None])

    def split_heads(t):
        return t.reshape(BK, -1, nh, hd).transpose(0, 2, 1, 3)

    ck, cv = [], []
    for i in range(nL):
        cp = _layer(i, gen["encoder_attn"])
        ck.append(split_heads(L.linear(src_enc_x, cp["k"])))
        cv.append(split_heads(L.linear(src_enc_x, cp["v"])))
    ck = jnp.stack(ck)
    cv = jnp.stack(cv)

    word_t = jnp.asarray(e["word"])
    pos_t = jnp.asarray(e["position"])
    lang_vec = jnp.asarray(gen["cross_lang"])[lang_id]

    def decode_one(tok, p, kc, vc, ck, cv):
        h = (jnp.take(word_t, tok, axis=0) + jnp.take(pos_t, p, axis=0)
             + lang_vec)[:, None, :]
        h = L.layer_norm(h, e["ln"]["scale"], e["ln"]["bias"], eps)
        key_ok = (jnp.arange(max_len) <= p)[None, :]
        for i in range(nL):
            sp = _layer(i, enc["attn"])
            q = split_heads(L.linear(h, sp["q"])) / math.sqrt(hd)
            kn = split_heads(L.linear(h, sp["k"]))
            vn = split_heads(L.linear(h, sp["v"]))
            kc = jax.lax.dynamic_update_slice(kc, kn[None], (i, 0, 0, p, 0))
            vc = jax.lax.dynamic_update_slice(vc, vn[None], (i, 0, 0, p, 0))
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, kc[i])
            scores = jnp.where(key_ok[:, None, None, :],
                               scores.astype(jnp.float32), NEG_INF)
            ctx = jnp.einsum("bhqk,bhkd->bhqd",
                             jax.nn.softmax(scores, -1), vc[i])
            attn = L.linear(ctx.transpose(0, 2, 1, 3).reshape(BK, 1, H),
                            sp["o"])
            ln1 = _layer(i, enc["ln1"])
            h = L.layer_norm(h + attn, ln1["scale"], ln1["bias"], eps)

            cp = _layer(i, gen["encoder_attn"])
            q = split_heads(L.linear(h, cp["q"])) / math.sqrt(hd)
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, ck[i])
            scores = jnp.where(src_mask[:, None, None, :],
                               scores.astype(jnp.float32), NEG_INF)
            ctx = jnp.einsum("bhqk,bhkd->bhqd",
                             jax.nn.softmax(scores, -1), cv[i])
            attn = L.linear(ctx.transpose(0, 2, 1, 3).reshape(BK, 1, H),
                            cp["o"])
            ln15 = _layer(i, gen["ln15"])
            h = L.layer_norm(h + attn, ln15["scale"], ln15["bias"], eps)

            fp = _layer(i, enc["ffn"])
            ff = L.linear(L.gelu(L.linear(h, fp["w1"])), fp["w2"])
            ln2 = _layer(i, enc["ln2"])
            h = L.layer_norm(h + ff, ln2["scale"], ln2["bias"], eps)
        return h[:, 0], kc, vc

    def sweep_sentence(done_b, cur, vals, idxs, gen_cols, slot_scores,
                       slot_tokens, slot_lens, count, worst):
        """The per-sentence candidate loop (:1427-1460) over the 2K sorted
        candidates. gen_cols: [K, max_len] — this sentence's current beam
        prefixes (already padded past cur)."""

        def body(carry, cand):
            (n_sel, sel_s, sel_w, sel_b, ss, st, sl, cnt, wst) = carry
            value, idx = cand
            beam_id = idx // V
            word = idx % V
            active = (~done_b) & (n_sel < K)
            is_add = (word == eos_i) | (cur + 1 == max_len)
            score_norm = value / jnp.power(jnp.float32(cur), lp)
            can_add = active & is_add & ((cnt < K) | (score_norm > wst))
            slot = jnp.argmin(ss)
            ss2 = ss.at[slot].set(score_norm)
            st2 = st.at[slot].set(gen_cols[beam_id])
            sl2 = sl.at[slot].set(cur)
            new_worst = jnp.where(cnt < K,
                                  jnp.minimum(score_norm, wst),
                                  jnp.min(ss2))
            ss = jnp.where(can_add, ss2, ss)
            st = jnp.where(can_add, st2, st)
            sl = jnp.where(can_add, sl2, sl)
            wst = jnp.where(can_add, new_worst, wst)
            cnt = jnp.where(can_add, jnp.minimum(cnt + 1, K), cnt)

            can_sel = active & (~is_add)
            sel_s = jnp.where(can_sel, sel_s.at[n_sel].set(value), sel_s)
            sel_w = jnp.where(can_sel,
                              sel_w.at[n_sel].set(word.astype(jnp.int32)),
                              sel_w)
            sel_b = jnp.where(can_sel,
                              sel_b.at[n_sel].set(beam_id.astype(jnp.int32)),
                              sel_b)
            n_sel = n_sel + can_sel.astype(jnp.int32)
            return (n_sel, sel_s, sel_w, sel_b, ss, st, sl, cnt, wst), None

        init = (jnp.int32(0), jnp.zeros((K,), jnp.float32),
                jnp.full((K,), pad_i, jnp.int32),
                jnp.zeros((K,), jnp.int32),
                slot_scores, slot_tokens, slot_lens, count, worst)
        (n_sel, sel_s, sel_w, sel_b, ss, st, sl, cnt, wst), _ = \
            jax.lax.scan(body, init, (vals, idxs))
        return n_sel, sel_s, sel_w, sel_b, ss, st, sl, cnt, wst

    sweep = jax.vmap(sweep_sentence,
                     in_axes=(0, None, 0, 0, 0, 0, 0, 0, 0, 0))

    def step(carry):
        (generated, beam_scores, kc, vc, ck_c, cv_c, ss, st, sl, cnt, wst,
         done, cur) = carry
        p = cur - 1
        tok = jax.lax.dynamic_slice_in_dim(generated, p, 1, 0)[0]
        h, kc, vc = decode_one(tok, p, kc, vc, ck_c, cv_c)
        scores = jax.nn.log_softmax(pred_scores(params, h).astype(
            jnp.float32), -1)                              # [BK, V]
        _scores = (scores + beam_scores[:, None]).reshape(B, K * V)
        vals, idxs = jax.lax.top_k(_scores, 2 * K)         # sorted desc

        # done BEFORE the sweep, using this step's best (:1431)
        full = cnt >= K
        is_done = full & (early_stopping |
                          (wst >= vals[:, 0]
                           / jnp.power(jnp.float32(max_len - 1), lp)))
        done = done | is_done

        gen_cols = generated.T.reshape(B, K, max_len)      # [B, K, max_len]
        n_sel, sel_s, sel_w, sel_b, ss, st, sl, cnt, wst = sweep(
            done, cur, vals, idxs, gen_cols, ss, st, sl, cnt, wst)

        # done rows / empty beams emit (0, PAD, global row 0) (:1434, :1458)
        emit_pad = done[:, None] | (jnp.arange(K)[None, :] >= n_sel[:, None])
        sel_s = jnp.where(emit_pad, 0.0, sel_s)
        sel_w = jnp.where(emit_pad, pad_i, sel_w)
        glob = jnp.where(emit_pad, 0,
                         jnp.arange(B)[:, None] * K + sel_b).reshape(-1)

        beam_scores = sel_s.reshape(-1)
        generated = generated[:, glob]
        generated = jax.lax.dynamic_update_index_in_dim(
            generated, sel_w.reshape(-1), cur, 0)
        kc = kc[:, glob]
        vc = vc[:, glob]
        ck_c = ck_c[:, glob]
        cv_c = cv_c[:, glob]
        return (generated, beam_scores, kc, vc, ck_c, cv_c, ss, st, sl,
                cnt, wst, done, cur + 1)

    def cond(carry):
        done, cur = carry[-2], carry[-1]
        return (cur < max_len) & (~jnp.all(done))

    generated0 = jnp.full((max_len, BK), pad_i, jnp.int32).at[0].set(eos_i)
    beam_scores0 = jnp.where(jnp.arange(K)[None, :] == 0, 0.0, -1e9)
    beam_scores0 = jnp.broadcast_to(beam_scores0, (B, K)).reshape(-1)
    init = (generated0, beam_scores0,
            jnp.zeros((nL, BK, nh, max_len, hd), jnp.float32),
            jnp.zeros((nL, BK, nh, max_len, hd), jnp.float32),
            ck, cv,
            jnp.full((B, K), -jnp.inf, jnp.float32),
            jnp.full((B, K, max_len), pad_i, jnp.int32),
            jnp.zeros((B, K), jnp.int32),
            jnp.zeros((B,), jnp.int32),
            jnp.full((B,), 1e9, jnp.float32),
            jnp.zeros((B,), bool), jnp.int32(1))
    out = jax.lax.while_loop(cond, step, init)
    ss, st, sl = out[6], out[7], out[8]

    best = jnp.argmax(ss, axis=1)                          # [B]
    best_tokens = jnp.take_along_axis(
        st, best[:, None, None], axis=1)[:, 0]             # [B, max_len]
    best_len = jnp.take_along_axis(sl, best[:, None], axis=1)[:, 0]
    tgt_len = best_len + 1
    ar = jnp.arange(max_len)[None, :]
    decoded = jnp.where(ar < best_len[:, None], best_tokens, pad_i)
    decoded = jnp.where(ar == best_len[:, None], eos_i, decoded)
    return decoded.T.astype(jnp.int32), tgt_len.astype(jnp.int32)
