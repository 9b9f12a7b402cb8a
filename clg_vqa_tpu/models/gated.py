"""General VOLTA gated cross-modal encoder — the full sublayer-wiring
machinery behind the 9-model zoo (volta/volta/encoders.py:164-601
BertGatedSelfAttention/SelfOutput/Intermediate/Output + BertEncoder;
config.py BertConfig), TPU-rebuilt.

Where models/uc2.py implements the COLLAPSED special case (all four gates
on, everything shared, single-LN everywhere -> one joint scanned
transformer), this module implements the general case: per-sublayer
tt/tv/vt/vv attention gates, t/v feed-forward gates, text<->vision weight
sharing, single-vs-dual LayerNorm, per-sublayer width/head overrides, the
ViLBERT/LXMERT dual and VL-BERT/VisualBERT/UNITER bimodal embeddings
(models/embeddings_zoo.py), the three poolers and the fusion methods.
That is what ViLBERT (dual-stream with co-attention sublayers), LXMERT,
VisualBERT, UNITER and VL-BERT are in VOLTA's controlled setup: WIRINGS
of this machinery.

TPU mapping: wirings are heterogeneous by construction (different
sublayers have different gates/dims), so the encoder is an UNROLLED
static Python loop over the (config-fixed) sublayer sequence — every
shape/branch resolves at trace time, XLA sees straight-line fused code.
The homogeneous flagship recipes (UC2/M3P) keep their dedicated scanned +
Pallas-attention paths; this module favors generality and exact reference
semantics (fp32, torch-order reductions) over peak throughput.

Parity: tools/make_golden_gated.py builds shrunk wirings of every variety,
runs the reference's own torch BertModel/BertForVLTasks on them in
process, and tests/test_gated_parity.py asserts our outputs match after
utils/convert_gated.py key mapping.
"""
from __future__ import annotations

import dataclasses
import json
import math
from typing import Any, Mapping

import jax
import jax.numpy as jnp

from . import embeddings_zoo as EZ
from . import layers as L

Params = dict[str, Any]

DUAL_EMBEDDINGS = ("vilbert", "lxmert")
SHARED_EMBEDDINGS = ("vl-bert", "visualbert", "uniter")


@dataclasses.dataclass
class GatedConfig:
    """volta/volta/config.py BertConfig, the gated-wiring subset. Defaults
    mirror the reference's; from_json ingests a volta model-config json."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    pad_token_id: int = 0
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    initializer_range: float = 0.02
    model: str = "bert"                    # "bert" | "roberta"
    # vision
    v_feature_size: int = 2048
    v_hidden_size: int = 768
    v_num_attention_heads: int = 12
    v_intermediate_size: int = 3072
    v_hidden_dropout_prob: float = 0.1
    v_attention_probs_dropout_prob: float = 0.1
    num_locs: int = 5
    v_coordinate_embeddings_dim: int = 128   # VL-BERT only
    visual_target_weights: Mapping[str, float] = dataclasses.field(
        default_factory=dict)
    image_embeddings: str = "vilbert"
    # wiring
    tt_attn_sublayers: tuple = ()
    tv_attn_sublayers: tuple = ()
    vt_attn_sublayers: tuple = ()
    vv_attn_sublayers: tuple = ()
    t_ff_sublayers: tuple = ()
    v_ff_sublayers: tuple = ()
    shared_sublayers: tuple = ()
    single_ln_sublayers: tuple = ()
    sublayer2attn_hidden_size: Mapping[str, int] = dataclasses.field(
        default_factory=dict)
    sublayer2num_attention_heads: Mapping[str, int] = dataclasses.field(
        default_factory=dict)
    sublayer2intermediate_size: Mapping[str, int] = dataclasses.field(
        default_factory=dict)
    sublayer2v_attn_hidden_size: Mapping[str, int] = dataclasses.field(
        default_factory=dict)
    sublayer2v_num_attention_heads: Mapping[str, int] = dataclasses.field(
        default_factory=dict)
    sublayer2v_intermediate_size: Mapping[str, int] = dataclasses.field(
        default_factory=dict)
    # head
    pooler_size: int = 768
    v_pooler_size: int = 768
    fusion_method: str = "mul"       # sum | mul | text | vl-bert_vqa | none
    fusion_act: str = "relu"         # relu | tanh
    clf_hidden_size: int = 1536
    num_labels: int = 1842

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "GatedConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        kw = {k: (tuple(v) if isinstance(v, list) else v)
              for k, v in d.items() if k in names}
        return cls(**kw)

    @classmethod
    def from_json(cls, path: str) -> "GatedConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    # -- wiring introspection ------------------------------------------

    @property
    def depth(self) -> int:
        subs = (set(self.tt_attn_sublayers) | set(self.tv_attn_sublayers)
                | set(self.vt_attn_sublayers) | set(self.vv_attn_sublayers)
                | set(self.t_ff_sublayers) | set(self.v_ff_sublayers))
        if subs != set(range(len(subs))):
            raise ValueError(f"non-contiguous sublayer numbers: {sorted(subs)}")
        attn = (set(self.tt_attn_sublayers) | set(self.tv_attn_sublayers)
                | set(self.vt_attn_sublayers) | set(self.vv_attn_sublayers))
        ff = set(self.t_ff_sublayers) | set(self.v_ff_sublayers)
        if attn & ff:
            raise ValueError(f"overlapping attn/ff sublayers: {attn & ff}")
        return len(subs)

    def sub_kind(self, n: int) -> str:
        attn = (set(self.tt_attn_sublayers) | set(self.tv_attn_sublayers)
                | set(self.vt_attn_sublayers) | set(self.vv_attn_sublayers))
        return "attn" if n in attn else "ff"

    def attn_dims(self, n: int):
        """(hidden, heads, v_hidden, v_heads) for attn sublayer n, with
        per-sublayer overrides (encoders.py:168-171)."""
        return (self.sublayer2attn_hidden_size.get(str(n), self.hidden_size),
                self.sublayer2num_attention_heads.get(
                    str(n), self.num_attention_heads),
                self.sublayer2v_attn_hidden_size.get(
                    str(n), self.v_hidden_size),
                self.sublayer2v_num_attention_heads.get(
                    str(n), self.v_num_attention_heads))

    def ff_dims(self, n: int):
        return (self.sublayer2intermediate_size.get(
                    str(n), self.intermediate_size),
                self.sublayer2v_intermediate_size.get(
                    str(n), self.v_intermediate_size))


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, cfg: GatedConfig) -> Params:
    depth = cfg.depth
    ks = iter(jax.random.split(rng, 8 * depth + 32))
    std = cfg.initializer_range
    lin = lambda i, o: L.init_linear(next(ks), i, o, std)   # noqa: E731

    # embeddings
    if cfg.image_embeddings in DUAL_EMBEDDINGS:
        emb = {"text": EZ.init_bert_text(next(ks), cfg),
               "image": EZ.init_dual_image(next(ks), cfg)}
    elif cfg.image_embeddings == "visualbert":
        emb = EZ.init_visualbert(next(ks), cfg)
    elif cfg.image_embeddings == "uniter":
        emb = EZ.init_uniter(next(ks), cfg)
    elif cfg.image_embeddings == "vl-bert":
        emb = EZ.init_vlbert(next(ks), cfg)
    else:
        raise ValueError(
            f"image_embeddings={cfg.image_embeddings!r} is not a gated-zoo "
            f"variant (uc2/m3p have dedicated models/{{uc2,m3p}}.py)")

    subs = []
    for n in range(depth):
        has_tt = n in cfg.tt_attn_sublayers
        has_tv = n in cfg.tv_attn_sublayers
        has_vt = n in cfg.vt_attn_sublayers
        has_vv = n in cfg.vv_attn_sublayers
        shared = n in cfg.shared_sublayers
        if cfg.sub_kind(n) == "attn":
            H, nh, V, vnh = cfg.attn_dims(n)
            has_text = has_tt or has_tv
            has_vision = has_vv or has_vt
            p: Params = {}
            if has_text:
                p["t"] = {"q": lin(cfg.hidden_size, H),
                          "k": lin(cfg.hidden_size, H),
                          "v": lin(cfg.hidden_size, H)}
                p["t_out"] = {"dense": lin(H, cfg.hidden_size),
                              "ln": L.init_ln(cfg.hidden_size)}
            if has_vision and not (has_text and shared):
                p["v"] = {"q": lin(cfg.v_hidden_size, V),
                          "k": lin(cfg.v_hidden_size, V),
                          "v": lin(cfg.v_hidden_size, V)}
                p["v_out"] = {"dense": lin(V, cfg.v_hidden_size),
                              "ln": L.init_ln(cfg.v_hidden_size)}
            subs.append(p)
        else:
            F, vF = cfg.ff_dims(n)
            has_t = n in cfg.t_ff_sublayers
            has_v = n in cfg.v_ff_sublayers
            p = {}
            if has_t:
                p["t"] = {"w1": lin(cfg.hidden_size, F),
                          "w2": lin(F, cfg.hidden_size),
                          "ln": L.init_ln(cfg.hidden_size)}
            if has_v and not (has_t and shared):
                p["v"] = {"w1": lin(cfg.v_hidden_size, vF),
                          "w2": lin(vF, cfg.v_hidden_size),
                          "ln": L.init_ln(cfg.v_hidden_size)}
            subs.append(p)

    params: Params = {"embeddings": emb, "sublayers": tuple(subs)}
    if cfg.fusion_method != "none":
        params["t_pooler"] = lin(cfg.hidden_size, cfg.pooler_size)
    if cfg.fusion_method not in ("none", "text", "vl-bert_vqa"):
        params["v_pooler"] = lin(cfg.v_hidden_size, cfg.v_pooler_size)
    params["classifier"] = {
        "fc1": L.init_linear_xavier(next(ks), cfg.pooler_size,
                                    cfg.clf_hidden_size),
        "ln": L.init_ln(cfg.clf_hidden_size),
        "fc2": L.init_linear_xavier(next(ks), cfg.clf_hidden_size,
                                    cfg.num_labels),
    }
    return params


# ---------------------------------------------------------------------------
# Gated sublayers
# ---------------------------------------------------------------------------

def _split_heads(x, nh):
    B, S, D = x.shape
    return x.reshape(B, S, nh, D // nh).transpose(0, 2, 1, 3)


def _merge_heads(x):
    B, nh, S, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, S, nh * hd)


def _gated_attention(p: Params, cfg: GatedConfig, n: int, t, v, t_mask,
                     v_mask, *, deterministic, rng, compute_dtype=None):
    """BertGatedAttention.forward (encoders.py:229-451): gated QK^T with
    JOINT softmax over concatenated intra+inter scores when both gates are
    on, gated PV, per-stream output dense + residual + LN (or one LN over
    the concatenated streams when single_ln)."""
    has_tt = n in cfg.tt_attn_sublayers
    has_tv = n in cfg.tv_attn_sublayers
    has_vt = n in cfg.vt_attn_sublayers
    has_vv = n in cfg.vv_attn_sublayers
    shared = n in cfg.shared_sublayers
    single_ln = n in cfg.single_ln_sublayers
    has_text, has_vision = has_tt or has_tv, has_vv or has_vt
    H, nh, V, vnh = cfg.attn_dims(n)
    eps = cfg.layer_norm_eps

    tp = p.get("t")
    vp = p.get("v", tp if (has_text and has_vision and shared) else None)
    cd = compute_dtype

    if has_text:
        tq = _split_heads(L.linear(t, tp["q"], cd), nh)
        tk = _split_heads(L.linear(t, tp["k"], cd), nh)
        tv_ = _split_heads(L.linear(t, tp["v"], cd), nh)
    if has_vision:
        vq = _split_heads(L.linear(v, vp["q"], cd), vnh)
        vk = _split_heads(L.linear(v, vp["k"], cd), vnh)
        vv_ = _split_heads(L.linear(v, vp["v"], cd), vnh)

    def scores(q, k, hd, mask):
        # scores/softmax stay fp32 regardless of the compute dtype (the
        # reference computes in the model dtype; bf16 mode accumulates
        # QK^T in fp32 via preferred_element_type)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        return s + mask

    rngs = iter(jax.random.split(rng, 8) if rng is not None else [None] * 8)

    def drop(x, rate):
        return L.dropout(x, rate, next(rngs), deterministic)

    t_ctx = v_ctx = None
    if has_text:
        hd = H // nh
        parts, widths, vals = [], [], []
        if has_tt:                       # tt FIRST in the concat (:293)
            parts.append(scores(tq, tk, hd, t_mask))
            widths.append(parts[-1].shape[-1])
            vals.append(tv_)
        if has_tv:
            parts.append(scores(tq, vk, hd, v_mask))
            widths.append(parts[-1].shape[-1])
            vals.append(vv_)
        probs = jax.nn.softmax(jnp.concatenate(parts, -1), -1) \
            if len(parts) > 1 else jax.nn.softmax(parts[0], -1)
        off = 0
        ctx = 0.0
        for w, val in zip(widths, vals):
            pr = drop(probs[..., off:off + w],
                      cfg.attention_probs_dropout_prob)
            if cd is not None:
                pr = pr.astype(cd)
            ctx = ctx + jnp.einsum("bhqk,bhkd->bhqd", pr, val,
                                   preferred_element_type=jnp.float32)
            off += w
        t_ctx = _merge_heads(ctx if cd is None else ctx.astype(cd))
    if has_vision:
        vhd = V // vnh
        v_rate = (cfg.attention_probs_dropout_prob
                  if (has_text and shared)
                  else cfg.v_attention_probs_dropout_prob)
        parts, widths, vals = [], [], []
        if has_vt:                       # vt FIRST in the concat (:309)
            parts.append(scores(vq, tk, vhd, t_mask))
            widths.append(parts[-1].shape[-1])
            vals.append(tv_)
        if has_vv:
            parts.append(scores(vq, vk, vhd, v_mask))
            widths.append(parts[-1].shape[-1])
            vals.append(vv_)
        probs = jax.nn.softmax(jnp.concatenate(parts, -1), -1) \
            if len(parts) > 1 else jax.nn.softmax(parts[0], -1)
        off = 0
        ctx = 0.0
        for w, val in zip(widths, vals):
            pr = drop(probs[..., off:off + w], v_rate)
            if cd is not None:
                pr = pr.astype(cd)
            ctx = ctx + jnp.einsum("bhqk,bhkd->bhqd", pr, val,
                                   preferred_element_type=jnp.float32)
            off += w
        v_ctx = _merge_heads(ctx if cd is None else ctx.astype(cd))

    # BertGatedSelfOutput (encoders.py:368-425)
    top = p.get("t_out")
    vop = p.get("v_out", top if (has_text and has_vision and shared)
                else None)
    t_res = (drop(L.linear(t_ctx, top["dense"], cd),
                  cfg.hidden_dropout_prob) if has_text else 0.0)
    v_rate_out = (cfg.hidden_dropout_prob if (has_text and shared)
                  else cfg.v_hidden_dropout_prob)
    v_res = (drop(L.linear(v_ctx, vop["dense"], cd), v_rate_out)
             if has_vision else 0.0)
    if single_ln:
        joint = jnp.concatenate([t_res + t, v_res + v], axis=1)
        joint = L.layer_norm(joint, top["ln"]["scale"], top["ln"]["bias"],
                             eps)
        return joint[:, :t.shape[1]], joint[:, t.shape[1]:]
    t = (L.layer_norm(t_res + t, top["ln"]["scale"], top["ln"]["bias"], eps)
         if has_text else t)
    v = (L.layer_norm(v_res + v, vop["ln"]["scale"], vop["ln"]["bias"], eps)
         if has_vision else v)
    return t, v


def _gated_ff(p: Params, cfg: GatedConfig, n: int, t, v, *, deterministic,
              rng, compute_dtype=None):
    """BertGatedFeedForward (encoders.py:453-581): per-stream
    dense->GeLU->dense->dropout + residual + LN, shared/single-LN like the
    attention output."""
    has_t = n in cfg.t_ff_sublayers
    has_v = n in cfg.v_ff_sublayers
    shared = n in cfg.shared_sublayers
    single_ln = n in cfg.single_ln_sublayers
    eps = cfg.layer_norm_eps
    rngs = iter(jax.random.split(rng, 2) if rng is not None else [None, None])

    tp = p.get("t")
    vp = p.get("v", tp if (has_t and has_v and shared) else None)

    cd = compute_dtype
    t_res = 0.0
    if has_t:
        h = L.gelu(L.linear(t, tp["w1"], cd))
        t_res = L.dropout(L.linear(h, tp["w2"], cd), cfg.hidden_dropout_prob,
                          next(rngs), deterministic)
    v_res = 0.0
    if has_v:
        h = L.gelu(L.linear(v, vp["w1"], cd))
        v_rate = (cfg.hidden_dropout_prob if (has_t and shared)
                  else cfg.v_hidden_dropout_prob)
        v_res = L.dropout(L.linear(h, vp["w2"], cd), v_rate, next(rngs),
                          deterministic)
    if single_ln:
        joint = jnp.concatenate([t_res + t, v_res + v], axis=1)
        joint = L.layer_norm(joint, tp["ln"]["scale"], tp["ln"]["bias"], eps)
        return joint[:, :t.shape[1]], joint[:, t.shape[1]:]
    t = (L.layer_norm(t_res + t, tp["ln"]["scale"], tp["ln"]["bias"], eps)
         if has_t else t)
    v = (L.layer_norm(v_res + v, vp["ln"]["scale"], vp["ln"]["bias"], eps)
         if has_v else v)
    return t, v


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

def encode(params: Params, cfg: GatedConfig, batch: dict, *,
           deterministic: bool = True, rng=None, compute_dtype=None):
    """BertModel.forward (encoders.py:958-1021): embeddings -> -10000
    additive masks -> unrolled gated sublayer sequence -> poolers.
    Returns (seq_t, seq_v, pooled_t, pooled_v)."""
    input_ids = batch["input_ids"]
    features = batch["features"]
    locs = batch["locs"]
    t_m = batch.get("input_mask", jnp.ones_like(input_ids))
    v_m = batch.get("image_mask",
                    jnp.ones(features.shape[:2], input_ids.dtype))
    token_type_ids = batch.get("segment_ids", jnp.zeros_like(input_ids))

    n_rngs = cfg.depth + 3
    rngs = iter(jax.random.split(rng, n_rngs) if rng is not None
                else [None] * n_rngs)

    e = params["embeddings"]
    if cfg.image_embeddings in DUAL_EMBEDDINGS:
        t = EZ.bert_text_embed(e["text"], cfg, input_ids, token_type_ids,
                               deterministic=deterministic, rng=next(rngs))
        v = EZ.dual_image_embed(e["image"], cfg, features, locs,
                                deterministic=deterministic, rng=next(rngs))
    else:
        fn = {"visualbert": EZ.visualbert_embed, "uniter": EZ.uniter_embed,
              "vl-bert": EZ.vlbert_embed}[cfg.image_embeddings]
        t, v = fn(e, cfg, input_ids, features, locs, token_type_ids,
                  deterministic=deterministic, rng=next(rngs))
        next(rngs)

    t_mask = ((1.0 - t_m[:, None, None, :].astype(jnp.float32)) * -10000.0)
    v_mask = ((1.0 - v_m[:, None, None, :].astype(jnp.float32)) * -10000.0)

    for n in range(cfg.depth):
        p = params["sublayers"][n]
        if cfg.sub_kind(n) == "attn":
            t, v = _gated_attention(p, cfg, n, t, v, t_mask, v_mask,
                                    deterministic=deterministic,
                                    rng=next(rngs),
                                    compute_dtype=compute_dtype)
        else:
            t, v = _gated_ff(p, cfg, n, t, v, deterministic=deterministic,
                             rng=next(rngs), compute_dtype=compute_dtype)

    act = jax.nn.relu if cfg.fusion_act == "relu" else jnp.tanh
    pooled_t = pooled_v = None
    if cfg.fusion_method == "vl-bert_vqa":
        # VLBertTextPooler (encoders.py:611-625): the token at
        # text_end - 2 per row
        text_end = jnp.sum(input_ids != 0, axis=1)
        tok = jnp.take_along_axis(
            t, (text_end - 2)[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        pooled_t = act(L.linear(tok, params["t_pooler"]))
    elif cfg.fusion_method != "none":
        pooled_t = act(L.linear(t[:, 0], params["t_pooler"]))
    if cfg.fusion_method not in ("none", "text", "vl-bert_vqa"):
        pooled_v = act(L.linear(v[:, 0], params["v_pooler"]))
    return t, v, pooled_t, pooled_v


def forward(params: Params, cfg: GatedConfig, batch: dict, *,
            deterministic: bool = True, rng=None, compute_dtype=None,
            remat: bool = False, unroll: bool = True,
            fused_attn=False) -> jnp.ndarray:
    """BertForVLTasks.forward for VL-classifier[-GQA]
    (encoders.py:1202-1263): fused pooled output -> dropout ->
    SimpleClassifier logits. Signature-compatible with train/loop and
    eval/runner (remat/unroll/fused_attn accepted for interface parity;
    the general wiring always runs unrolled XLA attention)."""
    del remat, unroll, fused_attn
    if rng is None:
        r_enc = r_clf = None
    else:
        r_enc, r_clf = jax.random.split(rng)
    _, _, pooled_t, pooled_v = encode(params, cfg, batch,
                                      deterministic=deterministic, rng=r_enc,
                                      compute_dtype=compute_dtype)
    if cfg.fusion_method == "sum":
        pooled = pooled_t + pooled_v
    elif cfg.fusion_method == "mul":
        pooled = pooled_t * pooled_v
    elif cfg.fusion_method in ("text", "vl-bert_vqa"):
        pooled = pooled_t
    else:
        raise ValueError(f"fusion_method {cfg.fusion_method!r} has no "
                         f"pooled output for VL classification")
    return L.classifier_head(pooled, params["classifier"],
                             dropout_rate=0.1, ln_eps=cfg.layer_norm_eps,
                             rng=r_clf, deterministic=deterministic,
                             compute_dtype=compute_dtype)


def num_params(params: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
