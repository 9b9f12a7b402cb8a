"""Shared neural-net primitives, numerics-matched to the reference.

All functions are pure; parameters are plain dicts of jnp arrays. Linear
weights are stored **[in, out]** (transposed from torch's [out, in]) so the
forward is a plain ``x @ w + b`` that maps straight onto the MXU.

Numerics pinned to the reference:
- LayerNorm: TF-style, eps inside the sqrt (volta/volta/embeddings.py:20-33;
  apex FusedLayerNorm uses the same placement). UC2 eps=1e-5, M3P eps=1e-12.
- GeLU: exact erf form (volta/volta/encoders.py:131-137).
- Attention masks: additive ``(1-m) * -10000`` (encoders.py:987-995) for UC2;
  M3P uses masked_fill(-inf) (m3p_transformer.py:198-201).
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float) -> jnp.ndarray:
    """TF-style LayerNorm (eps inside sqrt), computed in fp32."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact erf GeLU (reference uses this, not the tanh approximation)."""
    return x * 0.5 * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


def linear(x: jnp.ndarray, p: Params, compute_dtype=None) -> jnp.ndarray:
    """x @ w + b with optional low-precision matmul.

    With a compute_dtype the MXU still accumulates in fp32
    (preferred_element_type) and the f32 bias add fuses into the matmul
    epilogue, but the RESULT is cast back to compute_dtype: keeping the
    residual stream at bf16 halves the activation HBM traffic between
    matmuls (measured ~35 ms/step of convert/copy at UC2 bs256 when the
    stream was f32)."""
    w, b = p["w"], p["b"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
    return y if compute_dtype is None else y.astype(compute_dtype)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _softmax_save_lp(scores: jnp.ndarray, out_dtype) -> jnp.ndarray:
    return jax.nn.softmax(scores.astype(jnp.float32), -1).astype(out_dtype)


def _softmax_save_lp_fwd(scores, out_dtype):
    p = _softmax_save_lp(scores, out_dtype)
    return p, p


def _softmax_save_lp_bwd(out_dtype, p, dp):
    p32, dp32 = p.astype(jnp.float32), dp.astype(jnp.float32)
    ds = p32 * (dp32 - jnp.sum(p32 * dp32, axis=-1, keepdims=True))
    return (ds,)


_softmax_save_lp.defvjp(_softmax_save_lp_fwd, _softmax_save_lp_bwd)


def softmax_lowp(scores: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """fp32 softmax whose LOW-PRECISION output is what the backward saves.

    The plain formulation keeps the f32 probs live for the backward: at
    M3P train scale that is a [mbs, 12, 140, 140] f32 tensor per block
    whose save + relayout copy alone measures ~12 ms/step (XProf,
    docs/PERFORMANCE.md). Saving the bf16 probs instead halves the
    residual traffic and lets the f32 tensor die inside the softmax
    fusion. The backward recomputes ds = p*(dp - sum(p*dp)) in fp32 from
    the bf16 probs — the same residual precision apex amp O1 training
    (the reference's setup, train_task.py fp16 path) keeps for attention
    probs."""
    return _softmax_save_lp(scores, out_dtype)


def dropout(x: jnp.ndarray, rate: float, rng, deterministic: bool) -> jnp.ndarray:
    """Inverted dropout from 8-bit random bits.

    The default bernoulli path generates u32 bits per element; at M3P
    train scale the mask tensors ([mbs,12,140,140] per attention layer +
    [mbs,140,768] per hidden dropout) cost ~18 ms/step in rng-bit-generator
    time plus relayout copies into the consumer fusion's layout (XProf,
    docs/PERFORMANCE.md round 3). u8 bits lower to a native u8
    rng_bit_generator, quartering both. The keep threshold quantizes to
    t/256 and the rescale divides by the ACTUAL keep probability t/256,
    so E[dropout(x)] == x exactly; the realized keep rate differs from
    1-rate by < 1/512 (e.g. 0.8984 vs 0.9 at rate 0.1), statistically
    immaterial for dropout regularization."""
    if deterministic or rate == 0.0:
        return x
    t = int(round((1.0 - rate) * 256.0))
    if t >= 256:        # rate below u8 granularity (< 1/512): keep all
        return x
    if t <= 0:          # rate ~1.0: torch Dropout(p=1) emits exact zeros
        return jnp.zeros_like(x)
    bits = jax.random.bits(rng, x.shape, jnp.uint8)
    return jnp.where(bits < t, x * (256.0 / t), 0.0)


def create_position_ids_from_input_ids(input_ids: jnp.ndarray,
                                       padding_idx: int) -> jnp.ndarray:
    """RoBERTa-style positions: padding_idx+1.. for non-pad tokens, padding_idx
    for pads (volta/volta/embeddings.py:160-170)."""
    mask = (input_ids != padding_idx).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + padding_idx


def additive_mask(mask01: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, S] {0,1} -> [B, 1, 1, S] additive mask with -10000 at pads
    (volta/volta/encoders.py:987-995; exactly -10000, not -inf)."""
    return ((1.0 - mask01.astype(dtype)) * -10000.0)[:, None, None, :]


def multi_head_attention(
    x_q: jnp.ndarray,
    x_kv: jnp.ndarray,
    p: Params,
    num_heads: int,
    attn_bias: jnp.ndarray,
    *,
    dropout_rate: float = 0.0,
    rng=None,
    deterministic: bool = True,
    compute_dtype=None,
    scale_query: bool = False,
    fused: bool = False,
) -> jnp.ndarray:
    """Standard MHA. ``attn_bias`` is additive, broadcastable to
    [B, H, Sq, Skv].

    scale_query=False: scores / sqrt(d) after QK^T (UC2, encoders.py:266).
    scale_query=True: q / sqrt(d) before QK^T (M3P, m3p_transformer.py:196).
    The two differ only in fp rounding; both are kept for bit-parity tests.

    fused: route the score/softmax/PV core through a Pallas VMEM kernel
    (ops/attention.py) — scores never touch HBM. True = head-blocked
    kernels (train: custom-VJP w/ in-kernel dropout; eval: forward-only);
    "flat" = flat-boundary kernels (heads looped in-kernel, no split/merge
    transposes — the bf16 TPU default for train AND bs>=512 eval, see the
    same-day A/Bs in docs/PERFORMANCE.md round 4); "hm" = head-major feed
    (tested opt-in, rejected as default). Requires self-attention and
    key-side bias [B, 1, 1, S]; the kernels post-scale QK^T in fp32
    regardless of scale_query (same numeric family, bf16-argmax-identical).
    The XLA path stays default for fp32 parity mode and small batches.
    """
    B, Sq, D = x_q.shape
    Skv = x_kv.shape[1]
    hd = D // num_heads

    if fused:
        if Sq != Skv or x_q is not x_kv and x_q.shape != x_kv.shape:
            raise ValueError("fused attention requires self-attention")
        bias4 = jnp.broadcast_to(attn_bias, (B, 1, 1, Skv))
        if fused == "hm" and not deterministic:
            # Head-major variant: project straight INTO the kernel's
            # [B, H, S, hd] block layout and consume its output head-major,
            # so the [B,S,D]<->[B,H,S,hd] split/merge transposes (and their
            # transpose_jvp twins on the backward, ~18 ms/step at M3P
            # bs128 — docs/PERFORMANCE.md round 4) never exist. MEASURED
            # AND REJECTED as a default: M3P 252.9 vs 250.9 ms flat, UC2
            # 144.1 vs 138.9 — the projection einsums (hd=64 minor dim,
            # half-empty lane tiles) give back what the transposes save.
            # Kept as a tested opt-in; see the perf ledger.
            def head_linear(x, pp):
                w = pp["w"].reshape(D, num_heads, hd)
                if compute_dtype is not None:
                    x = x.astype(compute_dtype)
                    w = w.astype(compute_dtype)
                y = jnp.einsum("bsd,dhe->bhse", x, w,
                               preferred_element_type=jnp.float32)
                y = y + pp["b"].reshape(num_heads, hd)[None, :, None, :]
                return y if compute_dtype is None else y.astype(compute_dtype)

            from ..ops.attention import fused_attention_train_hm
            ctx = fused_attention_train_hm(
                head_linear(x_q, p["q"]), head_linear(x_kv, p["k"]),
                head_linear(x_kv, p["v"]), bias4,
                dropout_rate=dropout_rate, rng=rng)
            wo = p["o"]["w"].reshape(num_heads, hd, D)
            if compute_dtype is not None:
                ctx = ctx.astype(compute_dtype)
                wo = wo.astype(compute_dtype)
            y = jnp.einsum("bhse,hed->bsd", ctx, wo,
                           preferred_element_type=jnp.float32) + p["o"]["b"]
            return y if compute_dtype is None else y.astype(compute_dtype)
        if fused == "proj" and not deterministic:
            # Projected-boundary training kernel: the whole block (q/k/v
            # projections + attention core + output projection) runs inside
            # Pallas, so the only activation tensors at the custom-call
            # boundary are x and y (fwd) / g and dx (bwd) — the per-layer
            # layout-assignment copies XLA inserts around the flat kernel's
            # q/k/v operands never exist. See
            # ops/attention.fused_attention_block.
            def c(a):
                return a if compute_dtype is None else a.astype(compute_dtype)

            from ..ops.attention import fused_attention_block
            return fused_attention_block(
                c(x_q), c(p["q"]["w"]), p["q"]["b"], c(p["k"]["w"]),
                p["k"]["b"], c(p["v"]["w"]), p["v"]["b"], c(p["o"]["w"]),
                p["o"]["b"], bias4, num_heads,
                dropout_rate=dropout_rate, rng=rng)
        q = linear(x_q, p["q"], compute_dtype)
        k = linear(x_kv, p["k"], compute_dtype)
        v = linear(x_kv, p["v"], compute_dtype)
        if fused == "sm" and not deterministic:
            # S-major-boundary training kernel: same math as flat, but the
            # Pallas boundary carries [S,B,D] whose row-major layout equals
            # the {2,0,1} XLA's conv-emitter projections prefer on [B,S,D],
            # so the per-layer layout-assignment copies around the flat
            # kernel's operands fold into bitcasts. See
            # ops/attention.fused_attention_train_smajor + the round-4
            # boundary-copy forensics in docs/PERFORMANCE.md. Force-only
            # debug flag: unsupported shapes (batch % 8, hd vs 128-lane
            # grouping) raise at trace time — no flat fallback, by design
            # (a silent fallback would invalidate the A/B). Round-5 status:
            # the round-4 Mosaic crash is fixed, check_attention_tpu --sm
            # passes all 7 on-chip properties, and the same-day A/B
            # REJECTED sm as a default (M3P 231.6 vs flat 214.3 ms — the
            # boundary swapaxes do not fold to bitcasts in the full
            # program; PERFORMANCE.md forensics entry). Stays opt-in.
            from ..ops.attention import fused_attention_train_smajor
            ctx = fused_attention_train_smajor(q, k, v, bias4, num_heads,
                                               dropout_rate=dropout_rate,
                                               rng=rng)
            return linear(ctx, p["o"], compute_dtype)
        if fused == "flat" and not deterministic:
            # Flat-boundary training kernel: heads looped INSIDE the kernel
            # over 64-aligned lane slices — q/k/v keep the projections'
            # [B,S,D] layout end to end, so the split/merge transposes and
            # their backward transpose_jvp twins (~18 ms/step at M3P bs128)
            # never exist. See ops/attention.fused_attention_train_flat.
            from ..ops.attention import fused_attention_train_flat
            ctx = fused_attention_train_flat(q, k, v, bias4, num_heads,
                                             dropout_rate=dropout_rate,
                                             rng=rng)
            return linear(ctx, p["o"], compute_dtype)
        if deterministic:
            if fused in ("flat", "proj", "sm"):
                # flat-boundary eval kernel: heads looped inside the kernel
                # over lane slices — no head split/merge transposes around
                # the kernel (the eval twin of the train default). NOTE:
                # deterministic 'sm' also lands here — the S-major eval twin
                # (ops/attention.fused_attention_smajor) exists but is
                # test-only; flat is the measured eval optimum for both
                # models, so forcing sm only swaps the TRAIN kernel.
                from ..ops.attention import fused_attention_flat
                ctx = fused_attention_flat(q, k, v, bias4, num_heads)
            else:
                # blocked forward-only eval kernel (no VJP)
                from ..ops.attention import fused_attention
                ctx = fused_attention(q, k, v, bias4, num_heads)
        else:
            # custom-VJP training kernel with in-kernel dropout: probs and
            # mask are recomputed in VMEM on the backward, never stored.
            # The dropout stream is the kernel PRNG's, not this rng's bits
            # directly — statistically equivalent to the XLA path, not
            # bit-equal (M3P bf16 TPU default since round 4; see
            # ops/attention.py for the same-day A/B numbers).
            from ..ops.attention import fused_attention_train
            ctx = fused_attention_train(q, k, v, bias4, num_heads,
                                        dropout_rate=dropout_rate, rng=rng)
        return linear(ctx, p["o"], compute_dtype)

    # NOTE: a fused [D, 3D] qkv projection was tried and measured slower on
    # v5e at these shapes (the trace-time weight concat costs ~85MB/step of
    # HBM traffic; three [D, D] matmuls are already MXU-efficient). See
    # docs/PERFORMANCE.md "QKV fusion".
    # NOTE: head-major [B,H,S,hd] q/k/v projections (weights viewed
    # [D,H,hd], einsum 'bsd,dhe->bhse') were tried to remove the ~22 ms of
    # [B,S,D] {2,0,1}<->{1,2,0} relayout copies XLA inserts around these
    # reshapes — and measured SLOWER (M3P 292.4 vs 269.6 ms, UC2 139.5 vs
    # 133.6 same-day): copies went UP (26->37 ms) and the projection dots
    # lost efficiency. XLA's chosen layouts beat the hand-steered ones.
    q = linear(x_q, p["q"], compute_dtype).reshape(B, Sq, num_heads, hd)
    k = linear(x_kv, p["k"], compute_dtype).reshape(B, Skv, num_heads, hd)
    v = linear(x_kv, p["v"], compute_dtype).reshape(B, Skv, num_heads, hd)

    scale = 1.0 / math.sqrt(hd)
    if scale_query:
        q = q * scale
    # NOTE: rematting this score/softmax core (recompute probs in the bwd
    # instead of saving them, the flash-attention memory argument) was tried
    # and measured SLOWER at these shapes: 1782 vs 1958 QA/s — at S=76 the
    # saved [B,H,76,76] probs are cheap to re-read while the recompute adds
    # serial VPU work. See docs/PERFORMANCE.md.
    # [B, H, Sq, Skv]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if not scale_query:
        scores = scores * scale
    scores = scores + attn_bias
    if compute_dtype is not None:
        # fp32 softmax, low-precision probs saved for the backward
        # (softmax_lowp): forward value identical to softmax-then-cast,
        # backward reads bf16 probs like the reference's amp training.
        probs = softmax_lowp(scores, compute_dtype)
        if not deterministic and dropout_rate > 0.0:
            probs = dropout(probs, dropout_rate, rng, deterministic)
        v = v.astype(compute_dtype)
    else:
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        if not deterministic and dropout_rate > 0.0:
            probs = dropout(probs, dropout_rate, rng, deterministic)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32)
    ctx = ctx.reshape(B, Sq, D)
    return linear(ctx, p["o"], compute_dtype)


# ---------------------------------------------------------------------------
# Parameter initializers (match torch defaults used by the reference's
# init_weights: normal(0, initializer_range) for Linear/Embedding,
# LN scale=1 bias=0; SimpleClassifier uses xavier_uniform).
# ---------------------------------------------------------------------------

def classifier_head(pooled: jnp.ndarray, p: Params, *, dropout_rate: float,
                    ln_eps: float, rng=None, deterministic: bool = True,
                    compute_dtype=None) -> jnp.ndarray:
    """SimpleClassifier (volta encoders.py: dropout -> fc1 -> GeLU -> LN
    -> fc2) — one implementation shared by UC2 and M3P (the reference
    instantiates the same module for both)."""
    pooled = dropout(pooled, dropout_rate, rng, deterministic)
    h = gelu(linear(pooled, p["fc1"], compute_dtype))
    h = layer_norm(h, p["ln"]["scale"], p["ln"]["bias"], ln_eps)
    return linear(h, p["fc2"], compute_dtype)


def init_linear(rng, d_in: int, d_out: int, std: float) -> Params:
    return {
        "w": jax.random.normal(rng, (d_in, d_out), jnp.float32) * std,
        "b": jnp.zeros((d_out,), jnp.float32),
    }


def init_linear_xavier(rng, d_in: int, d_out: int) -> Params:
    limit = math.sqrt(6.0 / (d_in + d_out))
    return {
        "w": jax.random.uniform(rng, (d_in, d_out), jnp.float32, -limit, limit),
        "b": jnp.zeros((d_out,), jnp.float32),
    }


def init_ln(d: int) -> Params:
    return {"scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32)}


def init_embedding(rng, n: int, d: int, std: float,
                   padding_idx: int | None = None) -> jnp.ndarray:
    e = jax.random.normal(rng, (n, d), jnp.float32) * std
    if padding_idx is not None:
        e = e.at[padding_idx].set(0.0)
    return e


@jax.custom_vjp
def embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """table[ids] with a sorted-scatter backward.

    A standalone unsorted scatter-add of 5120 updates into [250002, 768]
    measures 159 ms on v5e vs 0.6 ms with pre-sorted indices (bit-identical
    result). Inside the fully fused train step XLA already schedules the
    embedding grad efficiently (no end-to-end delta measured), so this is a
    guard against the slow path surfacing in other program shapes."""
    return table[ids]


def _emb_fwd(table, ids):
    return table[ids], (ids, table.shape)


def _emb_bwd(res, g):
    ids, shape = res
    flat_ids = ids.reshape(-1)
    gf = g.reshape(-1, shape[-1])
    order = jnp.argsort(flat_ids)
    dtable = jnp.zeros(shape, g.dtype).at[flat_ids[order]].add(
        gf[order], indices_are_sorted=True)
    return dtable, None


embedding_lookup.defvjp(_emb_fwd, _emb_bwd)


# ---------------------------------------------------------------------------
# Stacked-vs-per-layer encoder parameter layouts (training-path optimization)
# ---------------------------------------------------------------------------

def _is_tuple(x):
    return isinstance(x, tuple)


def unstack_layer_params(params: Params, num_layers: int,
                         subtree: str = "encoder") -> Params:
    """Replace every stacked [L, ...] array leaf under ``params[subtree]``
    with a tuple of L per-layer arrays.

    Why: differentiating w.r.t. stacked per-layer weights makes the backward
    write each layer's dW into the stacked tensor — XLA materializes one
    dynamic-update-slice copy of the FULL stacked buffer per layer per
    microbatch (~22 ms/step of the UC2 recipe, measured). With per-layer
    leaves each dW is an independent output and those copies vanish; the
    leading-axis slices taken here are contiguous views of the stacked
    buffer. Restack gradients with :func:`restack_layer_tree` before the
    optimizer so checkpoints / masks / shardings keep the stacked layout."""
    if subtree not in params or num_layers <= 0:
        return params
    out = dict(params)
    out[subtree] = jax.tree.map(
        lambda x: tuple(x[l] for l in range(num_layers)), params[subtree])
    return out


def restack_layer_tree(tree: Params, subtree: str = "encoder") -> Params:
    """Inverse of unstack_layer_params on any structurally-matching pytree
    (e.g. the gradient tree): stacks per-layer tuples back to [L, ...]."""
    if subtree not in tree:
        return tree
    out = dict(tree)
    out[subtree] = jax.tree.map(
        lambda x: jnp.stack(x) if _is_tuple(x) else x,
        tree[subtree], is_leaf=_is_tuple)
    return out


def apply_blocks(block, h, stacked: Params, layer_rngs, num_layers: int, *,
                 remat: bool = False, unroll: bool = False):
    """Run ``block(h, (per_layer_params, rng)) -> (h, None)`` over all
    layers. Per-layer-tuple leaves (training path) -> static Python loop
    with independent grad leaves; stacked array leaves -> ``lax.scan``
    (optionally unrolled)."""
    block_fn = jax.checkpoint(block) if remat else block
    if any(map(_is_tuple, jax.tree.leaves(stacked, is_leaf=_is_tuple))):
        for l in range(num_layers):
            p_l = jax.tree.map(lambda t: t[l], stacked, is_leaf=_is_tuple)
            h, _ = block_fn(h, (p_l, layer_rngs[l]))
        return h
    h, _ = jax.lax.scan(block_fn, h, (stacked, layer_rngs),
                        unroll=num_layers if unroll else 1)
    return h
