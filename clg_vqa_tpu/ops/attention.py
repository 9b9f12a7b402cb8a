"""Fused joint-sequence attention (Pallas TPU kernels).

The CLG-VQA encoders attend over tiny joint sequences (UC2: 40+36=76 tokens,
M3P: 100+40=140) — far below flash-attention territory, but the XLA path
still materializes [B, H, S, S] score/prob tensors in HBM between ops. These
kernels fuse QK^T -> +bias -> softmax -> (dropout) -> PV entirely in VMEM
per (batch, head) tile, so scores never touch HBM.

Two entry points:

``fused_attention`` — forward-only (serving/eval path), head-blocked grid.
Numerics match layers.multi_head_attention with scale applied post-QK^T
and fp32 softmax. Measured on v5e: at bs 256 / S=76 the kernel loses
(4.2 vs 1.5 ms — XLA's batched-matmul fusion wins when the score tensor
is small), but at eval scale (bs 1024 / S=140, where the fp32 probs are
963 MB/block) it WINS 15 vs 25 ms/call — M3P full-scale eval
2028 -> 2707 QA/s (the round-3 bf16 bs>=512 default).

``fused_attention_flat`` — forward-only flat-boundary variant and the
round-4 bf16 bs>=512 eval DEFAULT for BOTH models (eval/runner.run_eval
auto mode -> forward(fused_attn="flat")): q/k/v keep the projections'
[B, S, H*hd] layout, heads looped in-kernel. Same-day serialized A/B at
bs 1024 (full predict step): M3P 3418 vs 2527 (blocked) vs 1951 (XLA)
QA/s; UC2 5258 vs 4365 vs 4254 — the blocked kernel was only a wash at
S=76, the flat one wins on both. The XLA path remains default for fp32
parity mode and serving-size batches.

``fused_attention_train`` — custom-VJP training variant with IN-KERNEL
dropout (pltpu.prng bits, the same u8-threshold semantics as
layers.dropout): the backward re-seeds the identical PRNG stream and
recomputes probs + mask in VMEM, so neither the [B,H,S,S] probs nor the
dropout mask ever touch HBM, and the {2,0,1}<->{1,2,0} activation relayout
copies XLA inserts around the head reshapes (~27 ms/step at M3P bs128
S=140, XProf in docs/PERFORMANCE.md round 3) disappear with them.
Same-day on-chip A/B (round 4, tools/profile_train.py --fused-attn):
M3P 264.2 -> 250.9 ms/step (969 -> 1020 QA/s, WIN); UC2 138.9 vs
128.5 ms (LOSS at S=76). The remaining overhead was ~18 ms of
[B,S,H,hd]<->[B,H,S,hd] transpose_jvp around the kernel boundary in the
backward (head split/merge lived outside the kernel).

``fused_attention_train_flat`` — the flat-boundary variant that removed
that overhead and is now the DEFAULT for BOTH recipes in bf16 on TPU
(FinetuneRunner fused_attn='auto'): q/k/v keep the projections' natural
[B, S, H*hd] layout end to end and heads are looped INSIDE the kernel
over static 64-aligned lane slices, so the split/merge transposes and
their backward twins never exist at all. Same-day A/B vs the XLA path:
M3P 253.5 -> 213.7 ms/step (1010 -> 1198 QA/s, +18.6%), UC2 130.0 ->
124.2 (1970 -> 2062 QA/s, +4.7%) — the first kernel that also beats XLA
at UC2's S=76. The head-blocked kernel stays as the grid-parallel
reference implementation (both models run hd=64, so the in-kernel head
slices land on 64-aligned lane offsets).
The dropout stream is the kernel PRNG's (seeded from the same fold_in
chain), statistically equivalent to layers.dropout but not bit-equal —
tools/check_attention_tpu.py verifies the 7 on-chip properties (fwd
parity, VJP parity vs XLA at p=0, keep-rate, determinism, seed/offset
decorrelation, bwd/fwd mask agreement, bf16 commutation).
"""
from __future__ import annotations

import contextlib
import contextvars
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# GSPMD integration: under a (dp, mp) mesh the flat kernels are wrapped in
# jax.shard_map — the grid is batch-tiled, so the kernel is embarrassingly
# parallel over dp, and the in-kernel head loop splits cleanly over
# Megatron-mp head groups (q/k/v activations arrive [B, S, HD/mp]-sharded
# from the column-parallel projections, parallel/mesh._pspec_for). The
# sharded step builders (train/loop.shard_train_step,
# eval/runner.shard_predict_step) enter ``gspmd_attention(mesh)`` around
# every call/lower of their jitted step, so the wrap is applied exactly when
# tracing a multi-chip program and single-device callers are untouched.
# ---------------------------------------------------------------------------

_GSPMD: contextvars.ContextVar = contextvars.ContextVar(
    "attn_gspmd_mesh", default=None)


@contextlib.contextmanager
def gspmd_attention(mesh, dp_axis: str = "dp", mp_axis: str = "mp"):
    """While active, the flat attention entries shard_map themselves over
    ``mesh``: batch split on ``dp_axis``, in-kernel head loop split on
    ``mp_axis``. Entered by the sharded step builders around trace time."""
    tok = _GSPMD.set((mesh, dp_axis, mp_axis))
    try:
        yield
    finally:
        _GSPMD.reset(tok)


def _gspmd_ctx(B: int, HD: int, num_heads: int):
    """Validated (mesh, dp, mp, local_heads) for the ambient GSPMD context,
    or None single-device. Divisibility failures raise loudly at trace time
    rather than letting the partitioner produce a silent full-replication."""
    ctx = _GSPMD.get()
    if ctx is None:
        return None
    mesh, dp, mp = ctx
    n_dp, n_mp = mesh.shape[dp], mesh.shape[mp]
    if B % n_dp:
        raise ValueError(f"flat attention under GSPMD needs batch {B} "
                         f"divisible by dp={n_dp}")
    if num_heads % n_mp:
        raise ValueError(f"flat attention under GSPMD needs num_heads "
                         f"{num_heads} divisible by mp={n_mp}")
    return mesh, dp, mp, num_heads // n_mp


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    # blocks: q/k/v [BT, 1, S, D], bias [BT, 1, S], out [BT, 1, S, D]
    q = q_ref[:, 0].astype(jnp.float32)           # [BT, S, D]
    k = k_ref[:, 0].astype(jnp.float32)
    v = v_ref[:, 0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale   # [BT, S, S]
    scores = scores + bias_ref[:]                 # [BT, 1, S] -> broadcast
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:, 0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads",))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """q/k/v: [B, S, H*D] (pre-projected); bias: [B, 1, 1, S] additive.
    Returns [B, S, H*D]. S is padded internally to a multiple of 8."""
    B, S, HD = q.shape
    D = HD // num_heads
    S_pad = -(-S // 8) * 8

    def split(x):
        x = x.reshape(B, S, num_heads, D).transpose(0, 2, 1, 3)
        return jnp.pad(x, ((0, 0), (0, 0), (0, S_pad - S), (0, 0)))

    qh, kh, vh = split(q), split(k), split(v)
    # key-side bias, padded keys masked out
    b2 = jnp.pad(bias[:, 0, 0, :], ((0, 0), (0, S_pad - S)),
                 constant_values=-1e9)[:, None, :]         # [B, 1, S_pad]

    BT = max(1, min(16, B))
    while B % BT:
        BT -= 1
    grid = (B // BT, num_heads)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=1.0 / math.sqrt(D)),
        out_shape=jax.ShapeDtypeStruct((B, num_heads, S_pad, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BT, 1, S_pad, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 1, S_pad, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 1, S_pad, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 1, S_pad), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, 1, S_pad, D), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
    )(qh, kh, vh, b2)
    out = out[:, :, :S, :].transpose(0, 2, 1, 3).reshape(B, S, HD)
    return out


# ---------------------------------------------------------------------------
# Training kernel: custom VJP + in-kernel dropout
# ---------------------------------------------------------------------------

def _cell_seed(seed_ref):
    # distinct PRNG stream per (batch-tile, head) grid cell; both kernels
    # derive the SAME seed so the backward replays the forward's exact
    # dropout mask without ever materializing it
    pltpu.prng_seed(seed_ref[0, 0]
                    + pl.program_id(0) * 16384 + pl.program_id(1))


def _keep_mask(shape, keep_t: int):
    """u8-threshold keep mask (same semantics as layers.dropout: keep where
    (bits & 255) < keep_t, rescale by 256/keep_t)."""
    bits = pltpu.prng_random_bits(shape)           # uint32
    return (bits & jnp.uint32(255)) < jnp.uint32(keep_t)


def _probs(q_ref, k_ref, bias_ref, scale):
    q = q_ref[:, 0].astype(jnp.float32)            # [BT, S, D]
    k = k_ref[:, 0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    scores = scores + bias_ref[:]                  # [BT, 1, S] broadcast
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.sum(e, axis=-1, keepdims=True), q, k


def _train_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
                      *, scale: float, keep_t: int):
    if keep_t < 256:
        _cell_seed(seed_ref)
    p, _, _ = _probs(q_ref, k_ref, bias_ref, scale)
    if keep_t < 256:
        p = jnp.where(_keep_mask(p.shape, keep_t), p * (256.0 / keep_t), 0.0)
    v = v_ref[:, 0].astype(jnp.float32)
    out = jax.lax.dot_general(
        p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:, 0] = out.astype(o_ref.dtype)


def _train_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                      dq_ref, dk_ref, dv_ref, db_ref,
                      *, scale: float, keep_t: int):
    if keep_t < 256:
        _cell_seed(seed_ref)
    p, q, k = _probs(q_ref, k_ref, bias_ref, scale)   # pre-dropout probs
    if keep_t < 256:
        # identical PRNG call sequence as the forward -> identical mask
        keep = _keep_mask(p.shape, keep_t)
        r = 256.0 / keep_t
        pd = jnp.where(keep, p * r, 0.0)              # dropped+rescaled
    else:
        pd = p
    v = v_ref[:, 0].astype(jnp.float32)
    do = do_ref[:, 0].astype(jnp.float32)
    # out = pd @ v
    dv = jax.lax.dot_general(                         # pd^T do -> [BT,Sk,D]
        pd, do, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dpd = jax.lax.dot_general(                        # do v^T -> [BT,Sq,Sk]
        do, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dp = jnp.where(keep, dpd * r, 0.0) if keep_t < 256 else dpd
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(                         # ds k -> [BT,Sq,D]
        ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(                         # ds^T q -> [BT,Sk,D]
        ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    dq_ref[:, 0] = dq.astype(dq_ref.dtype)
    dk_ref[:, 0] = dk.astype(dk_ref.dtype)
    dv_ref[:, 0] = dv.astype(dv_ref.dtype)
    # bias grad: accumulate sum over queries ACROSS the head grid dim (the
    # db block has the same index for every h, so it stays resident and the
    # h-loop accumulates into it; h is the minor/fastest grid dim)
    @pl.when(pl.program_id(1) == 0)
    def _init():
        db_ref[:] = jnp.zeros_like(db_ref)

    db_ref[:, 0] += jnp.sum(ds, axis=1).astype(db_ref.dtype)


def _bt(B: int) -> int:
    bt = max(1, min(8, B))
    while B % bt:
        bt -= 1
    return bt


def _specs(B, H, S_pad, D, bt):
    qkv = pl.BlockSpec((bt, 1, S_pad, D), lambda b, h: (b, h, 0, 0),
                       memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((bt, 1, S_pad), lambda b, h: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((1, 1), lambda b, h: (0, 0),
                        memory_space=pltpu.SMEM)
    return qkv, bias, seed


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _attn_train_core(qh, kh, vh, b2, seed, keep_t):
    out, _ = _attn_train_fwd(qh, kh, vh, b2, seed, keep_t)
    return out


def _attn_train_fwd(qh, kh, vh, b2, seed, keep_t):
    B, H, S_pad, D = qh.shape
    bt = _bt(B)
    qkv, bias, seedspec = _specs(B, H, S_pad, D, bt)
    out = pl.pallas_call(
        functools.partial(_train_fwd_kernel, scale=1.0 / math.sqrt(D),
                          keep_t=keep_t),
        out_shape=jax.ShapeDtypeStruct((B, H, S_pad, D), qh.dtype),
        grid=(B // bt, H),
        in_specs=[seedspec, qkv, qkv, qkv, bias],
        out_specs=qkv,
    )(seed, qh, kh, vh, b2)
    return out, (qh, kh, vh, b2, seed)


def _attn_train_bwd(keep_t, res, g):
    qh, kh, vh, b2, seed = res
    B, H, S_pad, D = qh.shape
    bt = _bt(B)
    qkv, bias, seedspec = _specs(B, H, S_pad, D, bt)
    dq, dk, dv, db = pl.pallas_call(
        functools.partial(_train_bwd_kernel, scale=1.0 / math.sqrt(D),
                          keep_t=keep_t),
        out_shape=[jax.ShapeDtypeStruct((B, H, S_pad, D), qh.dtype),
                   jax.ShapeDtypeStruct((B, H, S_pad, D), kh.dtype),
                   jax.ShapeDtypeStruct((B, H, S_pad, D), vh.dtype),
                   jax.ShapeDtypeStruct((B, 1, S_pad), jnp.float32)],
        grid=(B // bt, H),
        in_specs=[seedspec, qkv, qkv, qkv, bias, qkv],
        out_specs=[qkv, qkv, qkv, bias],
    )(seed, qh, kh, vh, b2, g)
    import numpy as np
    dseed = np.zeros(seed.shape, jax.dtypes.float0)   # int primal -> float0
    return dq, dk, dv, db, dseed


_attn_train_core.defvjp(lambda qh, kh, vh, b2, seed, keep_t:
                        _attn_train_fwd(qh, kh, vh, b2, seed, keep_t),
                        _attn_train_bwd)


def _dropout_seed(dropout_rate: float, rng):
    """(keep_t, seed) pair shared by the train entries: u8 keep threshold
    with layers.dropout rounding, one int32 seed scalar for the kernel PRNG
    (shaped [1,1] for SMEM)."""
    t = 256
    if dropout_rate > 0.0:
        t = max(int(round((1.0 - dropout_rate) * 256.0)), 1)
    if t < 256 and rng is None:
        raise ValueError("dropout_rate > 0 requires an rng key")
    seed = (jax.random.bits(rng, (1, 1), jnp.uint32).astype(jnp.int32)
            if t < 256 else jnp.zeros((1, 1), jnp.int32))
    return t, seed


def fused_attention_train_hm(qh: jnp.ndarray, kh: jnp.ndarray,
                             vh: jnp.ndarray, bias: jnp.ndarray, *,
                             dropout_rate: float = 0.0,
                             rng=None) -> jnp.ndarray:
    """Head-major training entry: q/k/v arrive PRE-SPLIT as [B, H, S, hd]
    (the kernel's native block layout) and the context returns [B, H, S, hd].

    fused_attention_train pays a [B,S,H*hd] -> [B,H,S,hd] transpose per
    operand outside the kernel — and their transpose_jvp twins on the
    backward (~18 ms/step at M3P bs128, docs/PERFORMANCE.md round 4). When
    the caller can project INTO head-major and consume head-major out (see
    layers.multi_head_attention fused='hm'), those transposes never exist.
    bias: [B, 1, 1, S] additive key-side, same contract as the flat entry.

    Measured same-day and REJECTED as a default (M3P 252.9 vs 250.9 ms
    flat, UC2 144.1 vs 138.9): the head-major projection einsums lose the
    MXU efficiency the removed transposes saved. Kept as a tested opt-in;
    docs/PERFORMANCE.md "Head-major kernel feed".
    """
    B, H, S, D = qh.shape
    S_pad = -(-S // 8) * 8
    if S_pad != S:
        pad = ((0, 0), (0, 0), (0, S_pad - S), (0, 0))
        qh, kh, vh = jnp.pad(qh, pad), jnp.pad(kh, pad), jnp.pad(vh, pad)
    b2 = jnp.pad(bias[:, 0, 0, :], ((0, 0), (0, S_pad - S)),
                 constant_values=-1e9)[:, None, :]          # [B, 1, S_pad]
    t, seed = _dropout_seed(dropout_rate, rng)
    out = _attn_train_core(qh, kh, vh, b2, seed, t)
    return out[:, :, :S, :]


# ---------------------------------------------------------------------------
# Flat-boundary training kernel: heads are looped INSIDE the kernel over
# static 64-aligned lane slices of the [B, S, H*hd] blocks, so the
# [B,S,H*hd] <-> [B,H,S,hd] split/merge transposes — and their
# transpose_jvp twins on the backward (~18 ms/step at M3P bs128,
# docs/PERFORMANCE.md round 4) — never exist at all. Same dropout
# semantics as the head-blocked kernel (sequential per-head PRNG draws;
# the backward replays the identical call sequence).
# ---------------------------------------------------------------------------

def _flat_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
                     *, scale: float, keep_t: int, num_heads: int):
    # blocks: q/k/v/o [BT, S, HD], bias [BT, 1, S]
    if keep_t < 256:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    hd = q_ref.shape[-1] // num_heads
    b = bias_ref[:]                                   # [BT, 1, S]
    for h in range(num_heads):
        sl = pl.ds(h * hd, hd)
        q = q_ref[:, :, sl].astype(jnp.float32)       # [BT, S, hd]
        k = k_ref[:, :, sl].astype(jnp.float32)
        v = v_ref[:, :, sl].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        scores = scores + b
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        if keep_t < 256:
            p = jnp.where(_keep_mask(p.shape, keep_t),
                          p * (256.0 / keep_t), 0.0)
        out = jax.lax.dot_general(
            p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, :, sl] = out.astype(o_ref.dtype)


def _flat_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, db_ref,
                     *, scale: float, keep_t: int, num_heads: int):
    if keep_t < 256:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    hd = q_ref.shape[-1] // num_heads
    b = bias_ref[:]
    db_acc = jnp.zeros(db_ref.shape, jnp.float32)
    for h in range(num_heads):
        sl = pl.ds(h * hd, hd)
        q = q_ref[:, :, sl].astype(jnp.float32)
        k = k_ref[:, :, sl].astype(jnp.float32)
        v = v_ref[:, :, sl].astype(jnp.float32)
        do = do_ref[:, :, sl].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        scores = scores + b
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        if keep_t < 256:
            # identical PRNG call sequence as the forward -> identical masks
            keep = _keep_mask(p.shape, keep_t)
            r = 256.0 / keep_t
            pd = jnp.where(keep, p * r, 0.0)
        else:
            pd = p
        dv = jax.lax.dot_general(                     # pd^T do
            pd, do, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dpd = jax.lax.dot_general(                    # do v^T
            do, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dp = jnp.where(keep, dpd * r, 0.0) if keep_t < 256 else dpd
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jax.lax.dot_general(
            ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)
        db_acc = db_acc + jnp.sum(ds, axis=1)[:, None, :]
    db_ref[:] = db_acc.astype(db_ref.dtype)


def _bt_flat(B: int, S: int, HD: int) -> int:
    """Largest batch tile keeping the kernel's resident blocks under a
    conservative VMEM budget (inputs double-buffer across grid steps).

    Sized for the BACKWARD's block set (10 q/k/v/do/dq/dk/dv-sized blocks
    incl. double buffering) and used by the forward too: the dropout mask
    is a per-grid-cell PRNG stream (prng_seed(seed + program_id)), so the
    forward and backward MUST run the identical grid for the backward's
    replay to realize the same mask (checked on chip by
    tools/check_attention_tpu.py --flat, property 6a)."""
    budget = 10 * 1024 * 1024
    per_sample = 8 * S * HD * 2 * 2 + 3 * S * S * 4   # bf16 blocks x2buf
    bt = max(1, min(8, budget // max(per_sample, 1), B))
    while B % bt:
        bt -= 1
    return bt


def _flat_specs(S, HD, bt):
    qkv = pl.BlockSpec((bt, S, HD), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((bt, 1, S), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)
    return qkv, bias, seed


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _attn_train_core_flat(q, k, v, b2, seed, keep_t, num_heads):
    out, _ = _attn_train_flat_fwd(q, k, v, b2, seed, keep_t, num_heads)
    return out


def _attn_train_flat_fwd(q, k, v, b2, seed, keep_t, num_heads):
    B, S, HD = q.shape
    bt = _bt_flat(B, S, HD)
    qkv, bias, seedspec = _flat_specs(S, HD, bt)
    out = pl.pallas_call(
        functools.partial(_flat_fwd_kernel, scale=1.0 / math.sqrt(HD // num_heads),
                          keep_t=keep_t, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((B, S, HD), q.dtype),
        grid=(B // bt,),
        in_specs=[seedspec, qkv, qkv, qkv, bias],
        out_specs=qkv,
    )(seed, q, k, v, b2)
    return out, (q, k, v, b2, seed)


def _attn_train_flat_bwd(keep_t, num_heads, res, g):
    q, k, v, b2, seed = res
    B, S, HD = q.shape
    bt = _bt_flat(B, S, HD)
    qkv, bias, seedspec = _flat_specs(S, HD, bt)
    dq, dk, dv, db = pl.pallas_call(
        functools.partial(_flat_bwd_kernel, scale=1.0 / math.sqrt(HD // num_heads),
                          keep_t=keep_t, num_heads=num_heads),
        out_shape=[jax.ShapeDtypeStruct((B, S, HD), q.dtype),
                   jax.ShapeDtypeStruct((B, S, HD), k.dtype),
                   jax.ShapeDtypeStruct((B, S, HD), v.dtype),
                   jax.ShapeDtypeStruct((B, 1, S), jnp.float32)],
        grid=(B // bt,),
        in_specs=[seedspec, qkv, qkv, qkv, bias, qkv],
        out_specs=[qkv, qkv, qkv, bias],
    )(seed, q, k, v, b2, g)
    import numpy as np
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return dq, dk, dv, db, dseed


_attn_train_core_flat.defvjp(
    lambda q, k, v, b2, seed, keep_t, num_heads:
        _attn_train_flat_fwd(q, k, v, b2, seed, keep_t, num_heads),
    _attn_train_flat_bwd)


def _bt_flat_fwd(B: int, S: int, HD: int) -> int:
    """Forward-only batch tile: 4 resident q/k/v/o blocks (double-buffered)
    plus one head's fp32 scores/probs scratch — roomier than the
    backward-constrained _bt_flat, so eval can run larger tiles."""
    budget = 10 * 1024 * 1024
    per_sample = 4 * S * HD * 2 * 2 + 2 * S * S * 4
    bt = max(1, min(16, budget // max(per_sample, 1), B))
    while B % bt:
        bt -= 1
    return bt


def fused_attention_flat(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         bias: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Forward-only flat-boundary eval kernel: the eval counterpart of
    fused_attention_train_flat. q/k/v stay [B, S, H*hd] (the projections'
    natural layout) and heads are looped inside the kernel over static
    lane slices, so the [B,S,D]<->[B,H,S,hd] split/merge transposes the
    blocked eval kernel (fused_attention) pays outside its grid never
    exist. bias: [B, 1, 1, S] additive key-side; returns [B, S, H*hd].
    Numerics: fp32 softmax in VMEM, same family as the blocked kernel.

    Under gspmd_attention (sharded eval, runner.shard_predict_step) the
    kernel shard_maps itself over the mesh — batch on dp, head loop on mp.
    The dispatch lives OUTSIDE the jitted impl: the inner jit cache keys on
    avals only and would otherwise replay a single-device trace under a
    sharded caller."""
    g = _gspmd_ctx(q.shape[0], q.shape[-1], num_heads)
    if g is not None:
        mesh, dp, mp, local_heads = g
        from jax.sharding import PartitionSpec as P
        return jax.shard_map(
            functools.partial(_fused_attention_flat_jit,
                              num_heads=local_heads),
            mesh=mesh,
            in_specs=(P(dp, None, mp), P(dp, None, mp), P(dp, None, mp),
                      P(dp, None, None, None)),
            out_specs=P(dp, None, mp), check_vma=False)(q, k, v, bias)
    return _fused_attention_flat_jit(q, k, v, bias, num_heads=num_heads)


@functools.partial(jax.jit, static_argnames=("num_heads",))
def _fused_attention_flat_jit(q, k, v, bias, *, num_heads: int):
    B, S, HD = q.shape
    b2 = bias[:, 0, 0, :][:, None, :]                 # [B, 1, S]
    bt = _bt_flat_fwd(B, S, HD)
    qkv, bspec, seedspec = _flat_specs(S, HD, bt)
    seed = jnp.zeros((1, 1), jnp.int32)               # unused at keep_t=256
    return pl.pallas_call(
        functools.partial(_flat_fwd_kernel,
                          scale=1.0 / math.sqrt(HD // num_heads),
                          keep_t=256, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((B, S, HD), q.dtype),
        grid=(B // bt,),
        in_specs=[seedspec, qkv, qkv, qkv, bspec],
        out_specs=qkv,
    )(seed, q, k, v, b2)


def fused_attention_train_flat(q: jnp.ndarray, k: jnp.ndarray,
                               v: jnp.ndarray, bias: jnp.ndarray,
                               num_heads: int, *,
                               dropout_rate: float = 0.0,
                               rng=None) -> jnp.ndarray:
    """Flat-boundary training kernel: q/k/v stay [B, S, H*hd] end to end
    (the projections' natural output layout) and heads are looped inside
    the kernel over static 64-aligned lane slices — no head split/merge
    transposes outside the kernel, so their transpose_jvp twins never
    appear on the backward path. bias: [B, 1, 1, S] additive key-side,
    same contract as fused_attention_train."""
    B, S, HD = q.shape
    b2 = bias[:, 0, 0, :][:, None, :]                 # [B, 1, S]
    t, seed = _dropout_seed(dropout_rate, rng)
    g = _gspmd_ctx(B, HD, num_heads)
    if g is not None:
        mesh, dp, mp, local_heads = g
        from jax.sharding import PartitionSpec as P

        def body(q, k, v, b2, seed):
            # decorrelate the per-shard dropout streams: each (dp, mp)
            # shard re-runs the same grid/program_id range, so without an
            # offset every shard would draw identical masks. A flat shard
            # rank (dp-major) times a stride exceeding any per-shard grid
            # keeps every shard's stream disjoint for up to 2^11 shards
            # (int32 headroom); the backward replays the same offsets
            # (axis_index is stable across the custom-vjp fwd/bwd pair).
            rank = (jax.lax.axis_index(dp) * mesh.shape[mp]
                    + jax.lax.axis_index(mp))
            off = (rank * (1 << 20)).astype(jnp.int32)
            return _attn_train_core_flat(q, k, v, b2, seed + off, t,
                                         local_heads)

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(dp, None, mp), P(dp, None, mp), P(dp, None, mp),
                      P(dp, None, None), P(None, None)),
            out_specs=P(dp, None, mp), check_vma=False)(q, k, v, b2, seed)
    return _attn_train_core_flat(q, k, v, b2, seed, t, num_heads)


# ---------------------------------------------------------------------------
# Projected-boundary training kernel ("proj"): the WHOLE attention block —
# q/k/v projections, the flat attention core with in-kernel dropout, and the
# output projection — runs inside Pallas. Motivation (docs/PERFORMANCE.md
# round 4 cont.): with the flat kernel, XProf still shows 12 per-layer
# ~2.0 ms layout-assignment copies + ~1.6 ms fusions at the Pallas
# custom-call boundary (Mosaic operands must be row-major; XLA prefers
# S-on-lane layouts for the surrounding projection GEMMs). Moving the
# projections inside the kernel deletes those interfaces: the only
# activation tensors that cross the XLA<->kernel boundary are x (in) and
# y (out) on the forward, and g (in) / dx (out) on the backward — all of
# which neighbor layout-agnostic elementwise fusions (LN, residual adds).
#
# Structure:
#   fwd    : x, Wq,bq, Wk,bk, Wv,bv, Wo,bo, bias, seed -> y, q, k, v
#            (q/k/v are written out as residuals — the same HBM traffic the
#            unfused path pays for its projection outputs, no extra FLOPs)
#   bwd-A  : g, q, k, v, Wo, bias, seed -> dq, dk, dv, dWo, dbo, dbias
#            (replays the identical per-(grid-cell, head) PRNG stream as the
#            forward — the two calls share one _bt_proj tiling — and
#            recomputes probs + per-head ctx in VMEM)
#   bwd-B  : three _linear_bwd calls (x, d?, W?) -> dx?, dW?, db? — the
#            projection backward GEMMs with dW accumulated in an fp32
#            output block resident across the batch grid; dx = dxq+dxk+dxv.
#
# Weight grads are accumulated in fp32 across grid steps and rounded to the
# operand dtype once at the custom-vjp boundary — the same single bf16
# rounding the XLA path's dot-VJP applies.
# ---------------------------------------------------------------------------

def _keep_mask_sh(seed_ref, sample: int, h: int, S: int, keep_t: int):
    """Per-(absolute sample, head) dropout keep mask. Seeding by sample
    index — not grid cell — makes the realized mask INDEPENDENT of the
    batch tiling, so the forward and backward kernels may run different
    tiles (the backward's VMEM budget is tighter) and still replay the
    identical stream. num_heads <= 16 on every CLG-VQA config."""
    pltpu.prng_seed(seed_ref[0, 0] + sample * 16 + h)
    bits = pltpu.prng_random_bits((S, S))
    return (bits & jnp.uint32(255)) < jnp.uint32(keep_t)


def _proj_fwd_kernel(seed_ref, x_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                     wv_ref, bv_ref, wo_ref, bo_ref, bias_ref,
                     y_ref, q_ref, k_ref, v_ref, ctx_ref,
                     *, scale: float, keep_t: int, num_heads: int):
    # blocks: x/y/q/k/v [BT, S, HD]; w* [HD, HD]; b* [1, HD]; bias [BT, 1, S]
    x = x_ref[:]
    dn = (((2,), (0,)), ((), ()))           # [BT,S,D] @ [D,D] -> [BT,S,D]
    q = (jax.lax.dot_general(x, wq_ref[:], dn,
                             preferred_element_type=jnp.float32)
         + bq_ref[0]).astype(x.dtype)
    k = (jax.lax.dot_general(x, wk_ref[:], dn,
                             preferred_element_type=jnp.float32)
         + bk_ref[0]).astype(x.dtype)
    v = (jax.lax.dot_general(x, wv_ref[:], dn,
                             preferred_element_type=jnp.float32)
         + bv_ref[0]).astype(x.dtype)
    q_ref[:], k_ref[:], v_ref[:] = q, k, v
    bt = x.shape[0]
    S = x.shape[1]
    base = pl.program_id(0) * bt
    hd = q.shape[-1] // num_heads
    b = bias_ref[:]
    for h in range(num_heads):
        lo = h * hd
        qh = q[:, :, lo:lo + hd].astype(jnp.float32)
        kh = k[:, :, lo:lo + hd].astype(jnp.float32)
        vh = v[:, :, lo:lo + hd].astype(jnp.float32)
        scores = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        scores = scores + b
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        if keep_t < 256:
            keep = jnp.stack([_keep_mask_sh(seed_ref, base + i, h, S, keep_t)
                              for i in range(bt)])
            p = jnp.where(keep, p * (256.0 / keep_t), 0.0)
        out = jax.lax.dot_general(
            p, vh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ctx_ref[:, :, lo:lo + hd] = out.astype(ctx_ref.dtype)
    y = (jax.lax.dot_general(ctx_ref[:], wo_ref[:], dn,
                             preferred_element_type=jnp.float32)
         + bo_ref[0]).astype(x.dtype)
    y_ref[:] = y


def _proj_bwda_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, g_ref, wo_ref,
                      dq_ref, dk_ref, dv_ref, dwo_ref, dbo_ref, db_ref,
                      ctx_ref,
                      *, scale: float, keep_t: int, num_heads: int):
    bt = q_ref.shape[0]
    S = q_ref.shape[1]
    base = pl.program_id(0) * bt
    hd = q_ref.shape[-1] // num_heads
    g = g_ref[:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwo_ref[:] = jnp.zeros_like(dwo_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)

    dbo_ref[:] += jnp.sum(g.astype(jnp.float32), axis=(0, 1))[None, :]
    # dctx = g @ Wo^T (fp32) — the per-head "do" of the flat kernel's bwd
    dctx = jax.lax.dot_general(
        g, wo_ref[:], dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    b = bias_ref[:]
    db_acc = jnp.zeros(db_ref.shape, jnp.float32)
    for h in range(num_heads):
        lo = h * hd
        qh = q_ref[:, :, lo:lo + hd].astype(jnp.float32)
        kh = k_ref[:, :, lo:lo + hd].astype(jnp.float32)
        vh = v_ref[:, :, lo:lo + hd].astype(jnp.float32)
        scores = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        scores = scores + b
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        if keep_t < 256:
            # identical per-(sample, head) streams as the forward ->
            # identical masks, regardless of either pass's batch tiling
            keep = jnp.stack([_keep_mask_sh(seed_ref, base + i, h, S, keep_t)
                              for i in range(bt)])
            r = 256.0 / keep_t
            pd = jnp.where(keep, p * r, 0.0)
        else:
            pd = p
        # recompute the forward's (post-dropout) per-head context for dWo
        ctx_h = jax.lax.dot_general(
            pd, vh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ctx_ref[:, :, lo:lo + hd] = ctx_h.astype(ctx_ref.dtype)
        do = dctx[:, :, lo:lo + hd]
        dv = jax.lax.dot_general(
            pd, do, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dpd = jax.lax.dot_general(
            do, vh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dp = jnp.where(keep, dpd * r, 0.0) if keep_t < 256 else dpd
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jax.lax.dot_general(
            ds, kh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            ds, qh, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dq_ref[:, :, lo:lo + hd] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, lo:lo + hd] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, lo:lo + hd] = dv.astype(dv_ref.dtype)
        db_acc = db_acc + jnp.sum(ds, axis=1)[:, None, :]
    db_ref[:] = db_acc
    # dWo = sum_i ctx_i^T @ g_i — one K=S GEMM per sample (static loop; a
    # merged [BT*S, D] reshape is not a safe Mosaic lowering at S % 8 != 0)
    for i in range(bt):
        dwo_ref[:] += jax.lax.dot_general(
            ctx_ref[i], g[i], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _linear_bwd_kernel(x_ref, dy_ref, w_ref, dx_ref, dw_ref, dbv_ref):
    """Backward of y = x @ w + b over a batch grid: dx (per tile), dw/db
    (fp32, accumulated across grid steps in resident output blocks)."""
    bt = x_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        dbv_ref[:] = jnp.zeros_like(dbv_ref)

    dy = dy_ref[:]
    dbv_ref[:] += jnp.sum(dy.astype(jnp.float32), axis=(0, 1))[None, :]
    dx = jax.lax.dot_general(
        dy, w_ref[:], dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[:] = dx.astype(dx_ref.dtype)
    for i in range(bt):
        dw_ref[:] += jax.lax.dot_general(
            x_ref[i], dy[i], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _bt_proj_fwd(B: int, S: int, HD: int, es: int) -> int:
    """Forward batch tile. The per-(sample, head) PRNG seeding
    (_keep_mask_sh) makes the dropout mask tiling-independent, so the
    forward and backward choose tiles separately. ``es`` is the operand
    itemsize (2 on the bf16 production path, 4 when the parity checker
    runs fp32 on chip)."""
    budget = 11 * 1024 * 1024
    fixed = 4 * HD * HD * es                 # 4 resident weights
    per = 11 * S * HD * es + 20 * S * S      # x in + 4 outs (2-buf) + temps
    bt = max(1, min(8, (budget - fixed) // max(per, 1), B))
    while B % bt:
        bt -= 1
    return bt


def _bt_proj_bwd(B: int, S: int, HD: int, es: int) -> int:
    """Backward-A batch tile — the tight one: XLA's scoped-vmem accounting
    charges the kernel AND concurrently-live fusions against the 16 MB
    budget inside the full train step (measured: bt=2 at S=140 compiled
    standalone but OOM'd by 2.28M in the step), so this stays well under
    half the physical VMEM."""
    budget = 9 * 1024 * 1024
    fixed = (es + 4) * HD * HD               # Wo + fp32 dWo resident
    per = 15 * S * HD * es + 4 * S * HD + 24 * S * S
    bt = max(1, min(8, (budget - fixed) // max(per, 1), B))
    while B % bt:
        bt -= 1
    return bt


def _bt_linb(B: int, S: int, HD: int, es: int) -> int:
    budget = 10 * 1024 * 1024
    fixed = (es + 4) * HD * HD               # W + fp32 dW resident
    per = 6 * S * HD * es + 4 * S * HD
    bt = max(1, min(8, (budget - fixed) // max(per, 1), B))
    while B % bt:
        bt -= 1
    return bt


def _wspec(HD):
    return pl.BlockSpec((HD, HD), lambda b: (0, 0), memory_space=pltpu.VMEM)


def _bvspec(HD):
    return pl.BlockSpec((1, HD), lambda b: (0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def _attn_block_core(x, wq, bq, wk, bk, wv, bv, wo, bo, b2, seed,
                     keep_t, num_heads):
    y, _ = _attn_block_fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, b2, seed,
                           keep_t, num_heads)
    return y


def _attn_block_fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, b2, seed,
                    keep_t, num_heads):
    B, S, HD = x.shape
    bt = _bt_proj_fwd(B, S, HD, x.dtype.itemsize)
    qkv, bias, seedspec = _flat_specs(S, HD, bt)
    wspec, bvspec = _wspec(HD), _bvspec(HD)
    bvecs = [a.reshape(1, HD).astype(jnp.float32) for a in (bq, bk, bv, bo)]
    y, q, k, v = pl.pallas_call(
        functools.partial(_proj_fwd_kernel,
                          scale=1.0 / math.sqrt(HD // num_heads),
                          keep_t=keep_t, num_heads=num_heads),
        out_shape=[jax.ShapeDtypeStruct((B, S, HD), x.dtype)] * 4,
        grid=(B // bt,),
        in_specs=[seedspec, qkv, wspec, bvspec, wspec, bvspec,
                  wspec, bvspec, wspec, bvspec, bias],
        out_specs=[qkv, qkv, qkv, qkv],
        scratch_shapes=[pltpu.VMEM((bt, S, HD), x.dtype)],
    )(seed, x, wq, bvecs[0], wk, bvecs[1], wv, bvecs[2], wo, bvecs[3], b2)
    # bq..bo ride the residuals only to pin their cotangent DTYPES (the
    # kernel accumulates db* in fp32; [D]-sized, negligible)
    return y, (x, q, k, v, b2, seed, wq, wk, wv, wo, bq, bk, bv, bo)


def _linear_bwd(x, dy, w):
    B, S, HD = x.shape
    bt = _bt_linb(B, S, HD, x.dtype.itemsize)
    qkv, _, _ = _flat_specs(S, HD, bt)
    dx, dw32, db32 = pl.pallas_call(
        _linear_bwd_kernel,
        out_shape=[jax.ShapeDtypeStruct((B, S, HD), x.dtype),
                   jax.ShapeDtypeStruct((HD, HD), jnp.float32),
                   jax.ShapeDtypeStruct((1, HD), jnp.float32)],
        grid=(B // bt,),
        in_specs=[qkv, qkv, _wspec(HD)],
        out_specs=[qkv, _wspec(HD), _bvspec(HD)],
    )(x, dy, w)
    return dx, dw32.astype(w.dtype), db32[0]


def _attn_block_bwd(keep_t, num_heads, res, g):
    x, q, k, v, b2, seed, wq, wk, wv, wo, bq, bk, bv, bo = res
    bdt = (bq.dtype, bk.dtype, bv.dtype, bo.dtype)
    B, S, HD = x.shape
    bt = _bt_proj_bwd(B, S, HD, x.dtype.itemsize)
    qkv, bias, seedspec = _flat_specs(S, HD, bt)
    dq, dk, dv, dwo32, dbo32, db2 = pl.pallas_call(
        functools.partial(_proj_bwda_kernel,
                          scale=1.0 / math.sqrt(HD // num_heads),
                          keep_t=keep_t, num_heads=num_heads),
        out_shape=[jax.ShapeDtypeStruct((B, S, HD), x.dtype),
                   jax.ShapeDtypeStruct((B, S, HD), x.dtype),
                   jax.ShapeDtypeStruct((B, S, HD), x.dtype),
                   jax.ShapeDtypeStruct((HD, HD), jnp.float32),
                   jax.ShapeDtypeStruct((1, HD), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, S), jnp.float32)],
        grid=(B // bt,),
        in_specs=[seedspec, qkv, qkv, qkv, bias, qkv, _wspec(HD)],
        out_specs=[qkv, qkv, qkv, _wspec(HD), _bvspec(HD), bias],
        scratch_shapes=[pltpu.VMEM((bt, S, HD), x.dtype)],
    )(seed, q, k, v, b2, g, wo)
    dxq, dwq, dbq = _linear_bwd(x, dq, wq)
    dxk, dwk, dbk = _linear_bwd(x, dk, wk)
    dxv, dwv, dbv = _linear_bwd(x, dv, wv)
    import numpy as np
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return (dxq + dxk + dxv, dwq, dbq.astype(bdt[0]), dwk,
            dbk.astype(bdt[1]), dwv, dbv.astype(bdt[2]),
            dwo32.astype(wo.dtype), dbo32[0].astype(bdt[3]),
            db2.astype(b2.dtype), dseed)


_attn_block_core.defvjp(
    lambda x, wq, bq, wk, bk, wv, bv, wo, bo, b2, seed, keep_t, num_heads:
        _attn_block_fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, b2, seed,
                        keep_t, num_heads),
    _attn_block_bwd)


def fused_attention_block(x: jnp.ndarray, wq, bq, wk, bk, wv, bv, wo, bo,
                          bias: jnp.ndarray, num_heads: int, *,
                          dropout_rate: float = 0.0,
                          rng=None) -> jnp.ndarray:
    """Whole-block training kernel ("proj"): y = (attn(x Wq, x Wk, x Wv)
    + dropout) Wo + bo computed entirely in Pallas — see the module
    docstring block above for the boundary-copy motivation. x: [B, S, HD]
    (the block input, post-LN); w*: [HD, HD] (pre-cast to the compute
    dtype by the caller); b*: [HD] fp32 (bias adds happen on the fp32
    accumulator, exactly like layers.linear); bias: [B, 1, 1, S] additive
    key-side. Returns y: [B, S, HD] in x.dtype."""
    B, S, HD = x.shape
    b2 = bias[:, 0, 0, :][:, None, :]                 # [B, 1, S]
    t, seed = _dropout_seed(dropout_rate, rng)
    return _attn_block_core(x, wq, bq, wk, bk, wv, bv, wo, bo, b2, seed,
                            t, num_heads)


def fused_attention_train(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          bias: jnp.ndarray, num_heads: int, *,
                          dropout_rate: float = 0.0,
                          rng=None) -> jnp.ndarray:
    """Training counterpart of fused_attention: differentiable (custom VJP,
    probs recomputed in VMEM) with in-kernel dropout.

    q/k/v: [B, S, H*D] pre-projected; bias: [B, 1, 1, S] additive
    (key-side). Returns [B, S, H*D]. Dropout uses the same u8-threshold
    semantics as layers.dropout; the PRNG stream is the kernel's own
    (seeded from ``rng``), so the realized mask differs from the XLA
    path's — statistically equivalent, not bit-equal.
    """
    B, S, HD = q.shape
    D = HD // num_heads
    S_pad = -(-S // 8) * 8

    def split(x):
        x = x.reshape(B, S, num_heads, D).transpose(0, 2, 1, 3)
        return jnp.pad(x, ((0, 0), (0, 0), (0, S_pad - S), (0, 0)))

    qh, kh, vh = split(q), split(k), split(v)
    b2 = jnp.pad(bias[:, 0, 0, :], ((0, 0), (0, S_pad - S)),
                 constant_values=-1e9)[:, None, :]          # [B, 1, S_pad]
    t, seed = _dropout_seed(dropout_rate, rng)
    out = _attn_train_core(qh, kh, vh, b2, seed, t)
    return out[:, :, :S, :].transpose(0, 2, 1, 3).reshape(B, S, HD)


# ---------------------------------------------------------------------------
# S-major training kernel ("sm"): same math and dropout semantics as the
# flat kernel, but the custom-call boundary carries S-MAJOR activations —
# q/k/v/o (and their backward twins) cross as logical [S, B, H*hd], whose
# required row-major layout {2,1,0} is bit-identical to the {2,0,1} layout
# XLA's conv emitter prefers on the [B, S, H*hd] projections (the
# boundary-copy forensics in docs/PERFORMANCE.md round 4: 84 copies to
# bf16[128,140,768]{2,0,1} per M3P step, ~2 ms each, because Mosaic demands
# row-major operands). With an S-major boundary the jnp.swapaxes in the
# entry folds into a layout bitcast and those copies never exist.
#
# Kernel geometry (Mosaic constraints, probed on chip — see the round-4
# ledger): blocks are [S, bt, 128] (last two dims must be 8/128-aligned, so
# heads ride in PAIRS on the lane dim at hd=64 and bt is a multiple of 8);
# the batch sits on SUBLANES, so the per-head mats are per-sample 2D
# [S, hd] slices (middle-index loads), and per-head outputs are
# concatenated on lanes for one full-lane store per sample. A leading-batch
# rank-3 dot with the batch mid-block and a [S, bt, 64] output block both
# crash the Mosaic backend (HTTP 500, remote compiler) — the working form
# is exactly what these kernels use.
# ---------------------------------------------------------------------------

def _sm_dims(S: int, B: int, HD: int, num_heads: int):
    """(bt, group_width, heads_per_group) for the S-major grid, or raise.
    NOTE: nothing falls back on these errors — fused_attn='sm' is a
    force-only debug flag (layers.multi_head_attention routes to the sm
    entry directly), so an unsupported shape raises at trace time. That is
    deliberate: a silent flat fallback would invalidate the A/B the flag
    exists for."""
    hd = HD // num_heads
    if 128 % hd == 0:
        gh = 128 // hd
        gw = 128
    elif hd % 128 == 0:
        gh, gw = 1, hd
    else:
        raise ValueError(f"sm kernel needs hd | 128 or 128 | hd, got {hd}")
    if HD % gw:
        raise ValueError(f"sm kernel needs HD % {gw} == 0, got HD={HD}")
    if num_heads % gh:
        raise ValueError(f"sm kernel needs num_heads % {gh} == 0 "
                         f"(heads per 128-lane group), got {num_heads}")
    if B % 8:
        raise ValueError(f"sm kernel needs batch % 8 == 0, got {B}")
    bt = 8
    return bt, gw, gh


def _sm_specs(S, bt, gw):
    qkv = pl.BlockSpec((S, bt, gw), lambda b, g: (0, b, g),
                       memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((bt, 1, S), lambda b, g: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((1, 1), lambda b, g: (0, 0),
                        memory_space=pltpu.SMEM)
    return qkv, bias, seed


def _sm_cell_seed(seed_ref):
    # distinct stream per (batch-tile, head-group) cell; fwd and bwd derive
    # the SAME seed and issue the identical _keep_mask call sequence, so the
    # backward replays the forward's exact dropout mask without storing it
    pltpu.prng_seed(seed_ref[0, 0]
                    + pl.program_id(0) * 16384 + pl.program_id(1))


def _sm_probs(q_ref, k_ref, bias_ref, i, h, hd, scale):
    sl = slice(h * hd, (h + 1) * hd)
    q = q_ref[:, i, sl].astype(jnp.float32)           # [S, hd]
    k = k_ref[:, i, sl].astype(jnp.float32)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[i, 0, :][None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True), q, k


def _sm_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
                   *, scale: float, keep_t: int, gh: int):
    if keep_t < 256:
        _sm_cell_seed(seed_ref)
    bt = q_ref.shape[1]
    hd = q_ref.shape[2] // gh
    for i in range(bt):
        outs = []
        for h in range(gh):
            p, _, _ = _sm_probs(q_ref, k_ref, bias_ref, i, h, hd, scale)
            if keep_t < 256:
                p = jnp.where(_keep_mask(p.shape, keep_t),
                              p * (256.0 / keep_t), 0.0)
            v = v_ref[:, i, h * hd:(h + 1) * hd].astype(jnp.float32)
            outs.append(jnp.dot(p, v, preferred_element_type=jnp.float32))
        o_ref[:, i, :] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _sm_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                   dq_ref, dk_ref, dv_ref, db_ref,
                   *, scale: float, keep_t: int, gh: int):
    if keep_t < 256:
        _sm_cell_seed(seed_ref)
    bt = q_ref.shape[1]
    hd = q_ref.shape[2] // gh
    rows = []
    for i in range(bt):
        dqs, dks, dvs = [], [], []
        db_i = None
        for h in range(gh):
            # identical PRNG call sequence as the forward -> identical mask
            p, q, k = _sm_probs(q_ref, k_ref, bias_ref, i, h, hd, scale)
            if keep_t < 256:
                keep = _keep_mask(p.shape, keep_t)
                r = 256.0 / keep_t
                pd = jnp.where(keep, p * r, 0.0)
            else:
                pd = p
            sl = slice(h * hd, (h + 1) * hd)
            v = v_ref[:, i, sl].astype(jnp.float32)
            do = do_ref[:, i, sl].astype(jnp.float32)
            dvs.append(jnp.dot(pd.T, do, preferred_element_type=jnp.float32))
            dpd = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
            dp = jnp.where(keep, dpd * r, 0.0) if keep_t < 256 else dpd
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dqs.append(jnp.dot(ds, k,
                               preferred_element_type=jnp.float32) * scale)
            dks.append(jnp.dot(ds.T, q,
                               preferred_element_type=jnp.float32) * scale)
            dsq = jnp.sum(ds, axis=0)                  # [S] key-side
            db_i = dsq if db_i is None else db_i + dsq
        dq_ref[:, i, :] = jnp.concatenate(dqs, -1).astype(dq_ref.dtype)
        dk_ref[:, i, :] = jnp.concatenate(dks, -1).astype(dk_ref.dtype)
        dv_ref[:, i, :] = jnp.concatenate(dvs, -1).astype(dv_ref.dtype)
        rows.append(db_i[None, :])
    # bias grad: the db block has the same index for every head-group cell,
    # so it stays resident and the g-loop accumulates into it (g is the
    # minor/fastest grid dim) — same pattern as the head-blocked kernel
    @pl.when(pl.program_id(1) == 0)
    def _init():
        db_ref[:] = jnp.zeros_like(db_ref)

    db_ref[:, 0, :] += jnp.concatenate(rows, axis=0).astype(db_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _attn_train_core_sm(qs, ks, vs, b2, seed, keep_t, num_heads):
    out, _ = _attn_train_sm_fwd(qs, ks, vs, b2, seed, keep_t, num_heads)
    return out


def _attn_train_sm_fwd(qs, ks, vs, b2, seed, keep_t, num_heads):
    S, B, HD = qs.shape
    bt, gw, gh = _sm_dims(S, B, HD, num_heads)
    qkv, bias, seedspec = _sm_specs(S, bt, gw)
    out = pl.pallas_call(
        functools.partial(_sm_fwd_kernel,
                          scale=1.0 / math.sqrt(HD // num_heads),
                          keep_t=keep_t, gh=gh),
        out_shape=jax.ShapeDtypeStruct((S, B, HD), qs.dtype),
        grid=(B // bt, HD // gw),
        in_specs=[seedspec, qkv, qkv, qkv, bias],
        out_specs=qkv,
    )(seed, qs, ks, vs, b2)
    return out, (qs, ks, vs, b2, seed)


def _attn_train_sm_bwd(keep_t, num_heads, res, g):
    qs, ks, vs, b2, seed = res
    S, B, HD = qs.shape
    bt, gw, gh = _sm_dims(S, B, HD, num_heads)
    qkv, bias, seedspec = _sm_specs(S, bt, gw)
    dq, dk, dv, db = pl.pallas_call(
        functools.partial(_sm_bwd_kernel,
                          scale=1.0 / math.sqrt(HD // num_heads),
                          keep_t=keep_t, gh=gh),
        out_shape=[jax.ShapeDtypeStruct((S, B, HD), qs.dtype),
                   jax.ShapeDtypeStruct((S, B, HD), ks.dtype),
                   jax.ShapeDtypeStruct((S, B, HD), vs.dtype),
                   jax.ShapeDtypeStruct((B, 1, S), jnp.float32)],
        grid=(B // bt, HD // gw),
        in_specs=[seedspec, qkv, qkv, qkv, bias, qkv],
        out_specs=[qkv, qkv, qkv, bias],
    )(seed, qs, ks, vs, b2, g)
    import numpy as np
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return dq, dk, dv, db, dseed


_attn_train_core_sm.defvjp(
    lambda qs, ks, vs, b2, seed, keep_t, num_heads:
        _attn_train_sm_fwd(qs, ks, vs, b2, seed, keep_t, num_heads),
    _attn_train_sm_bwd)


def fused_attention_train_smajor(q: jnp.ndarray, k: jnp.ndarray,
                                 v: jnp.ndarray, bias: jnp.ndarray,
                                 num_heads: int, *,
                                 dropout_rate: float = 0.0,
                                 rng=None) -> jnp.ndarray:
    """S-major-boundary training kernel: functionally the flat kernel
    (heads in-kernel, fp32 softmax post-scaled QK^T, in-kernel u8 PRNG
    dropout replayed on the backward — reference math per
    encoders.py:266 / m3p_transformer.py:196), with the custom-call
    boundary cut S-major so the per-layer {2,0,1} layout-assignment
    copies around the flat kernel's operands fold into bitcasts.

    q/k/v: [B, S, H*hd] pre-projected; bias: [B, 1, 1, S] additive
    key-side. Returns [B, S, H*hd]. The swapaxes pairs here are layout
    bitcasts, not data movement, when XLA picks the conv emitter's
    preferred {2,0,1} for the surrounding projections."""
    B, S, HD = q.shape
    b2 = bias[:, 0, 0, :][:, None, :]                 # [B, 1, S]
    t, seed = _dropout_seed(dropout_rate, rng)
    qs = jnp.swapaxes(q, 0, 1)
    ks = jnp.swapaxes(k, 0, 1)
    vs = jnp.swapaxes(v, 0, 1)
    out = _attn_train_core_sm(qs, ks, vs, b2, seed, t, num_heads)
    return jnp.swapaxes(out, 0, 1)


def fused_attention_smajor(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           bias: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Forward-only S-major twin (eval): same kernel at keep_t=256.

    TEST-ONLY from the model's perspective: layers.multi_head_attention
    routes deterministic fused='sm' to fused_attention_flat (the measured
    eval optimum), so this entry is reachable only from tests/tools. Kept
    so the S-major A/B can cover the eval direction when the parked
    boundary-copy work resumes (docs/PERFORMANCE.md forensics)."""
    B, S, HD = q.shape
    b2 = bias[:, 0, 0, :][:, None, :]
    seed = jnp.zeros((1, 1), jnp.int32)
    out, _ = _attn_train_sm_fwd(jnp.swapaxes(q, 0, 1), jnp.swapaxes(k, 0, 1),
                                jnp.swapaxes(v, 0, 1), b2, seed, 256,
                                num_heads)
    return jnp.swapaxes(out, 0, 1)
