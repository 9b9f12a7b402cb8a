"""Fused joint-sequence attention (Pallas TPU kernel).

The CLG-VQA encoders attend over tiny joint sequences (UC2: 40+36=76 tokens,
M3P: 100+40=140) — far below flash-attention territory, but the XLA path
still materializes [B, H, S, S] score/prob tensors in HBM between ops. This
kernel fuses QK^T -> +bias -> softmax -> PV entirely in VMEM per (batch,
head) tile, so scores never touch HBM.

Forward-only (serving/eval path; training uses the XLA formulation whose
backward XLA already fuses well). Numerics match layers.multi_head_attention
with scale applied post-QK^T and fp32 softmax.

Measured on v5e: at bs 256 / S=76 the kernel loses (4.2 vs 1.5 ms — XLA's
batched-matmul fusion wins when the score tensor is small), but at eval
scale (bs 1024 / S=140, where the fp32 probs are 963 MB/block) it WINS
15 vs 25 ms/call — M3P full-scale eval 2028 -> 2707 QA/s. It is the
default for bf16 eval at bs>=512 on TPU (eval/runner.run_eval auto mode,
threaded via forward(fused_attn=True)); the XLA path remains default for
training, fp32 parity mode, and serving-size batches.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
