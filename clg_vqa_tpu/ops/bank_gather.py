"""Pallas row-gather for the device-resident feature bank.

``DeviceFeatureBank.gather_from`` assembles batches as ``bank[store_idx]``
— an XLA gather. Functionally perfect, but XLA owns the layout of the
gathered [B, R, 2048] tensor, and inside the M3P TRAIN step that choice
costs real time: the round-4 root-cause (docs/PERFORMANCE.md "M3P
full-scale recipe rehearsal") showed the in-step gather inflating a
select_add fusion 6.75 -> 27 ms + a 17 ms fusion — ~6% of the step — with
bf16-bank / hoisted-gather / one-hot-matmul variants all measured and
rejected.

This kernel is the layout-decoupling alternative: a scalar-prefetch
pallas_call whose grid walks the batch and whose input index_map selects
``idx[i]``'s bank row per step — each grid step is then a pure
HBM->HBM DMA of one [R, C] row into the standard-layout output. XLA sees
an opaque custom call with a fixed row-major result, so its fusion/layout
choices around device-produced features can't leak into the encoder.

Reference equivalence: the reference has no bank (features ride
host->device every batch, vlbert dataset loaders); the bank + gather is
our TPU-native replacement, and this kernel is an implementation detail
of it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(idx_ref, x_ref, o_ref):
    # x block: idx[i]'s bank row; o block: output row i — a pure DMA copy.
    del idx_ref
    o_ref[...] = x_ref[...]


@jax.jit
def rows_gather(bank: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """bank [N, R, C], idx [B] int32 -> [B, R, C] == bank[idx].

    One grid step per output row; the scalar-prefetched ``idx`` drives the
    input BlockSpec's index_map, so the pipeline overlaps the row DMAs.
    """
    B = idx.shape[0]
    N, R, C = bank.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, R, C), lambda i, idx_ref: (idx_ref[i], 0, 0))],
        out_specs=pl.BlockSpec((1, R, C), lambda i, idx_ref: (i, 0, 0)),
    )
    return pl.pallas_call(
        _copy_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, R, C), bank.dtype),
    )(idx, bank)
