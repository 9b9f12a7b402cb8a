"""Device-resident feature bank — features live in HBM, batches are index
gathers on device.

The reference streams region features host->device every batch (LMDB ->
pickle -> pin -> H2D per batch). For evaluation-sized stores (GQA testdev /
xGQA test: a few hundred images x 36 x 2048 = tens of MB; even GQA val fits
comfortably) the TPU-native move is to upload the processed store ONCE and
assemble batches with a device-side gather — zero per-batch feature traffic
(the BASELINE "HBM-direct" goal). Batches then carry only token ids and
int32 store indices.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class DeviceFeatureBank:
    def __init__(self, reader, *, max_regions: int, num_locs: int = 5,
                 norm_embeddings: bool = False,
                 add_global_imgfeat: str | None = None,
                 dtype=jnp.float32):
        n = reader.n_records
        feats, locs, mask = reader.gather(
            np.arange(n), max_regions=max_regions, num_locs=num_locs,
            norm_embeddings=norm_embeddings,
            add_global_imgfeat=add_global_imgfeat)
        self.features = jax.device_put(jnp.asarray(feats, dtype))
        self.locs = jax.device_put(jnp.asarray(locs, dtype))
        self.image_mask = jax.device_put(jnp.asarray(mask, jnp.int32))
        self.id2idx = dict(reader.id2idx)
        self.nbytes = (self.features.nbytes + self.locs.nbytes
                       + self.image_mask.nbytes)

    def lookup(self, store_idx: jnp.ndarray):
        """Device-side gather; call inside jit. store_idx [B] int32.

        NOTE: calling this inside a jitted function closes over the bank
        arrays, which embeds them in the program as constants — with a
        remote compiler (axon) the whole bank then rides the compile
        request (HTTP 413 at X101 scale). Jitted code should instead take
        :meth:`tensors` as an ARGUMENT and use :func:`gather_from`."""
        return self.gather_from(self.tensors(), store_idx)

    def tensors(self):
        """(features, locs, image_mask) — pass as jit arguments."""
        return (self.features, self.locs, self.image_mask)

    @staticmethod
    def gather_from(tensors, store_idx: jnp.ndarray, *,
                    pallas: bool = False):
        """pallas=True routes the (dominant) feature gather through the
        scalar-prefetch DMA kernel (ops/bank_gather.rows_gather) instead of
        an XLA gather — decouples the gathered activations' layout from
        XLA's fusion choices (the M3P in-step gather cost, see
        docs/PERFORMANCE.md round 4). locs/mask stay XLA gathers (tiny)."""
        f, l, m = tensors
        if pallas:
            from ..ops.bank_gather import rows_gather
            fg = rows_gather(f, store_idx)
        else:
            fg = f[store_idx]
        return fg, l[store_idx], m[store_idx]

    def fill_batch(self, batch: dict) -> dict:
        """Replace a 'store_idx' host batch field with device-gathered
        features/locs/image_mask (for use outside jit)."""
        f, l, m = self.lookup(jnp.asarray(batch["store_idx"]))
        out = {k: v for k, v in batch.items() if k != "store_idx"}
        out.update({"features": f, "locs": l, "image_mask": m})
        return out
