"""Serving-style predictor: question + image id -> answer string.

Production-shaped single/batch inference on top of the device feature bank:
the store lives in HBM, each request tokenizes on host and runs one jitted
forward. Requests are padded to a fixed micro-batch so the program compiles
once.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..data.device_bank import DeviceFeatureBank
from ..data.tokenizer import encode_padded


class Predictor:
    def __init__(self, forward, params, cfg, store, tokenizer,
                 label2ans: list, *, max_seq_length: int = 40,
                 max_region_num: int = 36, batch_capacity: int = 8,
                 compute_dtype=jnp.bfloat16):
        self.fwd = forward
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.label2ans = label2ans
        self.T = max_seq_length
        self.cap = batch_capacity
        self.bank = DeviceFeatureBank(
            store, max_regions=max_region_num, num_locs=cfg.num_locs,
            norm_embeddings=getattr(cfg, "norm_embeddings", False),
            add_global_imgfeat=getattr(cfg, "add_global_imgfeat", None))

        @jax.jit
        def step(params, ids, mask, store_idx, bank):
            # bank tensors are ARGUMENTS, not closure constants — a closure
            # would embed the whole bank in the compile payload (see
            # DeviceFeatureBank.lookup)
            f, l, m = DeviceFeatureBank.gather_from(bank, store_idx)
            logits = forward(params, cfg, {
                "input_ids": ids, "input_mask": mask,
                "features": f, "locs": l, "image_mask": m,
            }, deterministic=True, compute_dtype=compute_dtype)
            return jnp.argmax(logits, axis=-1), jax.nn.softmax(
                logits.astype(jnp.float32), -1).max(-1)

        bank_t = self.bank.tensors()
        self._step = lambda params, ids, mask, sidx: step(
            params, ids, mask, sidx, bank_t)

    def predict(self, question: str, image_id: str) -> dict:
        return self.predict_batch([(question, image_id)])[0]

    def predict_batch(self, requests: list[tuple[str, str]]) -> list[dict]:
        # validate up front: a bad id mid-batch must not discard the
        # already-computed chunks
        unknown = [img for _, img in requests
                   if str(img) not in self.bank.id2idx]
        if unknown:
            raise ValueError(
                f"unknown image_id(s) not in the serving feature bank: "
                f"{unknown[:5]}{'...' if len(unknown) > 5 else ''}")
        out = []
        for s in range(0, len(requests), self.cap):
            chunk = requests[s:s + self.cap]
            n = len(chunk)
            ids = np.full((self.cap, self.T), self.tok.pad_id, np.int32)
            mask = np.zeros((self.cap, self.T), np.int32)
            sidx = np.zeros((self.cap,), np.int32)
            for j, (q, img) in enumerate(chunk):
                t, m, _ = encode_padded(self.tok, q, self.T)
                ids[j], mask[j] = t, m
                sidx[j] = self.bank.id2idx[str(img)]
            pred, conf = self._step(self.params, jnp.asarray(ids),
                                    jnp.asarray(mask), jnp.asarray(sidx))
            pred = np.asarray(pred)
            conf = np.asarray(conf)
            out += [{"answer": self.label2ans[int(pred[j])],
                     "confidence": float(conf[j])} for j in range(n)]
        return out
