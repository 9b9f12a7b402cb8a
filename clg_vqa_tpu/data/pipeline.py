"""Host input pipeline: shuffled, microbatched, background-prefetched batches.

Replaces the reference's tensorpack chain (LMDBSerializer -> LocallyShuffleData
-> PrefetchData -> MapData(BertPreprocessBatch) -> PrefetchDataZMQ ->
BatchData; gqa_dataset_semantic_code_mix.py:300-344) with:

 - epoch-seeded global shuffle (we hold the entry index in RAM; the feature
   bytes stay on mmap)
 - batch assembly through the native CFS gather (C++ threads)
 - a background thread that keeps N batches in flight and transfers them to
   device ahead of consumption (double buffering host->HBM)
 - per-host sharding for multi-process data parallelism: each host takes a
   strided slice of the shuffled order (replaces DistributedSampler /
   per-worker batch splitting, task_utils.py:478-482, 591)
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax
import numpy as np


class TrainPipeline:
    def __init__(self, dataset, *, micro_batch_size: int, grad_acc_steps: int,
                 seed: int = 0, host_id: int = 0, num_hosts: int = 1,
                 prefetch: int = 2, drop_remainder: bool = True,
                 device_put: bool = True, with_features: bool = True):
        self.ds = dataset
        self.mbs = micro_batch_size
        self.acc = grad_acc_steps
        self.seed = seed
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.prefetch = prefetch
        self.drop_remainder = drop_remainder
        self.device_put = device_put
        self.with_features = with_features

    def steps_per_epoch(self) -> int:
        # mirrors _epoch_order: per-host length is ceil(N/num_hosts) with
        # wrap-around padding, so all hosts agree on the step count
        per_host = (len(self.ds) if self.num_hosts == 1
                    else -(-len(self.ds) // self.num_hosts))
        return per_host // (self.mbs * self.acc)

    def _epoch_order(self, epoch: int) -> np.ndarray:
        order = np.arange(len(self.ds))
        np.random.RandomState(self.seed + epoch).shuffle(order)
        if self.num_hosts == 1:
            return order
        # equal per-host length via wrap-around padding (torch
        # DistributedSampler semantics): every host must dispatch the SAME
        # number of steps — an uneven split would leave one host joining a
        # collective the others never enter (SPMD deadlock)
        per_host = -(-len(order) // self.num_hosts)
        padded = np.concatenate(
            [order, order[:per_host * self.num_hosts - len(order)]])
        return padded[self.host_id::self.num_hosts]

    def _assemble(self, idx_chunk: np.ndarray) -> dict:
        b = self.ds.make_batch(idx_chunk.tolist(),
                               with_features=self.with_features)
        b.pop("question_id", None)
        b.pop("valid", None)
        b.pop("has_label", None)
        # [acc * mbs, ...] -> [acc, mbs, ...]
        return {k: np.asarray(v).reshape(self.acc, self.mbs,
                                         *np.shape(v)[1:])
                for k, v in b.items()}

    def epoch(self, epoch: int, start_step: int = 0) -> Iterator[dict]:
        """Yields device-resident [acc, mbs, ...] batches.

        start_step skips the first ``start_step`` batches of the epoch's
        (deterministic, seed+epoch-keyed) order — the resume cursor for
        step-granular preemption recovery: the skipped prefix is exactly
        the data an interrupted run already consumed."""
        if hasattr(self.ds, "set_epoch"):
            self.ds.set_epoch(epoch)    # epoch-varying augmentation (CDM)
        order = self._epoch_order(epoch)
        span = self.mbs * self.acc
        n_steps = len(order) // span if self.drop_remainder else \
            -(-len(order) // span)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            # the sentinel carries any assembly failure to the consumer:
            # swallowing it would silently truncate the epoch to however
            # many batches were produced before the error
            err = None
            try:
                for s in range(start_step, n_steps):
                    if stop.is_set():
                        return
                    chunk = order[s * span:(s + 1) * span]
                    if len(chunk) < span:
                        return
                    host_b = self._assemble(chunk)
                    if self.device_put:
                        host_b = jax.device_put(host_b)
                    q.put(host_b)
            except BaseException as e:          # noqa: BLE001 — re-raised
                err = e
            finally:
                q.put(err)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise RuntimeError(
                        "train pipeline batch assembly failed") from item
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5)
