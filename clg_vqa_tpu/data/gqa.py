"""GQA / xGQA annotation loading and datasets.

Reproduces the reference's entry loading exactly
(gqa_dataset_semantic_code_mix.py:48-95 ``_load_dataset``):

 - train/val:        {split}_target.pkl, sorted by question_id
 - trainval:         trainval_target.pkl sorted, minus the last 3000
 - minval:           the last 3000 of sorted trainval_target.pkl
 - test:             testdev_balanced_questions.json (dict qid -> record)
 - test_{lang}:      explicit json path (xGQA test dict format)
 - train_{n}_{lang} / dev_{lang}: explicit pkl path (xGQA few-shot entries)

Answer vocabulary: trainval_ans2label.pkl / trainval_label2ans.pkl
(1842 answers).
"""
from __future__ import annotations

import dataclasses
import json
import os
import pickle


import numpy as np


@dataclasses.dataclass
class Entry:
    question_id: int
    image_id: str
    question: str
    labels: list[int] | None = None     # answer label ids
    scores: list[float] | None = None


def load_answer_vocab(dataroot: str) -> tuple[dict, list]:
    with open(os.path.join(dataroot, "trainval_ans2label.pkl"), "rb") as f:
        ans2label = pickle.load(f)
    with open(os.path.join(dataroot, "trainval_label2ans.pkl"), "rb") as f:
        label2ans = pickle.load(f)
    return ans2label, label2ans


def _entries_from_target_items(items: list[dict]) -> list[Entry]:
    out = []
    for it in items:
        out.append(Entry(
            question_id=int(it["question_id"]), image_id=str(it["image_id"]),
            question=it["question"], labels=list(it.get("labels", []) or []),
            scores=list(it.get("scores", []) or [])))
    return out


def _entries_from_test_dict(d: dict) -> list[Entry]:
    out = []
    for qid, it in d.items():
        out.append(Entry(question_id=int(qid), image_id=str(it["imageId"]),
                         question=it["question"]))
    return out


def load_entries(dataroot: str, split: str,
                 annotations_jsonpath: str = "") -> list[Entry]:
    def load_pkl(path):
        with open(path, "rb") as f:
            return pickle.load(f)

    if split in ("train", "val"):
        items = sorted(load_pkl(os.path.join(dataroot, f"{split}_target.pkl")),
                       key=lambda x: x["question_id"])
        return _entries_from_target_items(items)
    if split == "trainval":
        items = sorted(load_pkl(os.path.join(dataroot, "trainval_target.pkl")),
                       key=lambda x: x["question_id"])
        return _entries_from_target_items(items[:-3000])
    if split == "minval":
        items = sorted(load_pkl(os.path.join(dataroot, "trainval_target.pkl")),
                       key=lambda x: x["question_id"])
        return _entries_from_target_items(items[-3000:])
    if split == "test":
        with open(os.path.join(dataroot,
                               "testdev_balanced_questions.json")) as f:
            return _entries_from_test_dict(json.load(f))
    if split.startswith("test_"):
        with open(annotations_jsonpath) as f:
            return _entries_from_test_dict(json.load(f))
    if split.startswith(("train_", "dev_")):
        items = sorted(load_pkl(annotations_jsonpath),
                       key=lambda x: x["question_id"])
        return _entries_from_target_items(items)
    raise ValueError(f"unrecognized split: {split}")


class GQADataset:
    """Map-style dataset over a feature store + entries (the reference's
    ``format: lmdb`` eval path, gqa_dataset_semantic_code_mix.py:98-245).

    Tokenization is done once up front and cached in memory; batches are
    assembled with the (native) store gather.
    """

    def __init__(self, entries: list[Entry], feature_store, tokenizer, *,
                 max_seq_length: int = 40, max_region_num: int = 36,
                 num_locs: int = 5, num_labels: int = 1842,
                 add_global_imgfeat: str | None = None,
                 norm_embeddings: bool = False,
                 code_mixer=None):
        from .tokenizer import encode_padded
        self.entries = entries
        self.store = feature_store
        self.tokenizer = tokenizer
        self.max_seq_length = max_seq_length
        self.max_region_num = max_region_num
        self.num_locs = num_locs
        self.num_labels = num_labels
        self.add_global = add_global_imgfeat
        self.norm_embeddings = norm_embeddings
        self.code_mixer = code_mixer

        self._tok_cache: dict[int, tuple] = {}
        if code_mixer is None:     # static questions -> pre-tokenize
            for i, e in enumerate(entries):
                self._tok_cache[i] = encode_padded(tokenizer, e.question,
                                                   max_seq_length)

    def __len__(self):
        return len(self.entries)

    def set_epoch(self, epoch: int):
        """Vary the code-mix realization across epochs (the augmentation
        seed folds (question_id, epoch)); no-op without a mixer."""
        self._epoch = int(epoch)

    def _tokens(self, i: int):
        from .tokenizer import encode_padded
        if i in self._tok_cache:
            return self._tok_cache[i]
        e = self.entries[i]
        q = e.question
        if self.code_mixer is not None:
            q = self.code_mixer(
                q, sample_key=(e.question_id, getattr(self, "_epoch", 0)))
        return encode_padded(self.tokenizer, q, self.max_seq_length)

    def make_batch(self, indices: list[int], *,
                   with_features: bool = True) -> dict[str, np.ndarray]:
        """Fixed-shape host batch. Keys match the model/batch contract plus
        labels / question_id / valid. with_features=False skips the feature
        assembly and emits 'store_idx' instead (for device-resident banks,
        data/device_bank.py)."""
        B = len(indices)
        T = self.max_seq_length
        ids = np.full((B, T), self.tokenizer.pad_id, np.int32)
        imask = np.zeros((B, T), np.int32)
        labels = np.zeros((B,), np.int32)
        has_label = np.zeros((B,), np.float32)
        qids = np.zeros((B,), np.int64)
        valid = np.ones((B,), np.float32)
        store_idx = np.zeros((B,), np.int64)

        id2idx = self.store.id2idx
        for j, i in enumerate(indices):
            e = self.entries[i]
            t, m, _ = self._tokens(i)
            ids[j], imask[j] = t, m
            qids[j] = e.question_id
            store_idx[j] = id2idx[str(e.image_id)]
            if e.labels:
                # GQA is single-label with scores == [1.0]; we take the
                # max-SCORE label. NOTE a documented divergence for
                # soft-score targets: the reference argmaxes target.long()
                # (scores floored to int), so any max score < 1.0 makes it
                # train toward label-id 0 — we treat that as a bug and use
                # the max-score label; identical on all shipped GQA/xGQA
                # pkls (scores are exactly 1.0).
                scores = e.scores if e.scores else [1.0] * len(e.labels)
                labels[j] = e.labels[int(np.argmax(scores))]
                has_label[j] = 1.0
        out = {
            "input_ids": ids, "input_mask": imask,
            "labels": labels, "has_label": has_label,
            "question_id": qids, "valid": valid,
        }
        if with_features:
            feats, locs, mask = self.store.gather(
                store_idx, max_regions=self.max_region_num,
                num_locs=self.num_locs, norm_embeddings=self.norm_embeddings,
                add_global_imgfeat=self.add_global)
            out.update({"features": feats, "locs": locs, "image_mask": mask})
        else:
            out["store_idx"] = store_idx.astype(np.int32)
        return out

    def iter_batches(self, batch_size: int, *, shuffle: bool = False,
                     seed: int = 0, epoch: int = 0,
                     drop_remainder: bool = False,
                     pad_final: bool = True, with_features: bool = True):
        order = np.arange(len(self.entries))
        if shuffle:
            # fold the epoch like TrainPipeline._epoch_order — a fixed
            # seed alone replays the identical permutation every epoch
            np.random.RandomState(seed + epoch).shuffle(order)
        for s in range(0, len(order), batch_size):
            chunk = order[s:s + batch_size].tolist()
            if len(chunk) < batch_size:
                if drop_remainder:
                    return
                if pad_final:
                    n_real = len(chunk)
                    chunk = chunk + [chunk[-1]] * (batch_size - n_real)
                    b = self.make_batch(chunk, with_features=with_features)
                    b["valid"][n_real:] = 0.0
                    yield b
                    return
            yield self.make_batch(chunk, with_features=with_features)
