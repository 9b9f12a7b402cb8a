"""Shared CLI construction: config ingest (JSON model cfg + YAML task cfg +
flag overrides, the reference's three-tier scheme), model/dataset/pipeline
assembly."""
from __future__ import annotations

import argparse
import os

import numpy as np

from ..config import M3PConfig, OptimConfig, TaskConfig, UC2Config


def add_common_args(p: argparse.ArgumentParser):
    p.add_argument("--config_file", required=True,
                   help="model JSON (uc2_base.json / m3p_base.json layout)")
    p.add_argument("--tasks_config_file", required=True,
                   help="task YAML (TASK15 layout)")
    p.add_argument("--task", default="15")
    p.add_argument("--is_m3p", action="store_true")
    p.add_argument("--from_pretrained", default="",
                   help="torch .bin / orbax dir with pretrained weights; "
                        "empty = random init")
    p.add_argument("--output_dir", default="out")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tokenizer", default="hash",
                   help="'hash' or a local HF tokenizer path "
                        "(xlm-roberta-base for production parity)")
    p.add_argument("--features_path", default="",
                   help="override the task config's feature store path "
                        "(.cfs or LMDB dir)")
    p.add_argument("--dataroot", default="", help="override dataroot")
    p.add_argument("--train_annotations_jsonpath", default="",
                   help="explicit annotations for train_* / dev_* few-shot "
                        "splits (xGQA)")
    p.add_argument("--val_annotations_jsonpath", default="")
    p.add_argument("--fp32", action="store_true",
                   help="disable bf16 compute (parity mode)")
    return p


def add_train_args(p: argparse.ArgumentParser):
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--num_epoch", type=int, default=None)
    p.add_argument("--grad_acc_steps", type=int, default=4)
    p.add_argument("--warmup_proportion", type=float, default=0.1)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--clip_grad_norm", type=float, default=1.0)
    p.add_argument("--adam_epsilon", type=float, default=1e-6)
    p.add_argument("--adam_betas", type=float, nargs=2, default=(0.9, 0.999))
    # reference parity: default False, the launch scripts pass the flag
    # (train_task.py:131, experiments/.../train.dtu.sh)
    p.add_argument("--adam_correct_bias", action="store_true", default=False)
    p.add_argument("--optim_train_epochs", type=int, default=20,
                   help="lr-schedule horizon in epochs (reference "
                        "train_task.py:86 — decoupled from --num_epoch)")
    p.add_argument("--lr_scheduler", type=str, default="warmup_linear")
    p.add_argument("--code_mixing", action="store_true", default=None)
    p.add_argument("--embed_clf", action="store_true", default=None,
                   help="initialize the classifier output from answer word "
                        "embeddings (train_task.py:218-238)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--save_every", type=int, default=1,
                   help="state_latest checkpoint cadence in epochs (final "
                        "epoch always saved; 1 = reference parity)")
    p.add_argument("--mid_save", choices=("none", "params"), default="none",
                   help="cheap resume points for epochs --save_every skips: "
                        "'params' saves params+step only (1/3 the device "
                        "fetch; resume restarts optimizer moments)")
    p.add_argument("--fused_attn",
                   choices=("auto", "on", "off", "flat", "proj", "sm"),
                   default="auto",
                   help="Pallas custom-VJP train attention: 'auto'/'on' = "
                        "the flat-boundary kernel for bf16 on TPU (both "
                        "recipes); 'flat'/'proj'/'sm' force a specific "
                        "kernel ('proj' also fuses the q/k/v/o projections "
                        "into the Pallas block; 'sm' cuts the boundary "
                        "S-major) — docs/PERFORMANCE.md round 4")
    p.add_argument("--no_train_bank", action="store_true",
                   help="stream features host->device per batch instead of "
                        "parking the train store in HBM")
    p.add_argument("--loss", default="",
                   help="override the task criterion (LossMap name, "
                        "task_utils.py:179-192); empty = task YAML default")
    return p


def build_configs(args):
    task_cfg = TaskConfig.from_yaml(args.tasks_config_file, args.task)
    overrides = {}
    if getattr(args, "lr", None):
        overrides["lr"] = args.lr
    if getattr(args, "num_epoch", None):
        overrides["num_epoch"] = args.num_epoch
    if getattr(args, "code_mixing", None) is not None:
        overrides["code_mixing"] = args.code_mixing
    if getattr(args, "embed_clf", None) is not None:
        overrides["embed_clf"] = args.embed_clf
    if getattr(args, "loss", ""):
        # reference precedence: args.loss or task_cfg[task]["loss"]
        # (task_utils.py:181)
        overrides["loss"] = args.loss
    if getattr(args, "dataroot", ""):
        overrides["dataroot"] = args.dataroot
    if overrides:
        import dataclasses
        task_cfg = dataclasses.replace(task_cfg, **overrides)

    if args.is_m3p:
        cfg = M3PConfig.from_json(args.config_file,
                                  num_labels=task_cfg.num_labels)
    else:
        import json as _json
        with open(args.config_file) as f:
            raw = _json.load(f)
        from ..models.gated import DUAL_EMBEDDINGS, SHARED_EMBEDDINGS
        if raw.get("image_embeddings", "uc2") in (
                DUAL_EMBEDDINGS + SHARED_EMBEDDINGS):
            # general gated-zoo wiring (models/gated.py) — ViLBERT/LXMERT/
            # VL-BERT/VisualBERT/UNITER configs run on the general encoder
            from ..models.gated import GatedConfig
            cfg = GatedConfig.from_dict(
                {**raw, "num_labels": task_cfg.num_labels})
        else:
            cfg = UC2Config.from_json(args.config_file,
                                      num_labels=task_cfg.num_labels)

    optim_cfg = OptimConfig(
        lr=task_cfg.lr,
        adam_betas=tuple(getattr(args, "adam_betas", (0.9, 0.999))),
        adam_epsilon=getattr(args, "adam_epsilon", 1e-6),
        correct_bias=getattr(args, "adam_correct_bias", True),
        weight_decay=getattr(args, "weight_decay", 1e-4),
        clip_grad_norm=getattr(args, "clip_grad_norm", 1.0),
        warmup_proportion=getattr(args, "warmup_proportion", 0.1),
        grad_acc_steps=getattr(args, "grad_acc_steps", 4),
        lr_scheduler=getattr(args, "lr_scheduler", "warmup_linear"),
        optim_train_epochs=getattr(args, "optim_train_epochs", 20),
    )
    return cfg, task_cfg, optim_cfg


def build_model(args, cfg):
    import jax
    from ..models import m3p, uc2
    from ..models.gated import GatedConfig
    if isinstance(cfg, GatedConfig):
        from ..models import gated as mod
    else:
        mod = m3p if args.is_m3p else uc2
    if args.from_pretrained:
        params = load_pretrained(args.from_pretrained, cfg, args.is_m3p)
    else:
        params = mod.init_params(jax.random.key(args.seed), cfg)
    return mod, params


def load_pretrained(path: str, cfg, is_m3p: bool):
    """torch .bin (VOLTA names, or a raw HF XLM-R checkpoint — detected
    by its ``.attention.self.`` keys and renumbered through the UC2
    sublayer collapse like conversions/convert_uc2.py) or an orbax dir."""
    from ..utils.convert import (hf_xlmr_to_uc2_pytree, normalize_volta_keys,
                                 volta_m3p_to_pytree, volta_uc2_to_pytree)
    if os.path.isdir(path):
        from ..train import checkpoints as ckpt
        return ckpt.load_params(os.path.dirname(path) or ".",
                                os.path.basename(path))
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    from ..models.gated import GatedConfig
    if isinstance(cfg, GatedConfig):
        from ..utils.convert_gated import volta_gated_to_pytree
        return volta_gated_to_pytree(normalize_volta_keys(sd), cfg)
    if not is_m3p and any(".attention.self." in k for k in sd):
        return hf_xlmr_to_uc2_pytree(sd, cfg)
    if is_m3p and any(k.startswith("module.attentions.") for k in sd):
        from ..utils.convert import m3p_original_to_pytree
        return m3p_original_to_pytree(sd, cfg)
    sd = normalize_volta_keys(sd)
    conv = volta_m3p_to_pytree if is_m3p else volta_uc2_to_pytree
    return conv(sd, cfg)


def build_tokenizer(args):
    from ..data.tokenizer import HashTokenizer, HFTokenizer
    if args.tokenizer == "hash":
        return HashTokenizer()
    return HFTokenizer(args.tokenizer)


def open_feature_store(path: str):
    from ..data.cfs import CfsReader
    from ..data.features import LmdbFeatureReader
    if path.endswith(".cfs"):
        return CfsReader(path)
    return LmdbFeatureReader(path)


def is_tdlmdb(path: str) -> bool:
    """True when ``path`` is a tensorpack-serialized (QA-joined) LMDB — the
    reference's `format: serialized_lmdb` train artifact — as opposed to a
    per-image feature LMDB (which carries a b'keys' index)."""
    from ..data.lmdb_lite import Reader
    if path.endswith(".cfs") or not os.path.exists(path):
        return False
    try:
        with Reader(path) as r:
            return r.get(b"__keys__") is not None
    except (ValueError, OSError):
        return False


def ingest_tdlmdb(td_path: str, cache_dir: str, tag: str):
    """One-time stream of a td-lmdb into the native inputs: a CFS feature
    store + target-pkl-style entries (cached under ``cache_dir``). Replaces
    the reference's tensorpack streaming of the same artifact
    (gqa_dataset_semantic_code_mix.py:300-344)."""
    import hashlib
    import pickle
    from ..data.tdlmdb import tdlmdb_to_cfs
    os.makedirs(cache_dir, exist_ok=True)
    # the cache key carries a source signature (path + size + mtime): a
    # pre-existing ingest from a DIFFERENT td-lmdb in the same output_dir
    # must not be silently reused
    target = td_path
    if os.path.isdir(td_path):
        cand = os.path.join(td_path, "data.mdb")
        if os.path.exists(cand):
            target = cand
    st = os.stat(target)
    sig = hashlib.sha1(
        f"{os.path.abspath(td_path)}:{st.st_size}:{int(st.st_mtime)}"
        .encode()).hexdigest()[:10]
    cfs_path = os.path.join(cache_dir, f"ingest_{tag}_{sig}.cfs")
    entries_pkl = os.path.join(cache_dir, f"ingest_{tag}_{sig}_target.pkl")
    if not (os.path.exists(cfs_path) and os.path.exists(entries_pkl)):
        n_img, n_q = tdlmdb_to_cfs(td_path, cfs_path, entries_pkl)
        print(f"ingested td-lmdb {td_path}: {n_q} QA pairs / "
              f"{n_img} images -> {cfs_path}")
    with open(entries_pkl, "rb") as f:
        items = pickle.load(f)
    return cfs_path, items


def build_distance_matrix(task_cfg, num_labels: int):
    from ..ops.semantic_prior import (build_distance_matrix_embedding,
                                      build_distance_matrix_wordnet)
    p = task_cfg.semantic_dict_path
    if not p or not os.path.exists(p):
        return None
    if "wn" in os.path.basename(p) or "semantic_index" in os.path.basename(p):
        return build_distance_matrix_wordnet(p, num_labels)
    return build_distance_matrix_embedding(p, num_labels)


def build_code_mixer(task_cfg, seed: int):
    if not task_cfg.code_mixing:
        return None
    from ..data.code_mix import CodeMixer, load_muse_dicts
    dicts = load_muse_dicts(task_cfg.dictionary_path)
    return CodeMixer(dicts, ratio=task_cfg.ratio, cross=task_cfg.cross,
                     seed=seed)


def build_dataset(args, cfg, task_cfg, split: str, features_path: str,
                  annotations_jsonpath: str = "", code_mixer=None,
                  entry_items: list | None = None):
    from ..data.gqa import GQADataset, load_entries
    from ..data.gqa import _entries_from_target_items
    if entry_items is not None:       # e.g. td-lmdb ingest carries its own QA
        entries = _entries_from_target_items(
            sorted(entry_items, key=lambda x: x["question_id"]))
    else:
        entries = load_entries(task_cfg.dataroot, split, annotations_jsonpath)
    store = open_feature_store(features_path)
    tok = build_tokenizer(args)
    return GQADataset(
        entries, store, tok, max_seq_length=task_cfg.max_seq_length,
        max_region_num=task_cfg.max_region_num, num_locs=cfg.num_locs,
        num_labels=task_cfg.num_labels,
        add_global_imgfeat=getattr(cfg, "add_global_imgfeat", None),
        norm_embeddings=getattr(cfg, "norm_embeddings", False),
        code_mixer=code_mixer)


def init_classifier_from_answers(params, tokenizer, ans2label: dict):
    """embed_clf: initialize the classifier output weights from the mean
    word-embedding of each answer's tokens (train_task.py:218-238). The
    reference tokenizes each answer, averages the word embeddings (falling
    back to <unk> for empty tokenizations), and overwrites logit_fc.3's
    weight rows; in our layout that is classifier.fc2.w columns.

    Quirk reproduced: rows are assigned in sorted(ans2label.items()) order —
    sorted by ANSWER STRING — so when string order differs from label-id
    order, row i holds the i-th sorted answer's embedding, not label i's
    (exactly the reference loop at train_task.py:224-233)."""
    import numpy as np
    word = np.asarray(params["embeddings"]["word"])
    clf_in = np.shape(params["classifier"]["fc2"]["w"])[0]
    if word.shape[1] != clf_in:
        # e.g. M3P: clf_hidden 1536 != hidden 768; the reference would crash
        # on the same shape mismatch (module.weight.data assignment)
        raise ValueError(
            f"embed_clf needs clf_hidden == hidden ({clf_in} != "
            f"{word.shape[1]}); the reference only supports this for UC2")
    rows = []
    for answer, _label in sorted(ans2label.items()):
        toks = tokenizer.tokenize(answer)
        ids = tokenizer.convert_tokens_to_ids(toks)
        if len(ids):
            rows.append(word[np.asarray(ids)].mean(axis=0))
        else:
            unk = tokenizer.convert_tokens_to_ids(
                tokenizer.tokenize("<unk>"))[0]
            rows.append(word[unk])
    emb = np.stack(rows)                      # [num_labels, hidden]
    import jax.numpy as jnp
    params = dict(params)
    clf = dict(params["classifier"])
    clf["fc2"] = dict(clf["fc2"])
    clf["fc2"]["w"] = jnp.asarray(emb.T)      # ours is [hidden, num_labels]
    params["classifier"] = clf
    return params


def maybe_device_bank(ds, cfg, task_cfg, *, budget_bytes: int = 6 << 30):
    """Build a DeviceFeatureBank when the processed store fits the HBM
    budget — eliminates per-batch feature upload (13x eval throughput in the
    dev environment; see docs/PERFORMANCE.md)."""
    from ..data.device_bank import DeviceFeatureBank
    n = ds.store.n_records
    per = task_cfg.max_region_num * (2048 + cfg.num_locs) * 4
    if n * per > budget_bytes:
        return None
    return DeviceFeatureBank(
        ds.store, max_regions=task_cfg.max_region_num, num_locs=cfg.num_locs,
        norm_embeddings=getattr(cfg, "norm_embeddings", False),
        add_global_imgfeat=getattr(cfg, "add_global_imgfeat", None))
