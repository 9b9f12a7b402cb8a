"""CLI: python -m clg_vqa_tpu.cli {train,prune,sft,eval,score,convert} ...

Mirrors the reference entry points (train_task.py, train_task_prunning.py,
train_task_sft.py, eval_task.py, scripts/GQA_score.py, conversions/) with the
TPU stack underneath."""
from __future__ import annotations

import argparse
import os
import sys

from . import common as C

# Platform escape hatch for smoke runs / CI boxes without a reachable chip:
# the axon TPU plugin overrides the JAX_PLATFORMS env var, so forcing a
# backend must go through jax.config (tests/conftest.py does the same).
_plat = os.environ.get("CLG_VQA_PLATFORM")
if _plat:
    import jax
    jax.config.update("jax_platforms", _plat)


def _train_like(args, mode: str):
    import jax.numpy as jnp
    from ..data.pipeline import TrainPipeline
    from ..train.driver import FinetuneRunner

    cfg, task_cfg, optim_cfg = C.build_configs(args)
    # command.txt: argv + resolved configs (train_task.py:190-193 parity)
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "command.txt"), "w") as f:
        print(vars(args), file=f)
        print("", file=f)
        print(cfg, file=f)
        print(task_cfg, file=f)
        print(optim_cfg, file=f)
    mod, params = C.build_model(args, cfg)
    if task_cfg.embed_clf:
        from ..data.gqa import load_answer_vocab
        ans2label, _ = load_answer_vocab(task_cfg.dataroot)
        params = C.init_classifier_from_answers(
            params, C.build_tokenizer(args), ans2label)
        print(f"embed_clf: classifier initialized from word embeddings of "
              f"{len(ans2label)} answers")
    code_mixer = C.build_code_mixer(task_cfg, args.seed) if mode != "eval" \
        else None
    feat_train = args.features_path or task_cfg.features_path_train
    feat_val = task_cfg.features_path_val or feat_train
    # the reference's primary train artifact is a QA-joined tensorpack LMDB
    # (format: serialized_lmdb); ingest it once into the native store
    train_items = val_items = None
    if C.is_tdlmdb(feat_train):
        feat_train, train_items = C.ingest_tdlmdb(
            feat_train, args.output_dir, "train")
    if C.is_tdlmdb(feat_val):
        feat_val, val_items = C.ingest_tdlmdb(feat_val, args.output_dir, "val")
    train_ds = C.build_dataset(
        args, cfg, task_cfg, task_cfg.train_split, feat_train,
        annotations_jsonpath=args.train_annotations_jsonpath,
        code_mixer=code_mixer, entry_items=train_items)
    val_ds = C.build_dataset(
        args, cfg, task_cfg, task_cfg.val_split, feat_val,
        annotations_jsonpath=args.val_annotations_jsonpath,
        entry_items=val_items)
    if (task_cfg.batch_size % optim_cfg.grad_acc_steps
            or task_cfg.batch_size < optim_cfg.grad_acc_steps):
        raise SystemExit(
            f"batch_size {task_cfg.batch_size} must be a positive multiple "
            f"of --grad_acc_steps {optim_cfg.grad_acc_steps} (silent "
            f"truncation would change the effective batch)")
    micro_bs = task_cfg.batch_size // optim_cfg.grad_acc_steps
    # HBM-direct training: when the train feature store fits the HBM budget,
    # park it on device once and stream only token ids + store_idx — zero
    # per-step feature H2D traffic (the bank rides the jitted step as
    # arguments; see train/loop.py)
    train_bank = None if args.no_train_bank else \
        C.maybe_device_bank(train_ds, cfg, task_cfg, budget_bytes=4 << 30)
    if train_bank is not None:
        print(f"train feature bank resident in HBM "
              f"({train_bank.nbytes / 1e6:.0f} MB)")
    pipe = TrainPipeline(train_ds, micro_batch_size=micro_bs,
                         grad_acc_steps=optim_cfg.grad_acc_steps,
                         seed=args.seed, with_features=train_bank is None)
    D = C.build_distance_matrix(task_cfg, task_cfg.num_labels)
    runner = FinetuneRunner(
        mod.forward, cfg, params, pipe, val_ds, D, task_cfg=task_cfg,
        optim_cfg=optim_cfg, output_dir=args.output_dir,
        model_name="m3p" if args.is_m3p else "uc2",
        compute_dtype=None if args.fp32 else jnp.bfloat16, seed=args.seed,
        train_bank=train_bank, save_every=getattr(args, "save_every", 1),
        mid_save=getattr(args, "mid_save", "none"),
        fused_attn=getattr(args, "fused_attn", "auto"))

    if mode == "train":
        best = runner.finetune(resume=args.resume)
        print(f"Best validation score: {100*best:.3f}")
    elif mode == "prune":
        res = runner.imp_prune(fraction=args.prune_fraction,
                               resume=args.resume)
        print(f"IMP best epoch {res['best_epoch']} "
              f"score {100*res['best_score']:.3f}; history: {res['history']}")
    elif mode == "sft":
        best = runner.sft(args.mask_file, resume=args.resume)
        print(f"SFT best validation score: {100*best:.3f}")


def cmd_eval(args):
    import jax.numpy as jnp
    from ..data.gqa import load_answer_vocab
    from ..eval.runner import run_eval

    cfg, task_cfg, _ = C.build_configs(args)
    mod, params = C.build_model(args, cfg)
    feat = args.features_path or task_cfg.features_path_train
    # eval over the QA-joined td-lmdb artifact works the same way the
    # train path does: ingest once into the native store
    items = None
    if C.is_tdlmdb(feat):
        feat, items = C.ingest_tdlmdb(feat, args.output_dir, args.split)
    ds = C.build_dataset(args, cfg, task_cfg, args.split, feat,
                         annotations_jsonpath=args.annotations_jsonpath,
                         entry_items=items)
    _, label2ans = load_answer_vocab(task_cfg.dataroot)
    bank = C.maybe_device_bank(ds, cfg, task_cfg)
    out = f"{args.output_dir}/{args.split}_result.json"
    res = run_eval(mod.forward, params, cfg, ds, label2ans,
                   batch_size=task_cfg.eval_batch_size,
                   compute_dtype=None if args.fp32 else jnp.bfloat16,
                   out_path=out, split=args.split, device_bank=bank)
    acc = f", accuracy {100*res['accuracy']:.2f}" if res["accuracy"] is not None else ""
    print(f"wrote {out}: {res['n']} predictions at "
          f"{res['qa_per_sec']:.0f} QA/s{acc}")


def cmd_score(args):
    from ..eval.scorer import evaluate_files
    print(100 * evaluate_files(args.preds_file, args.truth_file))


def cmd_convert(args):
    """Torch checkpoint -> orbax params dir (the conversions/ equivalent)."""
    from ..train import checkpoints as ckpt
    cfg, task_cfg, _ = C.build_configs(args)
    params = C.load_pretrained(args.from_pretrained, cfg, args.is_m3p)
    ckpt.save_params(args.output_dir, args.name, params)
    print(f"saved {args.output_dir}/{args.name}")


def cmd_extract(args):
    """Offline region-feature extraction (the features_extraction/ stage):
    images dir -> CFS store using the R101-C4 36-box or X101-FPN 100-box
    pipeline."""
    import glob as _glob

    import jax
    import numpy as np

    from ..data.cfs import CfsWriter
    from ..train import checkpoints as ckpt

    def load_detector_weights(path: str, kind: str):
        """orbax dir, caffe .pkl (VG R101-C4), or torch .pth/.bin
        (vqa-maskrcnn-benchmark X101) — released checkpoints load as-is."""
        if os.path.isdir(path):
            return ckpt.load_params(os.path.dirname(path) or ".",
                                    os.path.basename(path))
        if path.endswith(".pkl"):
            if kind != "c4":
                raise ValueError(
                    "caffe .pkl checkpoints are the VG R101-C4 format; "
                    "--detector x101 loads the vqa-maskrcnn-benchmark "
                    ".pth file")
            import pickle
            with open(path, "rb") as f:
                raw = pickle.load(f, encoding="latin1")
            sd = raw.get("model", raw) if isinstance(raw, dict) else raw
            from ..utils.convert_detector import detectron2_c4_to_pytree
            return detectron2_c4_to_pytree(sd)
        import torch
        raw = torch.load(path, map_location="cpu", weights_only=True)
        sd = raw.get("model", raw) if isinstance(raw, dict) else raw
        sd = {k: v.numpy() for k, v in sd.items()}
        if kind == "c4":
            from ..utils.convert_detector import detectron2_c4_to_pytree
            return detectron2_c4_to_pytree(sd)
        from ..utils.convert_detector import maskrcnn_x101_to_pytree
        return maskrcnn_x101_to_pytree(sd)

    def cfg_overrides(cfg_cls):
        """Size/count overrides -> an ExtractorConfig/X101Config, or None
        for the model defaults. Mirrors the reference's configurable
        INPUT.MIN_SIZE_TEST / MAX_SIZE_TEST and NMS top-k knobs
        (detectron_model.yaml; maskrcnn_benchmark/config/defaults.py)."""
        kw = {}
        for f in ("short", "max_size", "pad_h", "pad_w", "num_boxes",
                  "pre_nms_topk", "post_nms_topk"):
            v = getattr(args, f, 0)
            if v:
                kw[f] = v
        return cfg_cls(**kw) if kw else None

    if args.detector == "c4":
        from ..models.detector.extractor import (Extractor36,
                                                 ExtractorConfig,
                                                 init_extractor_params)
        params = (load_detector_weights(args.weights, "c4") if args.weights
                  else init_extractor_params(jax.random.key(0)))
        ex = Extractor36(params, cfg_overrides(ExtractorConfig))
    else:
        from ..models.detector.extractor_x101 import (ExtractorX101,
                                                      X101Config,
                                                      init_x101_params)
        cfg = cfg_overrides(X101Config)
        params = (load_detector_weights(args.weights, "x101")
                  if args.weights
                  else init_x101_params(jax.random.key(0), cfg))
        ex = ExtractorX101(params, cfg)

    paths = sorted(_glob.glob(os.path.join(args.images, "*")))

    def gen():
        # lazy loaders: the PIL decode runs inside extract_many's prefetch
        # workers, overlapped with device inference
        for p in paths:
            yield ((lambda p=p: _load_image_bgr(p)),
                   os.path.splitext(os.path.basename(p))[0])

    kw = {}
    if getattr(args, "device_batch", 1) > 1:
        kw["device_batch"] = args.device_batch
    n = 0
    with CfsWriter(args.out) as w:
        # pipelined: host decode/preprocess overlaps device inference.
        # --limit counts EXTRACTED records (undecodable files are skipped
        # downstream and must not consume limit slots)
        for rec in ex.extract_many(gen(), **kw):
            w.add(rec)
            n += 1
            if args.limit and n >= args.limit:
                break
    print(f"extracted {n} images -> {args.out}")


def _load_image_bgr(path):
    """BGR uint8 image (cv2.imread parity: None for anything that does
    not decode — corrupt jpgs, stray non-image files). PIL loads RGB;
    flip."""
    import numpy as np
    if path.endswith(".npy"):
        try:
            return np.load(path)
        except Exception:
            return None
    try:
        from PIL import Image
        img = np.asarray(Image.open(path).convert("RGB"))
        return img[:, :, ::-1]
    except ImportError:
        return None
    except Exception:
        return None


def cmd_convert_store(args):
    from ..data import convert_store as cs
    from ..data import tdlmdb as td
    src, dst = args.src, args.dst
    if args.annotations:      # QA-joined td-lmdb production needs the targets
        if src.endswith(".h5"):
            n = td.h5_to_tdlmdb(src, args.annotations, dst)
        else:
            n = td.cfs_to_tdlmdb(src, args.annotations, dst)
        print(f"converted {n} QA records: {src} + {args.annotations} -> {dst}")
        return
    if src.endswith(".h5") and dst.endswith(".cfs"):
        n = cs.h5_to_cfs(src, dst)
    elif src.endswith(".cfs") and dst.endswith(".h5"):
        n = cs.cfs_to_h5(src, dst)
    elif dst.endswith(".cfs") and os.path.isdir(src) and \
            any(f.endswith(".npy") for f in os.listdir(src)):
        n = cs.npy_to_cfs(src, dst)
    elif dst.endswith(".cfs") and C.is_tdlmdb(src):
        entries_pkl = args.entries_out or dst[:-4] + "_target.pkl"
        n_img, n = td.tdlmdb_to_cfs(src, dst, entries_pkl)
        print(f"converted {n} QA records / {n_img} images: {src} -> {dst} "
              f"(+ {entries_pkl})")
        return
    elif dst.endswith(".cfs"):
        n = cs.lmdb_to_cfs(src, dst)
    else:
        n = cs.cfs_to_lmdb(src, dst)
    print(f"converted {n} records: {src} -> {dst}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="clg_vqa_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    for mode in ("train", "prune", "sft"):
        sp = sub.add_parser(mode)
        C.add_common_args(sp)
        C.add_train_args(sp)
        if mode == "prune":
            sp.add_argument("--prune_fraction", type=float, default=0.1)
        if mode == "sft":
            sp.add_argument("--mask_file", required=True)
        sp.set_defaults(fn=lambda a, m=mode: _train_like(a, m))

    sp = sub.add_parser("eval")
    C.add_common_args(sp)
    sp.add_argument("--split", default="test")
    sp.add_argument("--annotations_jsonpath", default="")
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("score")
    sp.add_argument("--preds_file", required=True)
    sp.add_argument("--truth_file", required=True)
    sp.set_defaults(fn=cmd_score)

    sp = sub.add_parser("convert")
    C.add_common_args(sp)
    sp.add_argument("--name", default="params_pretrained")
    sp.set_defaults(fn=cmd_convert)

    sp = sub.add_parser("extract")
    sp.add_argument("--images", required=True, help="directory of images")
    sp.add_argument("--out", required=True, help="output .cfs store")
    sp.add_argument("--detector", choices=("c4", "x101"), default="c4")
    sp.add_argument("--weights", default="",
                    help="orbax params dir (from the caffe-pkl converter)")
    sp.add_argument("--limit", type=int, default=0)
    sp.add_argument("--device_batch", type=int, default=1,
                    help="images per device program (vmapped pipeline, "
                         "better conv utilization; measured sweet spots: "
                         "4 for C4, 16 for X101 (HBM ceiling) — "
                         "PERFORMANCE.md round 4)")
    for f, hint in (("short", "resize short side (MIN_SIZE_TEST)"),
                    ("max_size", "long-side cap (MAX_SIZE_TEST)"),
                    ("pad_h", "padded device height"),
                    ("pad_w", "padded device width"),
                    ("num_boxes", "regions per image"),
                    ("pre_nms_topk", "RPN pre-NMS top-k"),
                    ("post_nms_topk", "RPN post-NMS top-k")):
        sp.add_argument(f"--{f}", type=int, default=0,
                        help=f"{hint}; 0 = detector default")
    sp.set_defaults(fn=cmd_extract)

    sp = sub.add_parser("convert-store")
    sp.add_argument("src")
    sp.add_argument("dst")
    sp.add_argument("--annotations", default="",
                    help="target pkl; triggers QA-joined td-lmdb output "
                         "(h5/cfs + targets -> tdlmdb)")
    sp.add_argument("--entries_out", default="",
                    help="entries pkl path for tdlmdb -> cfs ingest")
    sp.set_defaults(fn=cmd_convert_store)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
