"""Full-scale eval throughput bench (the docs/PERFORMANCE.md numbers);
--m3p switches to M3P at the X101 recipe (100 regions, num_locs 5).

Synthetic but full-scale: UC2 base config (12x768, 250k vocab, 1842 labels),
400-image CFS store of [36, 2048] features, 8192 QA entries, bs 1024,
device-resident feature bank (HBM-direct). Reports steady QA/s through
eval.runner.run_eval — the same code path as `cli eval`.

Usage: python tools/bench_eval.py [--no-bank] [--bs N]
"""
import argparse
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=1024)
    ap.add_argument("--n-images", type=int, default=400)
    ap.add_argument("--n-qa", type=int, default=8192)
    ap.add_argument("--no-bank", action="store_true")
    ap.add_argument("--m3p", action="store_true",
                    help="M3P at the X101 recipe (100 regions, num_locs 5)")
    ap.add_argument("--no-fused", action="store_true",
                    help="disable the Pallas fused-attention eval path")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from clg_vqa_tpu.config import UC2Config
    from clg_vqa_tpu.data.cfs import CfsReader, CfsWriter
    from clg_vqa_tpu.data.device_bank import DeviceFeatureBank
    from clg_vqa_tpu.data.features import RegionRecord
    from clg_vqa_tpu.data.gqa import Entry, GQADataset
    from clg_vqa_tpu.data.tokenizer import HashTokenizer
    from clg_vqa_tpu.eval.runner import make_predict_step, run_eval
    from clg_vqa_tpu.models import m3p, uc2

    if args.m3p:
        from clg_vqa_tpu.config import M3PConfig
        cfg, mod, R, nl = M3PConfig(), m3p, 100, 5
    else:
        cfg, mod, R, nl = UC2Config(), uc2, 36, 7
    r = np.random.RandomState(0)
    tmp = tempfile.mkdtemp()
    import atexit
    import shutil
    atexit.register(shutil.rmtree, tmp, True)
    path = os.path.join(tmp, "feats.cfs")
    w = CfsWriter(path)
    for i in range(args.n_images):
        w.add(RegionRecord(
            image_id=str(i),
            features=r.randn(R, 2048).astype(np.float32),
            boxes=(r.rand(R, 4) * 300 + np.array([0, 0, 50, 50])).astype(
                np.float32),
            img_w=640.0, img_h=480.0))
    w.close()
    reader = CfsReader(path)

    words = [f"word{i}" for i in range(3000)]
    entries = [Entry(question_id=i, image_id=str(r.randint(args.n_images)),
                     question=" ".join(r.choice(words, r.randint(4, 12))),
                     labels=[int(r.randint(cfg.num_labels))], scores=[1.0])
               for i in range(args.n_qa)]
    ds = GQADataset(entries, reader, HashTokenizer(cfg.vocab_size),
                    max_seq_length=40, max_region_num=R, num_locs=nl,
                    norm_embeddings=getattr(cfg, "norm_embeddings", False))
    label2ans = [f"a{i}" for i in range(cfg.num_labels)]

    params = mod.init_params(jax.random.key(0), cfg)
    bank = None
    if not args.no_bank:
        bank = DeviceFeatureBank(
            reader, max_regions=R, num_locs=nl,
            norm_embeddings=getattr(cfg, "norm_embeddings", False))
        print(f"bank: {bank.nbytes/1e6:.0f} MB on device", file=sys.stderr)

    # same auto gate as run_eval (eval/runner.py): bf16 (this bench uses
    # the default bf16 compute dtype) + bs>=512 + tpu; --no_fused forces
    # the XLA path — the step is built ONCE and reused across both calls
    import jax.numpy as jnp
    fused = ("flat" if (not args.no_fused and args.bs >= 512
                        and jax.default_backend() == "tpu") else False)
    step = make_predict_step(mod.forward, cfg, device_bank=bank,
                             compute_dtype=jnp.bfloat16, fused_attn=fused)
    # warmup (compile)
    run_eval(mod.forward, params, cfg, ds, label2ans,
             batch_size=args.bs, device_bank=bank, step=step)
    t0 = time.time()
    res = run_eval(mod.forward, params, cfg, ds, label2ans,
                   batch_size=args.bs, device_bank=bank, step=step)
    dt = time.time() - t0
    print(f"eval: {res['n']} QA in {dt:.2f}s -> {res['n']/dt:.0f} QA/s "
          f"(bank={'on' if bank else 'off'}, bs={args.bs}, "
          f"fused={'on' if fused else 'off'})")


if __name__ == "__main__":
    main()
