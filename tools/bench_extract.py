"""Full-scale feature-extraction throughput bench (docs/PERFORMANCE.md).

Random weights, synthetic 600x1000 BGR images, steady-state img/s through
extract_many (the same code path as `cli extract`), at one or more
device-batch sizes.

Usage: python tools/bench_extract.py [--detector c4|x101] [--n 14]
                                     [--device-batch 1 2 ...]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--detector", choices=("c4", "x101"), default="x101")
    ap.add_argument("--n", type=int, default=14)
    ap.add_argument("--device-batch", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--profile", action="store_true",
                    help="XProf the steady-state run and print top device "
                         "ops (stage attribution for docs/PERFORMANCE.md)")
    ap.add_argument("--workers", type=int, default=2,
                    help="prefetch/decode pool size; 0 = inline")
    ap.add_argument("--roi-chunk", type=int, default=None,
                    help="x101 only: RoIAlign box_chunk override "
                         "(0 = unchunked; default = X101Config default)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    if args.detector == "c4":
        from clg_vqa_tpu.models.detector.extractor import (
            Extractor36, init_extractor_params)
        ex = Extractor36(init_extractor_params(jax.random.key(0)))
    else:
        from clg_vqa_tpu.models.detector.extractor_x101 import (
            ExtractorX101, X101Config, init_x101_params)
        cfg = X101Config()
        if args.roi_chunk is not None:
            import dataclasses
            cfg = dataclasses.replace(
                cfg, roi_box_chunk=args.roi_chunk or None)
        ex = ExtractorX101(init_x101_params(jax.random.key(0)), cfg)

    r = np.random.RandomState(0)
    imgs = [((r.rand(600, 1000, 3) * 255).astype(np.uint8), f"i{k}")
            for k in range(args.n)]
    for db in args.device_batch:
        list(ex.extract_many(iter(imgs[:2 * db]), device_batch=db,
                              prefetch_workers=args.workers))  # warmup
        t0 = time.time()
        out = list(ex.extract_many(iter(imgs), device_batch=db,
                                   prefetch_workers=args.workers))
        dt = time.time() - t0
        print(f"{args.detector} device_batch={db} workers={args.workers}: {len(out)} imgs in "
              f"{dt:.2f}s -> {len(out)/dt:.2f} img/s "
              f"({1000*dt/len(out):.0f} ms/img)")
        if args.profile:
            import jax
            from profile_train import top_ops_from_trace
            logdir = f"/tmp/xprof_extract_{args.detector}_db{db}"
            jax.profiler.start_trace(logdir)
            list(ex.extract_many(iter(imgs), device_batch=db,
                                 prefetch_workers=args.workers))
            jax.profiler.stop_trace()
            res = top_ops_from_trace(logdir)
            if res is None:
                print(f"  (no device trace rows under {logdir})")
                continue
            rows, total = res
            n_prog = len(imgs) // db
            print(f"  device op time {total / n_prog:.1f} ms/program "
                  f"({db} img/program); top ops:")
            for name, ms, pct in rows[:12]:
                print(f"    {ms / n_prog:8.2f} ms {pct:5.1f}%  {name}")


if __name__ == "__main__":
    main()
