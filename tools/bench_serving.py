"""Serving latency/throughput bench for eval.predictor.Predictor at full
UC2 scale (12x768x250k, bank-backed): single-request p50/p95 latency and
batch-capacity throughput. docs/PERFORMANCE.md records the results.

Usage: python tools/bench_serving.py [--cap 8] [--n 100]
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
    ap.add_argument("--cap", type=int, default=8)
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--n-images", type=int, default=100)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from clg_vqa_tpu.config import UC2Config
    from clg_vqa_tpu.data.cfs import CfsReader, CfsWriter
    from clg_vqa_tpu.data.features import RegionRecord
    from clg_vqa_tpu.data.tokenizer import HashTokenizer
    from clg_vqa_tpu.eval.predictor import Predictor
    from clg_vqa_tpu.models import uc2

    r = np.random.RandomState(0)
    cfg = UC2Config()
    tmp = tempfile.mkdtemp()
    import atexit
    import shutil
    atexit.register(shutil.rmtree, tmp, True)
    path = os.path.join(tmp, "serve.cfs")
    with CfsWriter(path) as w:
        for i in range(args.n_images):
            n = 36
            boxes = np.stack([r.rand(n) * 300, r.rand(n) * 300,
                              300 + r.rand(n) * 300, 300 + r.rand(n) * 300],
                             1).astype(np.float32)
            w.add(RegionRecord(f"img{i}", r.randn(n, 2048).astype(np.float32),
                               boxes, 640.0, 640.0))

    params = uc2.init_params(jax.random.key(0), cfg)
    label2ans = [f"ans{k}" for k in range(cfg.num_labels)]
    p = Predictor(uc2.forward, params, cfg, CfsReader(path), HashTokenizer(),
                  label2ans, batch_capacity=args.cap)

    qs = [f"what color is object number {i} ?" for i in range(args.n)]
    p.predict(qs[0], "img0")                      # compile
    lats = []
    for i in range(args.n):
        t0 = time.perf_counter()
        p.predict(qs[i], f"img{i % args.n_images}")
        lats.append((time.perf_counter() - t0) * 1e3)
    lats = np.sort(lats)
    print(f"single-request latency (cap={args.cap}): "
          f"p50={np.percentile(lats, 50):.2f} ms  "
          f"p95={np.percentile(lats, 95):.2f} ms")

    reqs = [(qs[i % args.n], f"img{i % args.n_images}")
            for i in range(args.cap * 50)]
    t0 = time.perf_counter()
    p.predict_batch(reqs)
    dt = time.perf_counter() - t0
    print(f"batched throughput (cap={args.cap}): "
          f"{len(reqs)/dt:.0f} req/s ({1e3*dt/len(reqs):.2f} ms/req)")


if __name__ == "__main__":
    main()
