"""XProf capture + breakdown of the eval predict step (UC2 or M3P) with a
device-resident feature bank at the full recipe scale — answers "where do
the ms/batch go" for the eval loop (reference flow: eval_task.py:96-213).

Times three things at bs N:
 - the full predict step (bank gather + forward + argmax), chained
   (each call's preds fetched) — what run_eval pays per batch;
 - the bank gather alone (jitted separately) — isolates the
   [bs, R, 2048] HBM gather cost at R=36 vs 100;
 - an XProf trace of the full step with the top device ops by self-time.

Usage: python tools/profile_eval.py [--m3p] [--bs N] [--steps N]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from profile_train import top_ops_from_trace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m3p", action="store_true")
    ap.add_argument("--bs", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--n-images", type=int, default=400)
    ap.add_argument("--pallas-gather", action="store_true",
                    help="route the bank feature gather through the Pallas "
                         "scalar-prefetch DMA kernel (ops/bank_gather)")
    ap.add_argument("--bf16-bank", action="store_true",
                    help="store the bank features/locs in bf16 — halves "
                         "the gather's HBM traffic and deletes the "
                         "f32->bf16 convert in the step")
    ap.add_argument("--prefed", action="store_true",
                    help="bypass the bank: time the step with the batch's "
                         "features pre-gathered on device (isolates the "
                         "everything-but-gather cost)")
    ap.add_argument("--attn", default="auto",
                    choices=["auto", "off", "blocked", "flat"],
                    help="eval attention path: auto = the production gate "
                         "(blocked Pallas at bs>=512 on TPU), off = XLA, "
                         "blocked/flat = force that Pallas kernel")
    ap.add_argument("--out", default="/tmp/xprof_eval")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from clg_vqa_tpu.data.device_bank import DeviceFeatureBank

    r = np.random.RandomState(0)
    if args.m3p:
        from clg_vqa_tpu.config import M3PConfig
        from clg_vqa_tpu.models import m3p as mod
        cfg, R, nl = M3PConfig(), 100, 5
    else:
        from clg_vqa_tpu.config import UC2Config
        from clg_vqa_tpu.models import uc2 as mod
        cfg, R, nl = UC2Config(), 36, 7
    T = 40

    params = mod.init_params(jax.random.key(0), cfg)
    bdt = jnp.bfloat16 if args.bf16_bank else jnp.float32
    bank = (jnp.asarray(r.randn(args.n_images, R, 2048), bdt),
            jnp.asarray(r.rand(args.n_images, R, nl), bdt),
            jnp.ones((args.n_images, R), jnp.int32))
    print(f"bank: {sum(int(b.nbytes) for b in bank)/1e6:.0f} MB",
          file=sys.stderr)

    # mirror the production auto gate (eval/runner.py): the fused Pallas
    # attention path is what the real eval loop runs at bs>=512 on TPU —
    # profiling the XLA path there would show ops production doesn't run
    if args.attn == "auto":
        fused = ("flat" if args.bs >= 512
                 and jax.default_backend() == "tpu" else False)
    elif args.attn == "off":
        fused = False
    elif args.attn == "blocked":
        fused = True
    else:
        fused = "flat"
    print(f"attention path: {args.attn} -> fused_attn={fused!r}",
          file=sys.stderr)

    pg = args.pallas_gather

    @jax.jit
    def step(params, batch, bank):
        if bank is not None:
            f, l, m = DeviceFeatureBank.gather_from(
                bank, batch.pop("store_idx"), pallas=pg)
            batch = {**batch, "features": f, "locs": l, "image_mask": m}
        kw = {"fused_attn": fused} if fused else {}
        logits = mod.forward(params, cfg, batch, deterministic=True,
                             compute_dtype=jnp.bfloat16, **kw)
        return jnp.argmax(logits, axis=-1)

    @jax.jit
    def gather_only(bank, idx):
        f, l, m = DeviceFeatureBank.gather_from(bank, idx, pallas=pg)
        # consume so nothing is dead-code-eliminated; sum forces the reads
        return f.sum() + l.sum() + m.sum()

    bs = args.bs
    batch = {
        "input_ids": jnp.asarray(r.randint(3, cfg.vocab_size, (bs, T)),
                                 jnp.int32),
        "input_mask": jnp.ones((bs, T), jnp.int32),
        "store_idx": jnp.asarray(r.randint(0, args.n_images, (bs,)),
                                 jnp.int32),
    }

    if args.prefed:
        # pre-gather ONCE outside the timed loop: the step then measures
        # everything-but-the-gather (upper bound on what a perfectly
        # overlapped gather could reach)
        f, l, m = DeviceFeatureBank.gather_from(bank, batch.pop("store_idx"))
        batch = {**batch, "features": f, "locs": l, "image_mask": m}
        bank = None

    # warmup/compile, then chained timing with fetched preds (the tunnel
    # runtime skips unconsumed work — see docs/PERFORMANCE.md methodology)
    p = np.asarray(step(params, dict(batch), bank))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        p = np.asarray(step(params, dict(batch), bank))
    dt = (time.perf_counter() - t0) / args.steps
    print(f"full step: {dt*1e3:.1f} ms/batch -> {bs/dt:.0f} QA/s "
          f"(bs={bs}, R={R}, fetched)")

    if not args.prefed:
        g = float(gather_only(bank, batch["store_idx"]))
        t0 = time.perf_counter()
        for _ in range(args.steps):
            g = float(gather_only(bank, batch["store_idx"]))
        dt_g = (time.perf_counter() - t0) / args.steps
        print(f"bank gather only: {dt_g*1e3:.2f} ms/batch "
              f"({bs*R*2048*(2 if args.bf16_bank else 4)/1e6:.0f} MB "
              f"feature read)")
    else:
        g = None

    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        p = np.asarray(step(params, dict(batch), bank))
    jax.profiler.stop_trace()
    del p, g

    try:
        res = top_ops_from_trace(args.out)
    except Exception as e:
        print(f"xplane parse failed ({e}); trace left at {args.out}",
              file=sys.stderr)
        return
    if res is None:
        print(f"no trace found under {args.out}", file=sys.stderr)
        return
    rows, total = res
    print(f"total device op time {total/args.steps:.1f} ms/batch")
    for name, ms, pct in rows:
        print(f"{ms/args.steps:9.3f} ms {pct:5.1f}%  {name[:100]}")


if __name__ == "__main__":
    main()
