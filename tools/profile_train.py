"""XProf capture + op-level breakdown of the UC2 (or M3P) train step.

Runs a few steady-state steps under jax.profiler and prints the top device
ops by self-time from the captured trace (no TensorBoard UI needed — parses
the xplane protobuf via tensorboard_plugin_profile when available, else
leaves the raw trace directory for manual inspection).

Usage: python tools/profile_train.py [--m3p] [--steps N] [--out DIR]
"""
import argparse
import glob
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def top_ops_from_trace(logdir: str, k: int = 30):
    """Aggregate device 'XLA Ops' self-times from the Chrome trace JSON the
    profiler writes alongside the xplane (no extra proto deps needed)."""
    import gzip
    import json
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return None
    d = json.load(gzip.open(sorted(paths, key=os.path.getmtime)[-1]))
    evs = d["traceEvents"]
    dev_pids = set()
    op_tids = set()
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name" \
                and "TPU" in e["args"]["name"]:
            dev_pids.add(e["pid"])
    if not dev_pids:
        return None     # non-TPU trace (CPU mesh debug run): no device rows
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "thread_name" \
                and e["pid"] in dev_pids and e["args"]["name"] == "XLA Ops":
            op_tids.add((e["pid"], e["tid"]))
    rows = {}
    for e in evs:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids:
            rows[e["name"]] = rows.get(e["name"], 0.0) + e.get("dur", 0.0)
    total = sum(rows.values())
    out = sorted(rows.items(), key=lambda kv: -kv[1])[:k]
    return [(n, us / 1e3, 100.0 * us / max(total, 1e-9)) for n, us in out], \
        total / 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m3p", action="store_true")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/xprof_train")
    ap.add_argument("--acc", type=int, default=2)
    ap.add_argument("--mbs", type=int, default=128)
    ap.add_argument("--unroll-accum", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="tri-state: default None = model default "
                         "(UC2 True / M3P False); --no-unroll-accum to A/B")
    ap.add_argument("--fused-attn", action="store_true",
                    help="A/B the Pallas custom-VJP train attention "
                         "(ops/attention.fused_attention_train): probs + "
                         "dropout mask recomputed in VMEM, never in HBM")
    ap.add_argument("--fused-hm", action="store_true",
                    help="head-major variant of --fused-attn: projections "
                         "emit [B,H,S,hd] straight into the kernel blocks "
                         "(no split/merge transposes, no transpose_jvp)")
    ap.add_argument("--fused-flat", action="store_true",
                    help="flat-boundary variant of --fused-attn: q/k/v stay "
                         "[B,S,H*hd], heads looped INSIDE the kernel over "
                         "64-aligned lane slices (no transposes at all)")
    ap.add_argument("--fused-proj", action="store_true",
                    help="projected-boundary variant: the q/k/v projections, "
                         "attention core AND output projection all run "
                         "inside Pallas (ops/attention.fused_attention_block)"
                         " — only x/y (fwd) and g/dx (bwd) cross the "
                         "custom-call boundary")
    ap.add_argument("--fused-sm", action="store_true",
                    help="S-major-boundary variant: q/k/v cross the Pallas "
                         "boundary as [S,B,HD] (row-major == the conv "
                         "emitter's preferred {2,0,1}), so the per-layer "
                         "layout-assignment copies fold into bitcasts")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from clg_vqa_tpu.train import loop as tl
    from clg_vqa_tpu.train.optim import make_optimizer, warmup_linear_schedule

    r = np.random.RandomState(0)
    if args.m3p:
        from clg_vqa_tpu.config import M3PConfig
        from clg_vqa_tpu.models import m3p as mod
        cfg = M3PConfig()
        T, R, nl = 40, 100, 5
        unroll_accum = (args.unroll_accum if args.unroll_accum is not None
                        else False)
    else:
        from clg_vqa_tpu.config import UC2Config
        from clg_vqa_tpu.models import uc2 as mod
        cfg = UC2Config()
        T, R, nl = 40, 36, 7
        unroll_accum = (args.unroll_accum if args.unroll_accum is not None
                        else True)

    from clg_vqa_tpu.models.layers import unstack_layer_params
    params = mod.init_params(jax.random.key(0), cfg)
    D = jnp.asarray(r.rand(cfg.num_labels, cfg.num_labels)
                    .astype(np.float32))
    opt = make_optimizer(unstack_layer_params(params, cfg.num_layers),
                         warmup_linear_schedule(4e-5, 100, 10000))
    state = tl.perlayer_state(
        tl.TrainState(params, opt.init(params), jnp.zeros((), jnp.int32)),
        cfg.num_layers)
    step = jax.jit(tl.make_train_step(
        mod.forward, cfg, opt, D, semantic_lambda=10.0, top_k=10,
        compute_dtype=jnp.bfloat16, unroll_accum=unroll_accum,
        fused_attn=("hm" if args.fused_hm else
                    "proj" if args.fused_proj else
                    "sm" if args.fused_sm else
                    "flat" if args.fused_flat else args.fused_attn)),
        donate_argnums=(0,))

    acc, mbs = args.acc, args.mbs
    batch = {
        "input_ids": jnp.asarray(
            r.randint(3, cfg.vocab_size, (acc, mbs, T)), jnp.int32),
        "input_mask": jnp.ones((acc, mbs, T), jnp.int32),
        "features": jnp.asarray(
            r.randn(acc, mbs, R, cfg.v_feature_size), np.float32),
        "locs": jnp.asarray(r.rand(acc, mbs, R, nl), np.float32),
        "image_mask": jnp.ones((acc, mbs, R), jnp.int32),
        "labels": jnp.asarray(r.randint(0, cfg.num_labels, (acc, mbs)),
                              jnp.int32),
    }
    rng = jax.random.key(0, impl="rbg")

    # warmup
    import time
    for _ in range(3):
        state, m = step(state, batch, rng)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m = step(state, batch, rng)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / args.steps
    print(f"steady-state: {dt*1e3:.1f} ms/step -> "
          f"{acc*mbs/dt:.0f} QA/s", file=sys.stderr)

    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        state, m = step(state, batch, rng)
    jax.block_until_ready(m)
    jax.profiler.stop_trace()

    try:
        res = top_ops_from_trace(args.out)
    except Exception as e:
        print(f"xplane parse failed ({e}); trace left at {args.out}",
              file=sys.stderr)
        return
    if res is None:
        print(f"no TPU-device trace rows under {args.out} "
              f"(no *.trace.json.gz, or a non-TPU run)", file=sys.stderr)
        return
    rows, total = res
    print(f"total device op time {total/args.steps:.1f} ms/step "
          f"({args.steps} steps)")
    for name, ms, pct in rows:
        print(f"{ms/args.steps:9.3f} ms {pct:5.1f}%  {name[:100]}")


if __name__ == "__main__":
    main()
