"""Benchmark: UC2 GQA fine-tuning throughput (QA pairs/sec/chip) on TPU.

Runs the reference recipe's exact compute envelope — UC2 (281.6M params),
effective batch 256 via 4x64 grad accumulation, 40 text tokens + 36 regions,
semantic-prior loss (top-10 over 1842 labels), clip(1.0) + AdamW — as our
single fused XLA step, and reports steady-state throughput on one chip.

vs_baseline: the reference publishes no throughput (BASELINE.md — accuracy
only, hardware unspecified beyond 1 GPU). We compare against a documented
engineering estimate of the reference stack on a V100: ~59 GFLOP/sample
(fwd+bwd, 86M encoder-path params x 76 tokens) at a generous 40% fp32 MFU on
a 15.7 TFLOP/s V100 => ~210 samples/s compute-bound, before its measured
host-side bottleneck (per-batch O(bs x 1842) Python distance loop +
tensorpack/ZMQ pipeline). We use 210 QA pairs/sec as the baseline constant.

Capture contract (CLAUDE.md): this script prints EXACTLY ONE JSON line on
stdout, always — even when the TPU tunnel is down. The measurement runs in
a child subprocess so a hung backend init (observed: ~20 min hang then
UNAVAILABLE in round 3) can be killed and retried with backoff; after the
final failed attempt we still emit one parseable record with value=null and
the error tail. All diagnostics go to stderr.
"""
import json
import os
import subprocess
import sys
import time

REF_V100_QA_PAIRS_PER_SEC = 210.0   # documented estimate, see module docstring
METRIC = "UC2 GQA fine-tune throughput (bs256, semantic prior, AdamW)"

# retry envelope: a down tunnel fails the cheap preflight fast (bounded at
# PREFLIGHT_TIMEOUT) and we back off instead of burning a full measurement
# timeout per hang. Worst case ~5*(6+2) min before the null record.
ATTEMPTS = 5
BACKOFF_S = 120
PREFLIGHT_TIMEOUT = 360       # backend init alone; hangs observed here
MEASURE_TIMEOUT = 2400        # init + compile (cold remote compile ~10-15 min)


def _measure():
    """The actual benchmark. Runs in the child process ("--inner")."""
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import numpy as np
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from clg_vqa_tpu.config import UC2Config
    from clg_vqa_tpu.models import uc2
    from clg_vqa_tpu.train import loop as tl
    from clg_vqa_tpu.train.optim import make_optimizer, warmup_linear_schedule

    cfg = UC2Config()
    params = uc2.init_params(jax.random.key(0), cfg)
    D = jnp.asarray(np.random.RandomState(0)
                    .rand(cfg.num_labels, cfg.num_labels).astype(np.float32))
    from clg_vqa_tpu.models.layers import unstack_layer_params
    # per-layer training layout (loop.perlayer_state): encoder grads as
    # independent leaves — no stacked-gradient DUS copies in the backward
    opt = make_optimizer(unstack_layer_params(params, cfg.num_layers),
                         warmup_linear_schedule(4e-5, 2000, 20000))
    state = tl.perlayer_state(
        tl.TrainState(params, opt.init(params), jnp.zeros((), jnp.int32)),
        cfg.num_layers)
    # flat-boundary Pallas train attention: the product default for bf16 on
    # TPU (FinetuneRunner fused_attn='auto'; UC2 130.0 -> 124.2 ms/step
    # same-day, docs/PERFORMANCE.md round 4). Non-TPU fallback keeps XLA so
    # the script still runs on a CPU debug box.
    fused = "flat" if jax.default_backend() == "tpu" else False
    step = jax.jit(
        tl.make_train_step(uc2.forward, cfg, opt, D, semantic_lambda=10.0,
                           unroll_accum=True, fused_attn=fused),
        donate_argnums=(0,))

    # grad-accum layout: 2x128 is mathematically identical to the reference's
    # 4x64 (tests/test_train.py::test_grad_accum_equivalence) but ~6% faster
    # on v5e (fewer dense gradient-accumulation passes); 1x256 exceeds HBM
    # without remat and remat costs more than it saves at this scale.
    acc, mbs, T, R = 2, 128, 40, 36
    r = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(
            r.randint(3, cfg.vocab_size, (acc, mbs, T)), jnp.int32),
        "input_mask": jnp.ones((acc, mbs, T), jnp.int32),
        "features": jnp.asarray(
            r.randn(acc, mbs, R, cfg.v_feature_size), jnp.float32),
        "locs": jnp.asarray(r.rand(acc, mbs, R, cfg.num_locs), jnp.float32),
        "image_mask": jnp.ones((acc, mbs, R), jnp.int32),
        "labels": jnp.asarray(
            r.randint(0, cfg.num_labels, (acc, mbs)), jnp.int32),
    }

    # rbg PRNG: hardware-friendly dropout bits (threefry costs ~20% step time)
    key = lambda i: jax.random.key(i, impl="rbg")
    # warmup (compile)
    state, m = step(state, batch, key(0))
    jax.block_until_ready(m)

    n_iters = 20
    t0 = time.time()
    for i in range(n_iters):
        state, m = step(state, batch, key(i + 1))
    jax.block_until_ready(m)
    dt = (time.time() - t0) / n_iters
    qa_per_sec = acc * mbs / dt

    print(json.dumps({
        "metric": METRIC,
        "value": round(qa_per_sec, 1),
        "unit": "QA pairs/sec/chip",
        "vs_baseline": round(qa_per_sec / REF_V100_QA_PAIRS_PER_SEC, 2),
    }))


def _run_child(args, timeout):
    """Run a child python, return (ok, stdout, err_tail)."""
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    try:
        p = subprocess.run([sys.executable] + args, capture_output=True,
                           text=True, timeout=timeout, env=env,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return False, "", f"timeout after {timeout}s"
    tail = (p.stderr or "")[-500:].replace("\n", " ").strip()
    return p.returncode == 0, p.stdout or "", tail


def _extract_record(stdout):
    """Last stdout line that parses as our JSON record (tolerates stray
    logging from plugins above the record line)."""
    for line in reversed(stdout.strip().splitlines()):
        try:
            rec = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
        if isinstance(rec, dict) and rec.get("metric") == METRIC:
            return rec
    return None


def main():
    last_err = "no attempts ran"
    for attempt in range(1, ATTEMPTS + 1):
        print(f"[bench] attempt {attempt}/{ATTEMPTS}: preflight backend init",
              file=sys.stderr, flush=True)
        ok, _, err = _run_child(
            ["-c", "import jax; d=jax.devices(); print(d[0].platform)"],
            PREFLIGHT_TIMEOUT)
        if not ok:
            last_err = f"backend preflight: {err}"
            print(f"[bench] preflight failed: {err}", file=sys.stderr,
                  flush=True)
        else:
            print("[bench] preflight ok; measuring", file=sys.stderr,
                  flush=True)
            ok, out, err = _run_child([os.path.abspath(__file__), "--inner"],
                                      MEASURE_TIMEOUT)
            rec = _extract_record(out)
            if ok and rec is not None:
                print(json.dumps(rec))
                return
            last_err = f"measurement: {err or 'no JSON record in output'}"
            print(f"[bench] measurement failed: {last_err}", file=sys.stderr,
                  flush=True)
        if attempt < ATTEMPTS:
            print(f"[bench] backing off {BACKOFF_S}s", file=sys.stderr,
                  flush=True)
            time.sleep(BACKOFF_S)
    print(json.dumps({
        "metric": METRIC,
        "value": None,
        "unit": "QA pairs/sec/chip",
        "vs_baseline": None,
        "error": last_err[-300:],
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--inner":
        _measure()
    else:
        main()
