"""Dump the XLA-assigned layouts at the Pallas custom-call boundary of the
full train step.

The round-4 XProf of the flat-attention M3P step attributes ~44 ms to
per-layer `transpose_jvp`/fusion copies with NO corresponding transposes in
the lowered StableHLO — i.e. XLA layout-assignment copies where Mosaic's
row-major operand requirement meets XLA's preferred layouts for the
surrounding projection GEMMs (docs/PERFORMANCE.md round 4 cont.). Before
designing another kernel boundary (the proj whole-block kernel moved the
copies instead of deleting them), this tool reads the OPTIMIZED HLO and
prints, for every tpu_custom_call:

  - each operand: shape, layout, and the producer op (is it a `copy`/
    `transpose` fusion? what layout does the copy's input have?)
  - each consumer of the call's results and the layout it expects

That answers "which boundary layout would XLA actually prefer" with
compiler ground truth instead of guesses.

Usage: python tools/dump_boundary_layouts.py [--m3p] [--uc2]
"""
import argparse
import os
import re
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_step(m3p: bool):
    import jax
    import jax.numpy as jnp
    from clg_vqa_tpu.train import loop as tl
    from clg_vqa_tpu.train.optim import make_optimizer, warmup_linear_schedule
    from clg_vqa_tpu.models.layers import unstack_layer_params
    r = np.random.RandomState(0)
    if m3p:
        from clg_vqa_tpu.config import M3PConfig
        from clg_vqa_tpu.models import m3p as mod
        cfg = M3PConfig()
        T, R, nl = 40, 100, cfg.num_locs
        unroll = False
    else:
        from clg_vqa_tpu.config import UC2Config
        from clg_vqa_tpu.models import uc2 as mod
        cfg = UC2Config()
        T, R, nl = 40, 36, cfg.num_locs
        unroll = True
    params = mod.init_params(jax.random.key(0), cfg)
    D = jnp.asarray(r.rand(cfg.num_labels, cfg.num_labels), jnp.float32)
    opt = make_optimizer(unstack_layer_params(params, cfg.num_layers),
                         warmup_linear_schedule(4e-5, 2000, 20000))
    state = tl.perlayer_state(
        tl.TrainState(params, opt.init(params), jnp.zeros((), jnp.int32)),
        cfg.num_layers)
    step = jax.jit(
        tl.make_train_step(mod.forward, cfg, opt, D, semantic_lambda=10.0,
                           top_k=10, compute_dtype=jnp.bfloat16,
                           unroll_accum=unroll, fused_attn="flat"),
        donate_argnums=(0,))
    acc, mbs = 2, 128
    batch = {
        "input_ids": jnp.asarray(r.randint(3, cfg.vocab_size, (acc, mbs, T)),
                                 jnp.int32),
        "input_mask": jnp.ones((acc, mbs, T), jnp.int32),
        "features": jnp.asarray(r.randn(acc, mbs, R, cfg.v_feature_size),
                                np.float32),
        "locs": jnp.asarray(r.rand(acc, mbs, R, nl), np.float32),
        "image_mask": jnp.ones((acc, mbs, R), jnp.int32),
        "labels": jnp.asarray(r.randint(0, cfg.num_labels, (acc, mbs)),
                              jnp.int32),
    }
    rng = jax.random.key(0, impl="rbg")
    return step, state, batch, rng


_DEF = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\S+?)\s+([\w\-]+)\(")


def index_computation(lines):
    """name -> (full line, opcode, result type) for one HLO computation."""
    out = {}
    for ln in lines:
        m = _DEF.match(ln)
        if m:
            out[m.group(1)] = (ln.strip(), m.group(3), m.group(2))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m3p", action="store_true")
    args = ap.parse_args()
    step, state, batch, rng = build_step(args.m3p)
    import jax
    txt = step.lower(state, batch, rng).compile().as_text()
    out_path = "/tmp/step_hlo.txt"
    with open(out_path, "w") as f:
        f.write(txt)
    print("HLO saved to", out_path, len(txt), "bytes")
    lines = txt.splitlines()
    defs = index_computation(lines)

    # uses: name -> list of (user line)
    uses = {}
    tok = re.compile(r"%?([\w.\-]+)")
    for ln in lines:
        m = _DEF.match(ln)
        if not m:
            continue
        body = ln.split("=", 1)[1]
        for t in set(tok.findall(body)):
            if t in defs and t != m.group(1):
                uses.setdefault(t, []).append(ln.strip())

    calls = [ln for ln in lines if "custom-call" in ln
             and ("tpu_custom_call" in ln or "Mosaic" in ln)]
    print(f"{len(calls)} tpu custom-call lines")
    seen = set()
    for ln in calls:
        m = _DEF.match(ln)
        if not m:
            continue
        name = m.group(1)
        # dedupe textually identical call signatures (scan bodies repeat)
        sig = re.sub(r"[\w.\-]+\.\d+", "X", ln)
        if sig in seen:
            continue
        seen.add(sig)
        print("=" * 100)
        print("CALL:", ln.strip()[:400])
        # operands: tokens inside the first (...) group that are known defs
        body = ln.split("custom-call(", 1)
        if len(body) == 2:
            ops = body[1].split(")", 1)[0]
            for t in tok.findall(ops):
                if t in defs:
                    dline, opcode, rtype = defs[t]
                    print(f"  OPERAND {t}: {opcode} :: {rtype}")
                    if opcode in ("copy", "transpose", "fusion", "bitcast"):
                        print(f"    producer: {dline[:300]}")
        for u in uses.get(name, [])[:6]:
            print(f"  USER: {u[:300]}")
    # summary: all copy ops on [*,*,768]-ish activations with their layouts
    print("=" * 100)
    copies = {}
    for ln in lines:
        m = _DEF.match(ln)
        if m and m.group(3) == "copy":
            sig = m.group(2)
            copies[sig] = copies.get(sig, 0) + 1
    print("copy ops by result type:")
    for sig, n in sorted(copies.items(), key=lambda kv: -kv[1]):
        print(f"  {n:4d}x {sig}")


if __name__ == "__main__":
    main()
