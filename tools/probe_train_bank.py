"""A/B probe: M3P train step with the in-step device-bank gather, default
bank layout vs the XLA-chosen (Layout.AUTO) layout.

Round 4 root-caused the M3P 6% integrated-vs-probe gap to the in-step bank
gather: XProf shows the cost is not the gather arithmetic but XLA's layout
choice for device-PRODUCED features vs host-provided arguments (a 17 ms
fusion + select_add inflating 6.75 -> 27 ms; train/loop.py NOTE and
docs/PERFORMANCE.md round 4). Three reformulations measured identical.
This probe tries the remaining untried lever: compile the step with the
bank arguments' input layout left to the compiler (jax.experimental.layout
Layout.AUTO), then device_put the bank into the layout the compiled
executable actually wants.

Usage: python tools/probe_train_bank.py [--uc2] [--steps N] [--images N]
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
    ap.add_argument("--uc2", action="store_true")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--images", type=int, default=600)
    ap.add_argument("--acc", type=int, default=2)
    ap.add_argument("--mbs", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format, Layout
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from clg_vqa_tpu.train import loop as tl
    from clg_vqa_tpu.train.optim import make_optimizer, warmup_linear_schedule
    from clg_vqa_tpu.models.layers import unstack_layer_params

    r = np.random.RandomState(0)
    if args.uc2:
        from clg_vqa_tpu.config import UC2Config
        from clg_vqa_tpu.models import uc2 as mod
        cfg, T, R, nl, fused = UC2Config(), 40, 36, 7, "flat"
    else:
        from clg_vqa_tpu.config import M3PConfig
        from clg_vqa_tpu.models import m3p as mod
        cfg, T, R, nl, fused = M3PConfig(), 40, 100, 5, "flat"

    params = mod.init_params(jax.random.key(0), cfg)
    D = jnp.asarray(r.rand(cfg.num_labels, cfg.num_labels).astype(np.float32))
    opt = make_optimizer(unstack_layer_params(params, cfg.num_layers),
                         warmup_linear_schedule(4e-5, 100, 10000))

    def mk_state():
        # fresh device state per measured arm: every arm's jit donates the
        # state buffers (donate_argnums=0, the production train loop's
        # behavior), so a state cannot be reused across arms
        p = mod.init_params(jax.random.key(0), cfg)
        return tl.perlayer_state(
            tl.TrainState(p, opt.init(p), jnp.zeros((), jnp.int32)),
            cfg.num_layers)

    state = mk_state()
    step_fn = tl.make_train_step(
        mod.forward, cfg, opt, D, semantic_lambda=10.0, top_k=10,
        compute_dtype=jnp.bfloat16, unroll_accum=args.uc2, fused_attn=fused)

    acc, mbs = args.acc, args.mbs
    n_img = args.images
    bank = (jnp.asarray(r.randn(n_img, R, 2048).astype(np.float32)),
            jnp.asarray(r.rand(n_img, R, nl).astype(np.float32)),
            jnp.ones((n_img, R), jnp.int32))
    print(f"bank: {sum(int(b.nbytes) for b in bank)/1e6:.0f} MB",
          file=sys.stderr)
    batch = {
        "input_ids": jnp.asarray(
            r.randint(3, cfg.vocab_size, (acc, mbs, T)), jnp.int32),
        "input_mask": jnp.ones((acc, mbs, T), jnp.int32),
        "store_idx": jnp.asarray(r.randint(0, n_img, (acc, mbs)), jnp.int32),
        "labels": jnp.asarray(r.randint(0, cfg.num_labels, (acc, mbs)),
                              jnp.int32),
    }
    rng = jax.random.key(0, impl="rbg")

    def measure(fn, state, bank, label):
        st = state
        for _ in range(3):
            st, m = fn(st, batch, rng, bank)
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            st, m = fn(st, batch, rng, bank)
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / args.steps
        print(f"{label}: {dt*1e3:.1f} ms/step -> {acc*mbs/dt:.0f} QA/s")
        return dt

    # --- baseline: default layouts -------------------------------------
    base = jax.jit(step_fn, donate_argnums=(0,))
    measure(base, state, bank, "default bank layout")

    # --- Pallas scalar-prefetch DMA gather ------------------------------
    # (ops/bank_gather.rows_gather: per-row HBM->HBM DMA, output layout
    # fixed row-major — XLA's layout choice for device-produced features
    # can't leak into the encoder)
    step_pg = tl.make_train_step(
        mod.forward, cfg, opt, D, semantic_lambda=10.0, top_k=10,
        compute_dtype=jnp.bfloat16, unroll_accum=args.uc2, fused_attn=fused,
        pallas_gather=True)
    measure(jax.jit(step_pg, donate_argnums=(0,)), mk_state(), bank,
            "pallas DMA gather")

    # --- AUTO: let XLA choose the bank input layout ---------------------
    def sds(x):
        return jax.ShapeDtypeStruct(x.shape, x.dtype)
    auto_j = jax.jit(
        step_fn,
        in_shardings=(jax.tree.map(lambda _: None, state),
                      {k: None for k in batch}, None,
                      tuple(Format(Layout.AUTO) for _ in bank)),
        donate_argnums=(0,))
    lowered = auto_j.lower(jax.tree.map(sds, state),
                           jax.tree.map(sds, batch), sds(rng),
                           tuple(sds(b) for b in bank))
    comp = lowered.compile()
    fmts = comp.input_formats[0][3]
    for b, f in zip(bank, fmts):
        print(f"  AUTO layout for {b.shape}: {f.layout}", file=sys.stderr)
    bank_auto = tuple(jax.device_put(b, f) for b, f in zip(bank, fmts))
    # re-jit with the concrete chosen formats so dispatch is the normal path
    conc_j = jax.jit(
        step_fn,
        in_shardings=(jax.tree.map(lambda _: None, state),
                      {k: None for k in batch}, None, tuple(fmts)),
        donate_argnums=(0,))
    measure(conc_j, mk_state(), bank_auto, "AUTO bank layout")


if __name__ == "__main__":
    main()
