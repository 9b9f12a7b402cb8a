"""On-chip correctness check for the Pallas attention kernels.

The pytest suite runs these kernels in interpret mode on the CPU mesh
(tests/test_attention_kernel.py), which cannot exercise the REAL pltpu PRNG
(interpret mode ignores the seed value and returns all-zero random bits).
This script runs the real kernels on the TPU and checks exactly the
properties interpret mode cannot:

  1. rate=0 value + (dq,dk,dv,dbias) parity vs the XLA attention path
  2. dropout determinism: same rng -> bit-equal output (fwd AND bwd replay)
  3. seed sensitivity: different rng -> different realized mask
  4. realized drop fraction ~= the u8-quantized rate (1 - t/256)
  5. kept-entry identity: every nonzero prob == p * 256/t (exact where
     256/t is a power of two; extracted via linearity in v with H=1, v=I)
  6. dropout-path VJP: (a) the v-linearity identity <dv, v> == loss
     (fwd/bwd mask agreement), (b) dq/dk/dv/dbias vs a float64 host
     reference built from the extracted realized mask

Exits nonzero on any failure; prints one PASS line per property.

``--flat`` runs the same 7 properties against the flat-boundary kernel
(ops/attention.fused_attention_train_flat — the bf16 TPU train default);
the default run checks the head-blocked kernel.
"""
import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def xla_attention(q, k, v, bias, num_heads):
    B, S, HD = q.shape
    D = HD // num_heads
    qh = q.reshape(B, S, num_heads, D)
    kh = k.reshape(B, S, num_heads, D)
    vh = v.reshape(B, S, num_heads, D)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(D)
    probs = jax.nn.softmax(scores + bias, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(B, S, HD)


def check_proj():
    """On-chip properties of the projected-boundary whole-block kernel
    (ops/attention.fused_attention_block via fused='proj'). The dropout
    machinery (_keep_mask + per-grid-cell prng_seed) is SHARED with the
    flat kernel whose 7 properties the default run verifies; what is new
    here is the in-kernel projections and their weight grads, so the
    checks are: full-block parity at rate 0 (value + dx + every dW/db),
    dropout determinism/sensitivity through the block, fwd/bwd mask
    agreement via Wv-linearity (self-calibrating against a deliberately
    mismatched-seed 'bug signal'), and a production-shape bf16 compile."""
    from clg_vqa_tpu.models.layers import multi_head_attention
    r = np.random.RandomState(0)
    B, S, H, hd = 8, 140, 12, 64
    D = H * hd
    x = jnp.asarray(r.randn(B, S, D).astype(np.float32) * 0.5)
    p = {k: {"w": jnp.asarray(r.randn(D, D).astype(np.float32) / np.sqrt(D)),
             "b": jnp.asarray(r.randn(D).astype(np.float32) * 0.1)}
         for k in ("q", "k", "v", "o")}
    mask = np.ones((B, S), np.float32)
    mask[1, -9:] = 0
    bias = jnp.asarray(((1 - mask) * -10000.0)[:, None, None, :])
    w = jnp.asarray(r.randn(B, S, D), jnp.float32)
    rng7, rng8 = jax.random.key(7), jax.random.key(8)

    def loss(xx, params, fused, rate=0.0, rng=rng7):
        y = multi_head_attention(xx, xx, params, H, bias,
                                 dropout_rate=rate, rng=rng,
                                 deterministic=False, fused=fused)
        return jnp.sum(y * w)

    # 1. rate=0 value + grad parity vs the XLA block (x and all weights).
    # Tolerances: fp32 rides the MXU at default precision on both paths
    # but with different contraction orders (the kernel accumulates dW as
    # B/bt per-sample K=S GEMMs into a resident fp32 block vs XLA's single
    # big GEMM) — measured worst case on chip: 1 element of 589k at
    # 2.7e-3 abs / 9.6e-3 rel (dv.w), everything else under 2e-3.
    rv, rg = jax.value_and_grad(loss, (0, 1))(x, p, False)
    kv_, kg = jax.value_and_grad(loss, (0, 1))(x, p, "proj")
    np.testing.assert_allclose(float(kv_), float(rv), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(kg[0]), np.asarray(rg[0]),
                               rtol=2e-2, atol=5e-3, err_msg="dx")
    for kk in ("q", "k", "v", "o"):
        for leaf in ("w", "b"):
            np.testing.assert_allclose(
                np.asarray(kg[1][kk][leaf]), np.asarray(rg[1][kk][leaf]),
                rtol=2e-2, atol=5e-3, err_msg=f"d{kk}.{leaf}")
    print("PASS proj rate=0 value + (dx, dW*, db*) parity vs XLA "
          "(S=140, H=12)")

    # 2-3. dropout determinism + seed sensitivity through the block
    def fwd(rate, rng):
        return multi_head_attention(x, x, p, H, bias, dropout_rate=rate,
                                    rng=rng, deterministic=False,
                                    fused="proj")

    a = np.asarray(fwd(0.5, rng7))
    b = np.asarray(fwd(0.5, rng7))
    c = np.asarray(fwd(0.5, rng8))
    base = np.asarray(fwd(0.0, rng7))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-6, "different rng must differ"
    assert np.abs(a - base).max() > 1e-6, "dropout must be applied"
    g1 = np.asarray(jax.grad(loss)(x, p, "proj", 0.5, rng7))
    g2 = np.asarray(jax.grad(loss)(x, p, "proj", 0.5, rng7))
    np.testing.assert_array_equal(g1, g2)
    print("PASS proj dropout determinism + seed sensitivity "
          "(fwd and bwd replay)")

    # 4. fwd/bwd mask agreement via Wv-linearity: with bv = bo = 0 the
    # block output is LINEAR in Wv under a fixed realized mask, so
    # loss == <dWv, Wv> exactly (up to rounding) — the forward realizes
    # the mask in the fwd kernel, dWv realizes it in the bwd kernels.
    # Self-calibrating: the same identity evaluated with a MISMATCHED
    # seed gives the magnitude a genuine fwd/bwd divergence would show.
    p0 = {**p, "v": {"w": p["v"]["w"], "b": jnp.zeros((D,), jnp.float32)},
          "o": {"w": p["o"]["w"], "b": jnp.zeros((D,), jnp.float32)}}
    lv, gv = jax.value_and_grad(loss, 1)(x, p0, "proj", 0.3, rng7)
    inner = float(jnp.vdot(gv["v"]["w"], p0["v"]["w"]))
    lv8 = float(loss(x, p0, "proj", 0.3, rng8))
    bug_signal = abs(float(lv) - lv8)
    noise = abs(inner - float(lv))
    print(f"     Wv-linearity: <dWv,Wv>={inner:.3f} loss={float(lv):.3f} "
          f"(noise {noise:.3f}; mismatched-seed signal {bug_signal:.3f})")
    assert noise < max(2.0, bug_signal / 10.0), (inner, float(lv), bug_signal)
    print("PASS proj fwd/bwd realize the same mask (Wv-linearity)")

    # 5. production-shape bf16 compile + finite step: mbs=128 at BOTH
    # recipe shapes (VMEM budget check for the real training tiles)
    for S2, tag in ((140, "m3p"), (76, "uc2")):
        x2 = jnp.asarray(np.random.RandomState(1).randn(128, S2, D) * 0.3,
                         jnp.bfloat16)
        b2 = jnp.zeros((128, 1, 1, S2), jnp.float32)
        p2 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)

        def bloss(params):
            y = multi_head_attention(x2, x2, params, H, b2,
                                     dropout_rate=0.1, rng=rng7,
                                     deterministic=False, fused="proj")
            return jnp.sum(y.astype(jnp.float32) ** 2)

        val, grads = jax.jit(jax.value_and_grad(bloss))(p2)
        assert np.isfinite(float(val))
        assert all(np.isfinite(np.asarray(g, np.float32)).all()
                   for g in jax.tree.leaves(grads))
        print(f"PASS proj production-shape bf16 fwd+bwd finite "
              f"(mbs=128, S={S2}, {tag})")
    print("ALL PASS")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flat", action="store_true",
                    help="check the flat-boundary kernel (the bf16 TPU "
                         "train default) instead of the head-blocked one")
    ap.add_argument("--eval-fwd", action="store_true",
                    help="check the two forward-only EVAL kernels "
                         "(blocked fused_attention + flat "
                         "fused_attention_flat) against XLA on chip, then "
                         "exit")
    ap.add_argument("--proj", action="store_true",
                    help="check the projected-boundary whole-block kernel "
                         "(fused='proj': q/k/v projections + attention core "
                         "+ output projection inside Pallas) on chip, then "
                         "exit")
    ap.add_argument("--sm", action="store_true",
                    help="check the S-major-boundary kernel (fused='sm': "
                         "batch on sublanes, heads in 128-lane groups — "
                         "boundary layout == the conv emitter's {2,0,1})")
    args = ap.parse_args()
    assert jax.default_backend() == "tpu", \
        f"needs the real TPU (got {jax.default_backend()})"
    from clg_vqa_tpu.ops import attention as A

    if args.eval_fwd:
        r = np.random.RandomState(0)
        for S, tag in ((140, "m3p"), (76, "uc2")):
            B, H, D = 64, 12, 64
            q = jnp.asarray(r.randn(B, S, H * D), jnp.float32)
            k = jnp.asarray(r.randn(B, S, H * D), jnp.float32)
            v = jnp.asarray(r.randn(B, S, H * D), jnp.float32)
            mask = np.ones((B, S), np.float32)
            mask[1, -9:] = 0
            bias = jnp.asarray(((1 - mask) * -10000.0)[:, None, None, :])
            ref = np.asarray(xla_attention(q, k, v, bias, H))
            for name, kern in (("blocked", A.fused_attention),
                               ("flat", A.fused_attention_flat)):
                got = np.asarray(kern(q, k, v, bias, H))
                np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
                print(f"PASS eval fwd parity on chip: {name} (S={S}, {tag})")
        print("ALL PASS")
        return

    if args.proj:
        check_proj()
        return
    fused_attention_train = (
        A.fused_attention_train_smajor if args.sm
        else A.fused_attention_train_flat if args.flat
        else A.fused_attention_train)
    print(f"kernel under test: "
          f"{'S-major' if args.sm else 'flat-boundary' if args.flat else 'head-blocked'}")

    r = np.random.RandomState(0)
    B, S, H, D = 8, 140, 12, 64
    q = jnp.asarray(r.randn(B, S, H * D), jnp.float32)
    k = jnp.asarray(r.randn(B, S, H * D), jnp.float32)
    v = jnp.asarray(r.randn(B, S, H * D), jnp.float32)
    mask = np.ones((B, S), np.float32)
    mask[1, -9:] = 0
    bias = jnp.asarray(((1 - mask) * -10000.0)[:, None, None, :])
    w = jnp.asarray(r.randn(B, S, H * D), jnp.float32)

    # 1. rate=0 parity (values + grads)
    def ref_loss(q, k, v, bias):
        return jnp.sum(xla_attention(q, k, v, bias, H) * w)

    def ker_loss(q, k, v, bias):
        return jnp.sum(fused_attention_train(q, k, v, bias, H) * w)

    rv, rg = jax.value_and_grad(ref_loss, (0, 1, 2, 3))(q, k, v, bias)
    kv_, kg = jax.value_and_grad(ker_loss, (0, 1, 2, 3))(q, k, v, bias)
    np.testing.assert_allclose(float(kv_), float(rv), rtol=2e-5)
    for g, g2, name in zip(kg, rg, "qkvb"):
        # 5e-4: fp32 accumulation-order noise between the kernel's dots and
        # XLA's einsum on hardware (observed max |diff| 3.6e-4 over 860k
        # elements, 3 outliers past 2e-4)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g2),
                                   rtol=5e-4, atol=5e-4, err_msg=name)
    print("PASS rate=0 value+grad parity vs XLA (S=140, H=12)")

    # 2-3. determinism + seed sensitivity (forward)
    rng7, rng8 = jax.random.key(7), jax.random.key(8)
    a = np.asarray(fused_attention_train(q, k, v, bias, H,
                                         dropout_rate=0.5, rng=rng7))
    b = np.asarray(fused_attention_train(q, k, v, bias, H,
                                         dropout_rate=0.5, rng=rng7))
    c = np.asarray(fused_attention_train(q, k, v, bias, H,
                                         dropout_rate=0.5, rng=rng8))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-6, "different rng must differ"
    base = np.asarray(fused_attention_train(q, k, v, bias, H))
    assert np.abs(a - base).max() > 1e-6, "dropout must be applied"
    print("PASS dropout determinism + seed sensitivity (real pltpu PRNG)")

    # 2b. backward mask replay: same rng -> identical grads twice
    def dloss(q):
        return jnp.sum(fused_attention_train(
            q, k, v, bias, H, dropout_rate=0.5, rng=rng7) * w)
    g1 = np.asarray(jax.grad(dloss)(q))
    g2 = np.asarray(jax.grad(dloss)(q))
    np.testing.assert_array_equal(g1, g2)
    print("PASS backward replays a deterministic mask")

    # 4-5. realized mask semantics via linearity in v (H=1, v=I).
    #
    # Reference probs = the KERNEL's own rate=0 run (same v=I extraction):
    # an XLA-side softmax rounds differently because the q@k^T scores ride
    # the MXU at default precision (measured ~4e-3 rel; XLA-parity of the
    # probs themselves is property 1's job). Even kernel-vs-kernel, the
    # p@v matmul's bf16 operand pass rounds the DROPPED program's
    # bf16(p*r) differently from the rate-0 program's bf16(p)*r — UNLESS
    # r = 256/t is a power of two, where bf16 rounding commutes with the
    # rescale (pure exponent shift). So: exact identity at rate=0.5
    # (t=128, r=2.0), quantized-rescale semantics at rate=0.3 within two
    # bf16 roundings.
    r2 = np.random.RandomState(5)
    Bs, Ss = 8, 128               # HD == Ss so v can carry the identity
    q1 = jnp.asarray(r2.randn(Bs, Ss, Ss), jnp.float32)
    k1 = jnp.asarray(r2.randn(Bs, Ss, Ss), jnp.float32)
    v1 = jnp.broadcast_to(jnp.eye(Ss, dtype=jnp.float32), (Bs, Ss, Ss))
    b1 = jnp.zeros((Bs, 1, 1, Ss), jnp.float32)
    probs = np.asarray(fused_attention_train(q1, k1, v1, b1, 1))
    for rate, rtol, what in ((0.5, 0.0, "exactly (r=2 commutes with bf16)"),
                             (0.3, 2.0 ** -7,   # 2 half-ulp bf16 roundings
                              "within two bf16 roundings")):
        t = int(round((1.0 - rate) * 256.0))
        pd = np.asarray(fused_attention_train(
            q1, k1, v1, b1, 1, dropout_rate=rate, rng=jax.random.key(3)))
        kept = pd != 0.0
        np.testing.assert_allclose(pd[kept], (probs * (256.0 / t))[kept],
                                   rtol=rtol, atol=0)
        frac = 1.0 - kept.mean()
        want = 1.0 - t / 256.0
        assert abs(frac - want) < 0.02, (frac, want)
        print(f"PASS rate={rate}: realized drop fraction {frac:.4f} ~= "
              f"{want:.4f}; kept entries == p*256/t {what}")

    # 6. dropout-path VJP on hardware. Finite differences are unusable
    # here: any useful eps is below one bf16 ulp of the O(1) inputs, and
    # the MXU's bf16 operand pass quantizes the perturbation (measured: fd
    # returns mask-jump noise, not the derivative). Two sharper checks:
    #
    # 6a. v-linearity identity: out is LINEAR in v under a fixed realized
    #     mask, so loss(v) == <dloss/dv, v> exactly (up to rounding). The
    #     forward computes the left side with the FWD kernel's mask, the
    #     VJP computes dv with the BWD kernel's replayed mask — a fwd/bwd
    #     mask divergence breaks the identity by O(sqrt(rate)), not eps.
    rngl = jax.random.key(11)

    def loss_v(vv):
        return jnp.sum(fused_attention_train(
            q, k, vv, bias, H, dropout_rate=0.3, rng=rngl) * w)

    lv, dv = jax.value_and_grad(loss_v)(v)
    inner = float(jnp.vdot(dv, v))
    # ABSOLUTE bound, calibrated on hardware: both sides are near-
    # cancelling sums of ~860k signed O(1) terms, so when the total lands
    # near zero an rtol is meaningless. Measured over 10 (seed, kernel)
    # combos at these fixed shapes/inputs: bf16-operand rounding noise
    # (the fwd's p@v rounds v, the bwd's pd^T@do rounds do=w) reaches at
    # most 0.53 absolute; a genuine fwd/bwd mask divergence (the flat
    # kernel's grid-mismatch bug, caught by this property) measured 20.25
    # — a 38x separation. 2.0 sits ~4x above worst rounding and ~10x
    # below the bug signal.
    assert abs(inner - float(lv)) < 2.0, (inner, float(lv))
    print(f"PASS v-linearity: <dv, v> = {inner:.2f} == loss = "
          f"{float(lv):.2f} +- 2.0 calibrated "
          f"(fwd and bwd realize the same mask)")

    # 6b. full dropout-path VJP vs a float64 HOST reference built from the
    #     extracted realized mask (H=1 config of property 5; the mask is a
    #     function of (seed, grid cell) only, so a different v reuses it).
    rate6, key6 = 0.3, jax.random.key(3)
    t6 = int(round((1.0 - rate6) * 256.0))
    r6 = 256.0 / t6
    M = np.asarray(fused_attention_train(
        q1, k1, v1, b1, 1, dropout_rate=rate6, rng=key6)) != 0.0
    r3 = np.random.RandomState(9)
    v2 = jnp.asarray(r3.randn(Bs, Ss, Ss), jnp.float32)
    w2 = jnp.asarray(r3.randn(Bs, Ss, Ss), jnp.float32)

    def loss6(qq, kk, vv, bb):
        return jnp.sum(fused_attention_train(
            qq, kk, vv, bb, 1, dropout_rate=rate6, rng=key6) * w2)

    kg = jax.grad(loss6, (0, 1, 2, 3))(q1, k1, v2, b1)
    # host reference, float64 end to end
    qd, kd, vd, wd = (np.asarray(x, np.float64) for x in (q1, k1, v2, w2))
    s = qd @ kd.transpose(0, 2, 1) / np.sqrt(Ss)
    e = np.exp(s - s.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    dpd_ = wd @ vd.transpose(0, 2, 1)
    dp = np.where(M, dpd_ * r6, 0.0)
    ds = p * (dp - (dp * p).sum(-1, keepdims=True))
    ref = (ds @ kd / np.sqrt(Ss),                       # dq
           ds.transpose(0, 2, 1) @ qd / np.sqrt(Ss),    # dk
           np.where(M, p * r6, 0.0).transpose(0, 2, 1) @ wd,   # dv
           ds.sum(1)[:, None, None, :])                 # dbias
    # 5e-2/5e-3: the kernel's fp32 ride through the MXU's bf16 operand
    # passes differs from float64 by ~4e-3 rel on the probs (measured,
    # property-5 note); a wrong/unreplayed mask errors at O(1). dbias is
    # the softmax-grad row-sum over all Ss=128 queries — near-cancelling
    # sums accumulate that prob rounding to ~sqrt(Ss)·4e-3·|ds| absolute
    # (measured max 0.017 on O(0.02) elements), so it gets an
    # accumulation-scaled atol; still two orders below a mask error.
    for g6, rf, name, at in zip(kg, ref, ("dq", "dk", "dv", "dbias"),
                                (5e-3, 5e-3, 5e-3, 2.5e-2)):
        np.testing.assert_allclose(np.asarray(g6), rf, rtol=5e-2,
                                   atol=at, err_msg=name)
    print("PASS dropout-path VJP (dq,dk,dv,dbias) matches a float64 host "
          "reference built from the extracted realized mask")
    print("ALL PASS")


if __name__ == "__main__":
    main()
