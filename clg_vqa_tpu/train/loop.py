"""Jitted training/eval steps for the GQA fine-tuning recipe.

Reproduces the reference's training semantics (volta/train_task.py:313-367,
volta/volta/task_utils.py:308-434) in one compiled XLA program per step:

 - gradient accumulation: the reference divides the loss by grad_acc_steps
   and sums gradients over micro-steps (train_task.py:322-338); here the
   microbatches live in a leading axis and a ``lax.scan`` accumulates —
   no host round-trips between micro-steps.
 - loss: num_labels * (CE(logits, argmax target) + lambda * semantic prior)
   with the prior's distance rows gathered on-device from a resident
   [num_labels, num_labels] matrix (see ops/semantic_prior.py) instead of the
   reference's per-batch Python loop.
 - clip_grad_norm(1.0) -> AdamW(pytorch_transformers semantics) -> warmup
   schedule, all inside the step (train/optim.py).
 - sparse fine-tuning: an optional 0/1 mask pytree multiplies gradients
   before clipping, which with mask-zeroed initial params reproduces torch's
   ``prune.CustomFromMask`` reparametrization exactly (train_task_sft.py:44-132).
 - bf16 matmuls with fp32 master weights/optimizer state.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..ops.semantic_prior import gqa_train_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray            # completed optimizer updates


# ---------------------------------------------------------------------------
# Parameter layouts: stacked [L, ...] encoder leaves (checkpoint / eval /
# sharded layout) vs per-layer tuples (single-chip training layout).
#
# Differentiating w.r.t. stacked per-layer weights makes XLA materialize one
# full-buffer dynamic-update-slice copy per layer per microbatch when
# stacking dW (~22 ms/step at UC2 scale) — and restacking gradients inside
# the step costs another ~11 ms. Keeping the whole TrainState per-layer
# during training removes both; checkpoints stay stacked on disk
# (checkpoints.py normalizes), so the external format is unchanged.
# ---------------------------------------------------------------------------

def _has_perlayer(tree: Any) -> bool:
    from ..models.layers import _is_tuple
    enc = tree.get("encoder") if isinstance(tree, dict) else None
    if enc is None:
        return False
    return any(map(_is_tuple, jax.tree.leaves(enc, is_leaf=_is_tuple)))


def _map_opt_params(opt_state: Any, f) -> Any:
    """Apply f to the param-shaped members (mu/nu) of optimizer states."""
    from .optim import AdamWState, RAdamState
    if isinstance(opt_state, (AdamWState, RAdamState)):
        return type(opt_state)(count=opt_state.count,
                               mu=f(opt_state.mu), nu=f(opt_state.nu))
    if isinstance(opt_state, tuple):
        fixed = [_map_opt_params(x, f) for x in opt_state]
        return (type(opt_state)(*fixed) if hasattr(opt_state, "_fields")
                else tuple(fixed))
    return opt_state


def _unstack_mask_tree(mask: Any, num_layers: int) -> Any:
    """Per-layer layout for a grad-mask tree: stacked arrays under
    'encoder' become tuples of slices, None (pass-through) leaves become
    tuples of None so the structure matches per-layer gradients."""
    def walk(tree):
        if isinstance(tree, dict):
            return {k: walk(v) for k, v in tree.items()}
        if tree is None:
            return tuple([None] * num_layers)
        return tuple(tree[l] for l in range(num_layers))

    if not isinstance(mask, dict) or "encoder" not in mask:
        return mask
    out = dict(mask)
    out["encoder"] = walk(mask["encoder"])
    return out


def perlayer_state(state: TrainState, num_layers: int) -> TrainState:
    """Convert a stacked TrainState to the per-layer training layout
    (params and AdamW/RAdam mu/nu encoder leaves become tuples of L)."""
    from ..models import layers as _L

    def un(t):
        return _L.unstack_layer_params(t, num_layers)

    return TrainState(un(state.params),
                      _map_opt_params(state.opt_state, un), state.step)


def stacked_state(state: TrainState) -> TrainState:
    """Inverse of perlayer_state (idempotent on stacked states)."""
    from ..models import layers as _L
    re = _L.restack_layer_tree
    return TrainState(re(state.params),
                      _map_opt_params(state.opt_state, re), state.step)


def make_loss_fn(model_forward: Callable, cfg, distance_matrix, *,
                 semantic_lambda: float, top_k: int = 10,
                 compute_dtype=jnp.bfloat16, remat: bool = False,
                 unroll: bool = True, fused_attn: bool = False,
                 pallas_gather: bool = False,
                 criterion: str = "CrossEntropyLoss") -> Callable:
    def loss_fn(params, mb, rng, bank=None):
        # Device-resident feature bank: batches carry int32 'store_idx' and
        # the region tensors ride as JIT ARGUMENTS (never closure constants
        # — a closed-over bank ships with every axon remote-compile request,
        # HTTP 413 at X101 scale). Same helper as the eval path
        # (eval/runner.py, eval/predictor.py).
        if bank is not None and "store_idx" in mb:
            from ..data.device_bank import DeviceFeatureBank
            f, l, m = DeviceFeatureBank.gather_from(bank, mb["store_idx"],
                                                    pallas=pallas_gather)
            mb = {**{k: v for k, v in mb.items() if k != "store_idx"},
                  "features": f, "locs": l, "image_mask": m}
        # unroll=True: static-block encoder for the grad path (removes the
        # scan's residual-stacking dynamic-update-slices; see uc2.encode)
        logits = model_forward(params, cfg, mb, deterministic=rng is None,
                               rng=rng, compute_dtype=compute_dtype,
                               remat=remat, unroll=unroll,
                               **({"fused_attn": fused_attn}
                                  if fused_attn else {}))
        loss = gqa_train_loss(
            logits, mb["labels"], distance_matrix,
            semantic_lambda=semantic_lambda, top_k=top_k,
            num_labels=cfg.num_labels, criterion=criterion)
        score = jnp.mean((jnp.argmax(logits, -1) == mb["labels"])
                         .astype(jnp.float32))
        return loss, score

    return loss_fn


def make_train_step(model_forward: Callable, cfg, optimizer, distance_matrix,
                    *, semantic_lambda: float, top_k: int = 10,
                    compute_dtype=jnp.bfloat16,
                    grad_mask: Any = None,
                    use_dropout: bool = True,
                    remat: bool = False,
                    unroll: bool = True,
                    unroll_accum: bool = False,
                    fused_attn=False,
                    pallas_gather: bool = False,
                    criterion: str = "CrossEntropyLoss") -> Callable:
    """Returns train_step(state, batch, rng, bank=None, grad_mask_rt=None)
    -> (state, metrics).

    fused_attn: False = XLA attention; True = Pallas custom-VJP kernel
    (flat [B,S,D] boundary); "hm" = same kernel fed head-major (projections
    emit [B,H,S,hd] directly — see layers.multi_head_attention).

    ``batch`` leaves are shaped [grad_acc, micro_bs, ...]. With a device
    feature bank, batches carry int32 'store_idx' instead of features and
    ``bank`` = DeviceFeatureBank.tensors() rides as a jit argument; the
    region tensors are gathered from HBM inside the step (zero per-step
    feature H2D traffic).

    Gradient masks (SFT / IMP / freeze) come in two forms:
      - ``grad_mask`` (make-time): baked into the program as constants.
        Convenient for tests/small models; at full scale the mask is
        ~340 MB of constants that ship with every remote-compile request.
      - ``grad_mask_rt`` (runtime argument, preferred): same semantics, no
        constants, and recipes that change the mask (IMP re-prunes every
        epoch) reuse ONE compiled program. The caller must supply it in the
        layout gradients have at application time — i.e. matching
        ``state.params`` (per-layer when the state is per-layer;
        driver._runtime_mask does this).

    unroll: static-block encoder on the grad path (see uc2.encode) — big win,
    memory-neutral. unroll_accum: additionally unroll the accumulation scan;
    ~3% more throughput on UC2 but lets XLA interleave microbatches, which
    can exceed HBM at longer sequences (M3P S=140 OOMs) — opt in per recipe.
    """
    loss_fn = make_loss_fn(model_forward, cfg, distance_matrix,
                           semantic_lambda=semantic_lambda, top_k=top_k,
                           compute_dtype=compute_dtype, remat=remat,
                           unroll=unroll, fused_attn=fused_attn,
                           pallas_gather=pallas_gather,
                           criterion=criterion)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, batch, rng, bank=None,
                   grad_mask_rt=None, step_index=None):
        # step_index (int32 scalar arg): fold the per-step dropout key
        # INSIDE the program. The host-side eager fold_in alternative costs
        # a separate device dispatch per step — a full round trip on a
        # tunneled chip (~15% of integrated throughput, measured in the
        # full-scale rehearsal).
        if step_index is not None:
            rng = jax.random.fold_in(rng, step_index)
        # NOTE the in-step bank gather costs M3P ~17 ms/step vs resident
        # features (268.7 vs 251.4 ms same-day — the whole 6% "integrated
        # gap"); three formulations measured identical (per-microbatch
        # gather here, a hoisted one-gather-per-step variant, a one-hot
        # MXU matmul), so the cost is XLA's layout for device-PRODUCED
        # features, not the gather op. Documented negative result —
        # docs/PERFORMANCE.md round 4 — kept per-microbatch for the lower
        # peak memory.
        acc = jax.tree.leaves(batch)[0].shape[0]
        rngs = jax.random.split(rng, acc) if use_dropout else None

        # Differentiate w.r.t. PER-LAYER encoder leaves on the unrolled
        # path: grads of stacked [L, ...] weights cost one full-buffer
        # dynamic-update-slice copy per layer per microbatch (~22 ms/step
        # at UC2 scale, measured); per-layer leaves make each dW an
        # independent output. A state already in the per-layer layout
        # (perlayer_state) runs conversion-free end to end; a stacked state
        # is unstacked here and its grads restacked before the optimizer so
        # the external layout is unchanged.
        from ..models import layers as _L
        nL = getattr(cfg, "num_layers", 0)
        perlayer_in = _has_perlayer(state.params)
        unstack_here = unroll and not perlayer_in
        params_w = (_L.unstack_layer_params(state.params, nL)
                    if unstack_here else state.params)
        # grad_mask in the layout the grads will have at application time
        # (post-restack for a stacked state, i.e. as given). A runtime mask
        # takes precedence and must already match (see docstring).
        if grad_mask_rt is not None:
            mask_w = grad_mask_rt
        else:
            mask_w = grad_mask
            if grad_mask is not None and perlayer_in \
                    and not _has_perlayer(grad_mask):
                mask_w = _unstack_mask_tree(grad_mask, nL)

        def micro(carry, xs):
            g_acc, l_acc, s_acc = carry
            mb, r = xs
            (loss, score), grads = grad_fn(params_w, mb,
                                           r if use_dropout else None, bank)
            g_acc = jax.tree.map(lambda a, g: a + g / acc, g_acc, grads)
            return (g_acc, l_acc + loss / acc, s_acc + score / acc), None

        zero = jax.tree.map(jnp.zeros_like, params_w)
        xs = (batch, rngs) if use_dropout else (batch, jnp.zeros((acc,)))
        (grads, loss, score), _ = jax.lax.scan(
            micro, (zero, jnp.zeros(()), jnp.zeros(())), xs,
            unroll=acc if unroll_accum else 1)
        if unstack_here:
            grads = _L.restack_layer_tree(grads)

        if mask_w is not None:
            grads = jax.tree.map(
                lambda g, m: g * m if m is not None else g, grads, mask_w,
                is_leaf=lambda x: x is None)

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        if mask_w is not None:
            # masked entries must not move at all: the decoupled weight decay
            # would otherwise still shrink them (torch freeze /
            # CustomFromMask exclude them from the optimizer entirely)
            updates = jax.tree.map(
                lambda u, m: u * m if m is not None else u, updates,
                mask_w, is_leaf=lambda x: x is None)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "score": score,
                   "grad_norm": optax.global_norm(grads)}
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_eval_step(model_forward: Callable, cfg, *,
                   compute_dtype=jnp.bfloat16,
                   fused_attn: bool = False) -> Callable:
    """ForwardModelsVal for VL-classifier-GQA (task_utils.py:265-269):
    loss = num_labels * CE, score = #correct (weights by mask for padded
    tail batches).

    Accuracy denominator note: the reference divides by ALL samples
    (out-of-vocab answers score 0 but count); we divide by LABELED
    samples like eval/runner. Since the labeled count is a fixed property
    of the split, epoch-over-epoch ranking (best-checkpoint selection)
    is identical — only the printed scale differs when a split contains
    out-of-vocab answers.

    fused_attn: Pallas attention for the validation forward — same
    trade-off as eval/runner.make_predict_step (wins at bs>=512 on TPU).

    Batches may carry 'store_idx' instead of features; the device bank
    tensors then ride the call as the `bank` jit ARGUMENT (same contract
    as make_train_step / make_predict_step — never closure constants, and
    cached val batches stay index-sized instead of duplicating the bank's
    gathered features in HBM)."""

    def eval_step(params, batch, bank=None):
        if bank is not None:
            from ..data.device_bank import DeviceFeatureBank
            batch = dict(batch)
            f, l, m = DeviceFeatureBank.gather_from(
                bank, batch.pop("store_idx"))
            batch = {**batch, "features": f, "locs": l, "image_mask": m}
        kw = {"fused_attn": fused_attn} if fused_attn else {}
        logits = model_forward(params, cfg, batch, deterministic=True,
                               compute_dtype=compute_dtype, **kw)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        ce = -jnp.take_along_axis(logp, batch["labels"][:, None], -1)[:, 0]
        valid = batch.get("valid",
                          jnp.ones_like(batch["labels"], jnp.float32))
        # score/loss only over LABELED rows: entries whose answer is
        # outside the 1842 vocab carry labels=0/has_label=0 and must not
        # count argmax==0 as correct (same masking as eval/runner.py)
        lab = valid * batch.get("has_label", jnp.ones_like(valid))
        n = jnp.maximum(jnp.sum(lab), 1.0)
        loss = cfg.num_labels * jnp.sum(ce * lab) / n
        correct = jnp.sum(
            (jnp.argmax(logits, -1) == batch["labels"]).astype(jnp.float32)
            * lab)
        return {"loss": loss, "correct": correct, "count": jnp.sum(lab),
                "pred": jnp.argmax(logits, -1)}

    return eval_step


# ---------------------------------------------------------------------------
# Sharded (multi-chip) wiring
# ---------------------------------------------------------------------------

def shard_train_step(train_step: Callable, mesh, state: TrainState,
                     batch_example, *, donate: bool = True,
                     with_bank: bool = False) -> Callable:
    """jit the train step over a (dp, mp) mesh with explicit in/out shardings.
    XLA inserts the dp gradient all-reduce and mp collectives automatically.

    with_bank: the step additionally takes DeviceFeatureBank.tensors() as a
    4th argument (replicated — every dp shard gathers its own rows).

    Steps built with ``fused_attn="flat"`` are fully supported: the flat
    Pallas kernels shard_map themselves over the mesh (batch on dp, the
    in-kernel head loop on Megatron-mp head groups) whenever the returned
    step is called/lowered — see ops/attention.gspmd_attention. Other
    kernel variants (blocked/hm/proj/sm are single-chip opt-ins) and
    ``pallas_gather`` still require the XLA path under a mesh."""
    from ..parallel import mesh as pm

    # params get the (dp-replicated, mp-sharded) layout; optimizer mu/nu
    # mirror it; everything else is replicated.
    state_sh = _shard_opt_state_like(mesh, state)
    batch_sh = pm.batch_shardings(mesh, batch_example, microbatched=True)
    rng_sh = pm.replicated(mesh)
    in_sh = (state_sh, batch_sh, rng_sh)
    if with_bank:
        in_sh = in_sh + ((pm.replicated(mesh),) * 3,)
    # jit a FRESH closure, not train_step itself: jaxpr tracing is cached
    # globally on (function identity, avals) and is sharding-independent, so
    # jitting the same step object a single-device caller already traced
    # would replay that trace — without the gspmd_attention shard_map wrap
    # the flat Pallas kernels apply under a mesh (ops/attention.py).
    def _sharded_step(*args):
        return train_step(*args)

    jitted = jax.jit(_sharded_step,
                     in_shardings=in_sh,
                     out_shardings=(state_sh, pm.replicated(mesh)),
                     donate_argnums=(0,) if donate else ())
    return _GspmdAttnStep(jitted, mesh)


class _GspmdAttnStep:
    """Proxy over a sharded jitted step that enters
    ops.attention.gspmd_attention(mesh) around call/lower, so any flat
    Pallas attention inside the step is traced with its shard_map wrap.
    Everything else (cost_analysis, clear_cache, ...) delegates."""

    def __init__(self, jitted, mesh):
        self._jitted, self._mesh = jitted, mesh

    def __call__(self, *args, **kw):
        from ..ops.attention import gspmd_attention
        with gspmd_attention(self._mesh):
            return self._jitted(*args, **kw)

    def lower(self, *args, **kw):
        from ..ops.attention import gspmd_attention
        with gspmd_attention(self._mesh):
            return self._jitted.lower(*args, **kw)

    def __getattr__(self, name):
        return getattr(self._jitted, name)


def _shard_opt_state_like(mesh, state: TrainState) -> TrainState:
    """Build the full TrainState sharding tree; AdamW mu/nu get the same
    layout as their params."""
    from ..parallel import mesh as pm
    from .optim import AdamWState, RAdamState

    p_sh = pm.param_shardings(mesh, state.params)

    def fix(os):
        if isinstance(os, (AdamWState, RAdamState)):
            # BOTH moment states mirror the param layout — a replicated
            # fallback would hold 2x model size of fp32 moments per chip
            # and reshard every step under mp
            return type(os)(count=pm.replicated(mesh), mu=p_sh, nu=p_sh)
        if isinstance(os, tuple):
            fixed = [fix(x) for x in os]
            # preserve NamedTuple types (optax EmptyState etc.)
            return type(os)(*fixed) if hasattr(os, "_fields") else tuple(fixed)
        return jax.tree.map(lambda _: pm.replicated(mesh), os)

    return TrainState(params=p_sh, opt_state=fix(state.opt_state),
                      step=pm.replicated(mesh))
