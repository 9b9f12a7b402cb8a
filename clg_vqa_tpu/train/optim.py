"""Optimizer + LR schedule matching the reference fine-tuning recipe.

The reference uses ``pytorch_transformers.AdamW`` with
``WarmupLinearSchedule`` (volta/train_task.py:263-276) and two parameter
groups: weight-decay for everything except biases and LayerNorm params
(train_task.py:249-260). The pytorch_transformers AdamW update rule differs
from both torch.optim.AdamW and optax.adamw:

    m <- b1*m + (1-b1)*g            v <- b2*v + (1-b2)*g^2
    denom = sqrt(v) + eps           (eps OUTSIDE the sqrt)
    step_size = lr * sqrt(1-b2^t)/(1-b1^t)   (if correct_bias, t from 1)
    p <- p - step_size * m/denom
    p <- p - lr * wd * p            (decoupled decay on the UPDATED p,
                                     scaled by raw lr, not bias-corrected)

We implement exactly that as an optax GradientTransformation so training
dynamics match the reference bit-for-bit in fp32.

The per-key lr override for "vil_" parameters (train_task.py:256) is a no-op
for CLG-VQA's models (no parameter name contains "vil_"); we document rather
than reproduce it.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdamWState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def adamw_pt(learning_rate: float | Callable[[jnp.ndarray], jnp.ndarray],
             b1: float = 0.9, b2: float = 0.999, eps: float = 1e-6,
             weight_decay: float = 1e-4, correct_bias: bool = True,
             decay_mask: Any = None) -> optax.GradientTransformation:
    """pytorch_transformers-semantics AdamW.

    decay_mask: pytree of bools (True = apply weight decay), same structure
    as params. None = decay everything.
    """

    def init(params):
        return AdamWState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state, params):
        count = state.count + 1
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
        if correct_bias:
            t = count.astype(jnp.float32)
            step_size = lr * jnp.sqrt(1 - b2 ** t) / (1 - b1 ** t)
        else:
            step_size = lr

        def upd(m, v, p, decay):
            new_p = p - step_size * m / (jnp.sqrt(v) + eps)
            if weight_decay > 0:
                new_p = jnp.where(decay, new_p - lr * weight_decay * new_p, new_p)
            return new_p - p

        if decay_mask is None:
            mask = jax.tree.map(lambda _: True, params)
        else:
            mask = decay_mask
        updates = jax.tree.map(upd, mu, nu, params, mask)
        return updates, AdamWState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def warmup_linear_schedule(base_lr: float, warmup_steps: int,
                           total_steps: int) -> Callable:
    """WarmupLinearSchedule: linear 0->1 over warmup, then linear 1->0 to
    t_total. ``step`` counts completed optimizer updates (the torch LambdaLR
    applies factor(last_epoch) *before* each step, starting at 0 — so the very
    first update runs at factor(0)=0 when warmup>0, which we reproduce)."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        w = jnp.maximum(1.0, float(warmup_steps))
        rest = jnp.maximum(1.0, float(total_steps - warmup_steps))
        return base_lr * jnp.where(
            step < warmup_steps, step / w,
            jnp.maximum(0.0, (total_steps - step) / rest))

    return sched


def warmup_constant_schedule(base_lr: float, warmup_steps: int) -> Callable:
    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        w = jnp.maximum(1.0, float(warmup_steps))
        return base_lr * jnp.minimum(1.0, step / w)

    return sched


def no_decay_mask(params: Any) -> Any:
    """True where weight decay applies: excludes biases and LayerNorm
    scale/bias, matching the reference's name-substring rule
    ("bias", "LayerNorm.bias", "LayerNorm.weight"; train_task.py:249-260).
    In our pytree: any leaf named "b" under a linear, or under an "ln*" /
    "*_ln" subtree, or named scale/bias."""

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, (tuple, list)):
            # per-layer leaves (layers.unstack_layer_params): same decision
            # for every layer of the stack
            return tuple(walk(v, path) for v in tree)
        name = path[-1] if path else ""
        in_ln = any(("ln" == p or p.endswith("_ln") or p.startswith("ln"))
                    for p in path)
        is_bias = name in ("b", "bias", "scale")
        return not (is_bias or in_ln)

    return walk(params, ())


def make_optimizer(params: Any, schedule: Callable, *, b1=0.9, b2=0.999,
                   eps=1e-6, weight_decay=1e-4, correct_bias=True,
                   clip_norm: float = 1.0) -> optax.GradientTransformation:
    """Full reference chain: global-norm clip(1.0) -> AdamW(pt semantics).

    Sparse fine-tuning (CustomFromMask semantics) is realized by zeroing
    masked weights at init and multiplying gradients by the mask *before*
    this chain (see train/pruning.py) — masked weights then stay exactly 0
    through the adam update and the decoupled decay.
    """
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        adamw_pt(schedule, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
                 correct_bias=correct_bias, decay_mask=no_decay_mask(params)),
    )


def fastforward_count(opt_state: Any, step) -> Any:
    """Set every optimizer sub-state's ``count`` to ``step`` (one optimizer
    update per fused train step, so count == TrainState.step).

    Used when resuming from a params-only checkpoint (checkpoints.py
    mid_save="params"): moments restart at zero but the schedule position
    and bias-correction clock must not rewind to warmup."""
    step = jnp.asarray(step, jnp.int32)

    def fwd(s):
        # NamedTuple with a real `count` field (tuple.count is a METHOD on
        # every tuple, so hasattr(s, "count") alone would match EmptyState)
        if "count" in getattr(s, "_fields", ()):
            return s._replace(count=step)
        if isinstance(s, tuple):
            fixed = [fwd(x) for x in s]
            return (type(s)(*fixed) if hasattr(s, "_fields")
                    else tuple(fixed))
        return s

    return fwd(opt_state)


def freeze_mask(params: Any, fixed_layers: list[str]) -> Any:
    """train_utils.freeze_layers (train_utils.py:305-318) as a gradient mask:
    leaves whose "/"-joined path contains any of the ``fixed_layers``
    substrings get 0 (no update); everything else None (pass-through).
    Compose with make_train_step(grad_mask=...)."""
    if not fixed_layers:
        return None

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, (tuple, list)):
            return tuple(walk(v, path) for v in tree)
        name = "/".join(path)
        frozen = any(f in name for f in fixed_layers)
        return jnp.zeros_like(tree) if frozen else None

    return walk(params, ())


class RAdamState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def radam(learning_rate, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8, weight_decay: float = 0.0,
          decay_mask: Any = None) -> optax.GradientTransformation:
    """Rectified Adam matching volta/volta/optimization.py:9-93 (the
    reference's --optim RAdam option): variance-rectification warmup with the
    SGDM fallback when rho <= 5, L2 decay folded into the gradient step as
    ``p -= lr * wd * p`` before the adaptive update (the reference applies
    decay multiplicatively on p_data prior to addcdiv)."""
    rho_inf = 2.0 / (1.0 - b2) - 1.0

    def init(params):
        return RAdamState(count=jnp.zeros([], jnp.int32),
                          mu=jax.tree.map(jnp.zeros_like, params),
                          nu=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params):
        count = state.count + 1
        t = count.astype(jnp.float32)
        lr = learning_rate(state.count) if callable(learning_rate) \
            else learning_rate
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, grads)
        beta2_t = b2 ** t
        rho = rho_inf - 2.0 * t * beta2_t / (1.0 - beta2_t)
        rect = jnp.sqrt(((rho - 4) * (rho - 2) * rho_inf)
                        / jnp.maximum((rho_inf - 4) * (rho_inf - 2) * rho,
                                      1e-12))
        use_adaptive = rho > 5.0
        step_adapt = lr * rect * jnp.sqrt(1 - beta2_t) / (1 - b1 ** t)
        step_sgd = lr / (1 - b1 ** t)

        if decay_mask is None:
            mask = jax.tree.map(lambda _: True, params)
        else:
            mask = decay_mask

        def upd(m, v, p, dm):
            base = p
            if weight_decay > 0:
                base = jnp.where(dm, p - lr * weight_decay * p, p)
            adapt = base - step_adapt * m / (jnp.sqrt(v) + eps)
            sgd = base - step_sgd * m
            return jnp.where(use_adaptive, adapt, sgd) - p

        updates = jax.tree.map(upd, mu, nu, params, mask)
        return updates, RAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)
