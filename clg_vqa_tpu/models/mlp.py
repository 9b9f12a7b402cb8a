"""Small MLP probe head (volta/volta/mlp.py:6-49 parity: Linear -> activation
-> dropout stack, unused on the main CLG-VQA path but part of the model
zoo)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L


def init_mlp(rng, dims: list[int]) -> list:
    ks = jax.random.split(rng, len(dims) - 1)
    return [L.init_linear_xavier(k, dims[i], dims[i + 1])
            for i, k in enumerate(ks)]


def mlp(params: list, x: jnp.ndarray, *, dropout_prob: float = 0.0,
        rng=None, deterministic: bool = True,
        act=jax.nn.relu) -> jnp.ndarray:
    for i, p in enumerate(params):
        x = L.linear(x, p)
        if i < len(params) - 1:
            x = act(x)
            if not deterministic:
                x = L.dropout(x, dropout_prob,
                              jax.random.fold_in(rng, i), deterministic)
    return x
