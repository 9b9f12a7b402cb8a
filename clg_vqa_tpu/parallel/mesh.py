"""Device mesh + sharding layout.

Replaces the reference's entire distributed stack — NCCL process group
(train_task.py:148-159), apex ``DistributedDataParallel(delay_allreduce=True)``
(train_task.py:288-295), ``torch.nn.DataParallel`` fallback and
``DistributedSampler`` — with one ``jax.sharding.Mesh`` and GSPMD sharding
annotations. XLA emits the gradient all-reduce fused at the end of backward
(the moral equivalent of apex's delay_allreduce) and the tensor-parallel
collectives ride ICI.

Axes:
  dp — data parallel: batch dimension of every input.
  mp — model (tensor) parallel: Megatron-style column/row sharding of the
       attention and FFN projections, vocab sharding of the embedding, and
       label sharding of the classifier. At the reference's scale (281M
       params, batch 256) pure DP is optimal; mp exists for scaling and is
       exercised by the multi-chip dry-run.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: int | None = None, n_mp: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_dp is None:
        n_dp = len(devices) // n_mp
    if n_dp < 1 or n_mp < 1 or n_dp * n_mp != len(devices):
        raise ValueError(
            f"mesh dp={n_dp} x mp={n_mp} does not tile the "
            f"{len(devices)} available devices (silently dropping devices "
            f"or building an empty mesh would fail later with obscure "
            f"sharding errors)")
    devs = np.asarray(devices).reshape(n_dp, n_mp)
    return Mesh(devs, axis_names=("dp", "mp"))


def _pspec_for(path: tuple[str, ...], leaf) -> P:
    """Megatron-style layout: q/k/v/w1 column-parallel (shard output dim),
    o/w2 row-parallel (shard input dim), embeddings vocab-sharded,
    classifier label-sharded. Everything else replicated."""
    p = "/".join(path)
    if "encoder/attn" in p:
        col = any(f"/{k}/" in p + "/" for k in ("q", "k", "v"))
        if p.endswith("/w"):
            return P(None, None, "mp") if col else P(None, "mp", None)
        if p.endswith("/b"):
            return P(None, "mp") if col else P(None)
    if "ffn/w1" in p:
        return P(None, None, "mp") if p.endswith("/w") else P(None, "mp")
    if "ffn/w2" in p:
        return P(None, "mp", None) if p.endswith("/w") else P(None)
    if path[-2:] == ("embeddings", "word") or p.endswith("embeddings/word"):
        return P("mp", None)
    if "classifier/fc2" in p:
        return P(None, "mp") if p.endswith("/w") else P("mp")
    return P()


def param_pspecs(params: Any) -> Any:
    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return _pspec_for(path, tree)

    return walk(params, ())


def param_shardings(mesh: Mesh, params: Any) -> Any:
    return jax.tree.map(lambda s: NamedSharding(mesh, s), param_pspecs(params))


def batch_pspecs(batch: Any, *, microbatched: bool = False) -> Any:
    """Shard the batch (or [acc, micro_bs, ...] microbatched batch) over dp."""
    spec = P(None, "dp") if microbatched else P("dp")
    return jax.tree.map(lambda _: spec, batch)


def batch_shardings(mesh: Mesh, batch: Any, **kw) -> Any:
    return jax.tree.map(lambda s: NamedSharding(mesh, s),
                        batch_pspecs(batch, **kw))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
