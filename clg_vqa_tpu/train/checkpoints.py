"""Checkpoint save/resume — the reference's train_utils.py:351-510 flow with
orbax-backed pytree storage.

Reference artifacts and our equivalents:
  pytorch_model_{ep}.bin     -> {dir}/params_ep{ep}/          (params only)
  pytorch_model_best.bin     -> {dir}/params_best/
  pytorch_ckpt_latest.tar    -> {dir}/state_e{E}_s{S}/ + meta.json (params,
        optimizer state, step, epoch, best score, metric-logger state;
        meta.json's "state_dir" points at the live dir — saves write a
        fresh dir then swap the pointer atomically, see save_state)
  mask_lt{ep}.pt / mask_best.pt -> masks saved by train/pruning.py (npz)

The reference additionally exports a torch-loadable state dict; we provide
that via utils/convert.pytree_to_volta_* + export_torch_bin so reference
tooling can consume fine-tuned weights.
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from .loop import TrainState, stacked_state


def _path(d: str, name: str) -> str:
    return os.path.abspath(os.path.join(d, name))


def _stacked(params: Any) -> Any:
    """Normalize per-layer training-layout params (loop.perlayer_state) back
    to the stacked on-disk layout; no-op on stacked trees."""
    from ..models.layers import restack_layer_tree
    return restack_layer_tree(params) if isinstance(params, dict) else params


def _fetch(tree: Any) -> Any:
    """One explicit device->host pass BEFORE orbax sees the tree: keeps the
    (slow, occasionally flaky on a tunneled chip) transfer separate from
    orbax's own async machinery and makes save latency attributable."""
    import sys
    import time
    t0 = time.time()
    host = jax.tree.map(np.asarray, tree)
    dt = time.time() - t0
    if dt > 5.0:
        nb = sum(a.nbytes for a in jax.tree.leaves(host)) / 1e9
        print(f"[ckpt] fetched {nb:.2f} GB in {dt:.0f}s "
              f"({nb * 1e3 / max(dt, 1e-9):.0f} MB/s)", file=sys.stderr)
    return host


def save_params(ckpt_dir: str, name: str, params: Any) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.PyTreeCheckpointer() as c:
        c.save(_path(ckpt_dir, name), _fetch(_stacked(params)), force=True)


def load_params(ckpt_dir: str, name: str, like: Any | None = None) -> Any:
    with ocp.PyTreeCheckpointer() as c:
        if like is not None:
            return c.restore(_path(ckpt_dir, name),
                             args=ocp.args.PyTreeRestore(like))
        return c.restore(_path(ckpt_dir, name))


def save_state(ckpt_dir: str, state: TrainState, *, epoch: int,
               best_score: float, extra: dict | None = None,
               params_only: bool = False) -> None:
    """Crash-safe resume checkpoint: the new state is written under a
    FRESH directory name, the meta.json pointer is swapped atomically
    (os.replace), and only then is the superseded state deleted — a hard
    kill at any point leaves either the old or the new (state, meta) pair
    intact. The previous in-place overwrite of state_latest destroyed the
    only resume checkpoint if the process died mid-save.

    params_only=True writes a CHEAP resume point: params + step, no
    optimizer moments — 1/3 of the full-state device fetch, which is the
    documented 25-55% epoch tax of overlapped saves on a tunneled chip
    (docs/PERFORMANCE.md). Resuming from it reinitializes moments (the
    schedule/bias-correction clock is fast-forwarded, see resume_state);
    this mirrors the reference's split of cheap per-epoch weight files
    from the full resume tar (train_utils.py:351-372)."""
    import shutil
    os.makedirs(ckpt_dir, exist_ok=True)
    state = stacked_state(state)      # on-disk layout is always stacked
    tree = {"params": state.params, "step": state.step}
    if not params_only:
        tree["opt_state"] = state.opt_state
    host = _fetch(tree)
    meta_path = os.path.join(ckpt_dir, "meta.json")
    prev = None
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                prev = json.load(f).get("state_dir", "state_latest")
        except Exception:
            prev = None
    name = f"state_e{epoch}_s{int(state.step)}"
    if prev == name:                  # never rewrite the live pointer target
        name += "b"
    target = _path(ckpt_dir, name)
    if os.path.exists(target):        # stale partial from an earlier crash
        shutil.rmtree(target)
    with ocp.PyTreeCheckpointer() as c:
        c.save(target, host, force=True)
    meta = {"epoch": epoch, "best_score": best_score,
            "step": int(state.step), "state_dir": name,
            **({"params_only": True} if params_only else {}),
            **(extra or {})}
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)
    if prev and prev != name:
        shutil.rmtree(_path(ckpt_dir, prev), ignore_errors=True)


def resume_state(ckpt_dir: str, like: TrainState) -> tuple[TrainState, dict]:
    """Restore (state, meta). Raises FileNotFoundError if absent.

    A params-only checkpoint (save_state(params_only=True)) restores params
    + step; the optimizer state is `like`'s (fresh moments) with the count
    fast-forwarded to step, so the lr schedule and bias-correction clock
    continue instead of rewinding into warmup. meta["params_only"] tells the
    caller the resume is cheap-mode (not bit-exact vs uninterrupted)."""
    meta_path = os.path.join(ckpt_dir, "meta.json")
    if not os.path.exists(meta_path):
        raise FileNotFoundError(meta_path)
    with open(meta_path) as f:
        meta = json.load(f)
    params_only = bool(meta.get("params_only"))
    tmpl = {"params": like.params, "step": like.step}
    if not params_only:
        tmpl["opt_state"] = like.opt_state
    with ocp.PyTreeCheckpointer() as c:
        restored = c.restore(
            _path(ckpt_dir, meta.get("state_dir", "state_latest")),
            args=ocp.args.PyTreeRestore(tmpl))
    if params_only:
        from .optim import fastforward_count
        opt_state = fastforward_count(like.opt_state, restored["step"])
    else:
        opt_state = restored["opt_state"]
    state = TrainState(params=restored["params"], opt_state=opt_state,
                       step=restored["step"])
    return state, meta


class AsyncSaver:
    """Background checkpoint writer — keeps the (slow) device fetch + disk
    write out of the training critical path.

    The reference checkpoints synchronously every epoch
    (train_utils.py:351-372), which on this environment's tunneled chip
    costs minutes of D2H per save. Here a save first SNAPSHOTS the tree
    with on-device copies (fast, and donation-safe: the live state's
    buffers are donated to the next step, so a background thread must
    never read them), then a daemon thread fetches and writes while
    training continues. Saves are serialized: submitting while one is in
    flight waits for it first; call wait() before process exit or a
    synchronous (preemption) save.
    """

    def __init__(self):
        import threading
        self._threading = threading
        self._thread = None
        self._error: BaseException | None = None

    def _snapshot(self, tree: Any) -> Any:
        import jax.numpy as jnp
        return jax.tree.map(jnp.copy, tree)

    def _submit(self, fn) -> None:
        # wait() re-raises a previous save's failure here, so a dead disk
        # (or orbax error) surfaces in the training loop instead of being
        # swallowed by the daemon thread
        self.wait()

        def run():
            try:
                fn()
            except BaseException as e:          # noqa: BLE001 — re-raised
                self._error = e

        t = self._threading.Thread(target=run, daemon=True)
        t.start()
        self._thread = t

    def save_state(self, ckpt_dir: str, state: TrainState, *, epoch: int,
                   best_score: float, extra: dict | None = None,
                   params_only: bool = False) -> None:
        snap = self._snapshot(
            state._replace(opt_state=None) if params_only else state)
        self._submit(lambda: save_state(ckpt_dir, snap, epoch=epoch,
                                        best_score=best_score, extra=extra,
                                        params_only=params_only))

    def save_params(self, ckpt_dir: str, name: str, params: Any) -> None:
        snap = self._snapshot(params)
        self._submit(lambda: save_params(ckpt_dir, name, snap))

    def export_torch_bin(self, path: str, params: Any,
                         model: str = "uc2") -> None:
        snap = self._snapshot(params)
        self._submit(lambda: export_torch_bin(path, snap, model))

    def wait(self) -> None:
        """Join the in-flight save; re-raise its failure if it had one."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            e, self._error = self._error, None
            raise RuntimeError("async checkpoint save failed") from e


def export_torch_bin(path: str, params: Any, model: str = "uc2",
                     task_key: str = "TASK15") -> None:
    """Write a torch-loadable .bin with VOLTA parameter names so reference
    tooling (eval_task.py etc.) can consume our fine-tuned weights."""
    from ..utils.convert import pytree_to_volta_m3p, pytree_to_volta_uc2
    to_sd = pytree_to_volta_uc2 if model == "uc2" else pytree_to_volta_m3p
    sd = to_sd(jax.tree.map(np.asarray, _stacked(params)), task_key)
    try:
        import torch
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()}, path)
    except ImportError:
        np.savez_compressed(path + ".npz", **sd)
