"""High-level fine-tuning driver — the reference's entry-point flows
(train_task.py:141-389, train_task_prunning.py:548-877,
train_task_sft.py:331-612) orchestrated over the jitted step functions.

Three recipes:
  finetune()  — GQA fine-tune with semantic prior (+ CDM if the task config
                enables code_mixing); per-epoch val, best-checkpoint keeping.
  imp_prune() — per-epoch: train -> global L1 prune 10% of survivors ->
                eval -> save mask -> rewind weights to theta_0 and rebuild
                optimizer/schedule from scratch.
  sft()       — load mask_best, zero masked weights, train with masked
                gradients; exports collapsed weights.
"""
from __future__ import annotations

import os
import signal
import sys
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OptimConfig, TaskConfig
from ..utils.logging import MetricsLogger
from . import checkpoints as ckpt
from . import pruning as pr
from .loop import TrainState, make_eval_step, make_train_step
from .optim import make_optimizer, warmup_linear_schedule


class FinetuneRunner:
    def __init__(self, model_forward: Callable, cfg, params0: Any,
                 train_pipeline, val_dataset, distance_matrix, *,
                 task_cfg: TaskConfig, optim_cfg: OptimConfig,
                 output_dir: str, model_name: str = "uc2",
                 compute_dtype=jnp.bfloat16, seed: int = 0,
                 eval_batch_size: int | None = None,
                 eval_steps: int | None = None,
                 train_bank=None, async_ckpt: bool = True,
                 save_every: int = 1, mid_save: str = "none",
                 fused_attn: str = "auto"):
        self.fwd = model_forward
        self.cfg = cfg
        self.params0 = params0
        self.pipe = train_pipeline
        self.val_ds = val_dataset
        self.D = (jnp.asarray(distance_matrix)
                  if distance_matrix is not None else
                  jnp.zeros((cfg.num_labels, cfg.num_labels), jnp.float32))
        self.task_cfg = task_cfg
        self.optim_cfg = optim_cfg
        self.out = output_dir
        self.model_name = model_name
        self.compute_dtype = compute_dtype
        self.seed = seed
        self.eval_bs = eval_batch_size or task_cfg.eval_batch_size
        self.eval_steps = eval_steps      # mid-epoch eval cadence (optional)
        # HBM-direct training: when the train store fits HBM its processed
        # tensors live on device and the pipeline feeds only token ids +
        # store_idx; the bank rides the jitted step as ARGUMENTS (the same
        # contract as the eval path — never closure constants, which would
        # ship with every axon remote-compile request).
        self.train_bank = train_bank
        self._bank_tensors = train_bank.tensors() if train_bank is not None \
            else None
        # end-of-epoch checkpoints go through a background writer so the
        # device fetch + disk write overlap the next epoch's compute
        # (ckpt.AsyncSaver; preemption saves stay synchronous)
        self._saver = ckpt.AsyncSaver() if async_ckpt else None
        # resume-checkpoint cadence (state_latest): every N epochs + always
        # the final epoch. 1 == reference parity (train_utils.py:351); larger
        # values trade crash-resume granularity for epoch wall time where
        # the full-state fetch is expensive (tunneled single-chip dev envs).
        # best-params saves and preemption saves are unaffected.
        self.save_every = max(int(save_every), 1)
        # cheap resume points for the epochs save_every skips: "params"
        # writes params+step only (1/3 of the full-state device fetch — the
        # documented 25-55% overlapped-save epoch tax); resuming from one
        # reinitializes optimizer moments with the schedule clock fast-
        # forwarded (checkpoints.resume_state). Mirrors the reference's
        # cheap per-epoch weight files vs the full resume tar
        # (train_utils.py:351-372). "none" = current behavior.
        if mid_save not in ("none", "params"):
            raise ValueError(f"mid_save must be 'none' or 'params', "
                             f"got {mid_save!r}")
        self.mid_save = mid_save
        os.makedirs(output_dir, exist_ok=True)
        self.logger = MetricsLogger(output_dir, task_cfg.name)
        self._val_bank = None
        self._val_cache = None
        self._lr_table = None             # filled by _build_opt
        if val_dataset is not None:
            try:
                from ..cli.common import maybe_device_bank
                self._val_bank = maybe_device_bank(val_dataset, cfg, task_cfg)
            except Exception as e:
                # Loud fallback: a broken bank (OOM, malformed store) degrades
                # every epoch's eval to the slow per-batch upload path — say so
                # instead of silently eating the epoch-time regression.
                self._val_bank = None
                print(f"WARNING: val device bank unavailable "
                      f"({type(e).__name__}: {e}); eval falls back to "
                      f"per-batch host feature upload", file=sys.stderr)
        # preemption handling (absent in the reference, SURVEY.md §5): on
        # SIGTERM/SIGINT finish the current step, checkpoint, then exit
        self._preempted = False
        # recipe-specific context merged into the mid-epoch preemption save
        # (imp_prune stores its round/mask/history cursor here so a resumed
        # prune re-enters the exact round and step)
        self._preempt_extra: dict | None = None
        # test seam: called with the absolute step index after each dispatch
        self._step_callback = None
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, self._on_preempt)
            except ValueError:
                pass        # non-main thread (e.g. under test runners)
        fused = ("flat" if (compute_dtype == jnp.bfloat16
                            and self.eval_bs >= 512
                            and jax.default_backend() == "tpu") else False)
        self.eval_step = jax.jit(make_eval_step(
            model_forward, cfg, compute_dtype=compute_dtype,
            fused_attn=fused))
        # Pallas custom-VJP train attention (ops/attention.py): the
        # flat-boundary kernel (heads looped in-kernel over lane slices, no
        # split/merge transposes anywhere) is the default for BOTH recipes
        # in bf16 on TPU — same-day A/Bs vs the XLA path: M3P 253.5 ->
        # 213.7 ms/step (+18.6%), UC2 130.0 -> 124.2 (+4.7%)
        # (docs/PERFORMANCE.md round 4). `on` forces the same kernel off-
        # policy; fp32 parity mode and non-TPU backends keep XLA.
        if fused_attn not in ("auto", "on", "off", "flat", "proj", "sm"):
            raise ValueError(f"fused_attn must be auto/on/off/flat/proj/sm, "
                             f"got {fused_attn!r}")
        kernel_ok = (compute_dtype == jnp.bfloat16
                     and jax.default_backend() == "tpu")
        if fused_attn in ("flat", "proj", "sm"):
            # force a specific kernel (A/B and debugging; proj additionally
            # fuses the q/k/v/o projections into the Pallas block; sm cuts
            # the boundary S-major so the per-layer layout copies fold —
            # ops/attention.fused_attention_block / _train_smajor)
            self.train_fused = fused_attn
        else:
            self.train_fused = "flat" if (fused_attn == "on" or (
                fused_attn == "auto" and kernel_ok)) else False

    def _on_preempt(self, signum, frame):
        self._preempted = True

    # -- plumbing ---------------------------------------------------------

    def _total_steps(self) -> int:
        """Schedule HORIZON, not the trained step count: the reference
        sizes the lr schedule by optim_train_epochs (default 20) while
        training num_epoch (train_task.py:271-274) — a 5-epoch recipe
        warms up for 2 epochs and ends at ~0.83x base lr, never 0."""
        return self.pipe.steps_per_epoch() * self.optim_cfg.optim_train_epochs

    def _build_opt(self):
        oc = self.optim_cfg
        total = max(self._total_steps(), 1)
        warmup = int(oc.warmup_proportion * total)
        if oc.lr_scheduler == "warmup_linear":
            sched = warmup_linear_schedule(self.task_cfg.lr, warmup, total)
        else:
            # any other value -> WarmupConstantSchedule, the reference's
            # else-branch (train_task.py:273-276)
            from .optim import warmup_constant_schedule
            sched = warmup_constant_schedule(self.task_cfg.lr, warmup)
        # host-side lr table for metrics logging (one vectorized device
        # eval at build time; per-step schedule calls would each pay a
        # dispatch round trip on a tunneled chip)
        n = max(self.pipe.steps_per_epoch() * self.task_cfg.num_epoch, 1)
        self._lr_table = np.asarray(jax.jit(jax.vmap(sched))(
            jnp.arange(n + 1)))
        # decay mask built in the per-layer layout — update() runs on
        # perlayer_state states (init() is layout-agnostic)
        from ..models.layers import unstack_layer_params
        params_like = unstack_layer_params(self.params0,
                                           getattr(self.cfg, "num_layers", 0))
        return make_optimizer(params_like, sched, b1=oc.adam_betas[0],
                              b2=oc.adam_betas[1], eps=oc.adam_epsilon,
                              weight_decay=oc.weight_decay,
                              correct_bias=oc.correct_bias,
                              clip_norm=oc.clip_grad_norm)

    def _lr_of(self, step: int) -> float:
        """Scheduled lr at optimizer step `step` (for metrics/TB logging,
        the reference logs param_groups[0]['lr'], train_task.py:341)."""
        t = self._lr_table
        if t is None:
            return float(self.task_cfg.lr)
        return float(t[min(step, len(t) - 1)])

    def _perlayer(self, state: TrainState) -> TrainState:
        from .loop import perlayer_state
        return perlayer_state(state, getattr(self.cfg, "num_layers", 0))

    def _make_step(self, opt):
        return jax.jit(make_train_step(
            self.fwd, self.cfg, opt, self.D,
            semantic_lambda=self.task_cfg.semantic_lambda,
            top_k=self.task_cfg.semantic_top_k,
            compute_dtype=self.compute_dtype,
            fused_attn=self.train_fused,
            criterion=self.task_cfg.loss),
            donate_argnums=(0,))

    def _runtime_mask(self, mask):
        """Grad-mask pytree as a RUNTIME step argument in the per-layer
        training layout. Never a closure constant: a full-scale mask is
        ~340 MB that would ship with every remote-compile request (the same
        landmine as feature banks), and threading it lets every prune round
        and the SFT recipe share ONE compiled step program."""
        from .loop import _unstack_mask_tree
        gm = pr.grad_mask_tree(mask)
        return _unstack_mask_tree(gm, getattr(self.cfg, "num_layers", 0))

    def _val_batches(self):
        """Device-resident validation batches, assembled ONCE and reused
        every eval pass: the val split is static, so tokenization/batch
        assembly (the host-bound part of eval) is paid on the first epoch
        only. With the device bank a cached batch is just token arrays +
        store_idx + labels (a few MB): the feature gather happens INSIDE
        the jitted eval step from the bank tensors (one bank copy in HBM;
        caching gathered features would duplicate ~300 MB per bs-1024
        batch)."""
        if self._val_cache is not None:
            return self._val_cache
        bank = self._val_bank
        cache = []
        for b in self.val_ds.iter_batches(self.eval_bs,
                                          with_features=bank is None):
            b.pop("question_id", None)
            # has_label stays: out-of-vocab answers (labels=[]) must not
            # score as "correct when argmax==0" (eval/runner masks the
            # same way)
            cache.append(jax.device_put(
                {k: jnp.asarray(v) for k, v in b.items()}))
        self._val_cache = cache
        return cache

    def evaluate(self, params, epoch: int) -> float:
        if self.val_ds is None:
            return 0.0
        # Keep 2 eval batches in flight (async dispatch); only the metric
        # fetch of the oldest batch blocks. The reference eval loop is
        # synchronous.
        from collections import deque
        inflight: deque = deque()

        def consume(m):
            self.logger.step_val(float(m["loss"]), float(m["correct"]),
                                 float(m["count"]))

        vbank = (self._val_bank.tensors() if self._val_bank is not None
                 else None)
        for b in self._val_batches():
            inflight.append(self.eval_step(params, b, vbank))
            if len(inflight) > 2:
                consume(inflight.popleft())
        while inflight:
            consume(inflight.popleft())
        return self.logger.show_val(epoch)

    def _train_epoch(self, state, step_fn, epoch, *, log_every=20,
                     start_step=0, best=-1.0, grad_mask=None,
                     on_best=None, lr_step_base: int = 0):
        """Returns (state, best). A mid-epoch eval (eval_steps cadence)
        that improves on `best` updates it and calls on_best(state) — the
        reference saves its best checkpoint mid-epoch too
        (train_task.py:349-356)."""
        # rbg PRNG: much cheaper dropout-bit generation on TPU than the
        # default threefry (no parity requirement — the reference's dropout
        # stream is torch RNG anyway). Keyed by (seed, epoch) and folded by
        # the ABSOLUTE step index, so a mid-epoch resume replays the exact
        # dropout stream of an uninterrupted run.
        import time
        from collections import deque
        rng = jax.random.key(self.seed * 1000 + epoch, impl="rbg")
        it = self.pipe.epoch(epoch, start_step=start_step)
        # Metric fetches are deferred and drained in BULK every `log_every`
        # steps (one device_get round trip per drain): on the tunneled chip
        # each scalar fetch costs a full host<->device round trip, and
        # per-step fetching alone cost ~15% of integrated throughput
        # (docs/PERFORMANCE.md round-3 integrated numbers). The reference's
        # loop is synchronous per step.
        inflight: deque = deque()

        def drain_all():
            if not inflight:
                return
            chunk = list(inflight)
            inflight.clear()
            fetched = jax.device_get([m for _, m in chunk])
            for (j, _), m in zip(chunk, fetched):
                # lr table is indexed by the OPTIMIZER step count, which
                # persists across epochs (lr_step_base); `j` alone would
                # re-log the warmup ramp every epoch
                self.logger.step_train(epoch, float(m["loss"]),
                                       float(m["score"]),
                                       self._lr_of(lr_step_base + j))
            if log_every:
                self.logger.show_train(epoch)

        t0 = None
        n_done = 0
        for i, batch in enumerate(it, start=start_step):
            # absolute step index rides the call as an int32 scalar; the
            # fold_in happens inside the program (see loop.make_train_step)
            state, m = step_fn(state, batch, rng,
                               self._bank_tensors, grad_mask, np.int32(i))
            if t0 is None:
                jax.block_until_ready(m["loss"])   # first step = compile
                t0 = time.time()
            else:
                n_done += 1
            inflight.append((i, m))
            if self._step_callback is not None:
                self._step_callback(i)
            if len(inflight) >= (log_every or 20):
                drain_all()
            if (self.eval_steps and (i + 1) % self.eval_steps == 0
                    and self.val_ds is not None):
                score = self.evaluate(state.params, epoch)
                if score > best:
                    best = score
                    if on_best is not None:
                        on_best(state)
            if self._preempted:
                # Step-granular preemption checkpoint (beyond the reference's
                # epoch-granular resume, train_utils.py:488-510): meta records
                # (epoch, completed steps); the pipeline order is a pure
                # function of (seed, epoch), so resume skips exactly the
                # completed prefix and the final state is bit-identical to an
                # uninterrupted run (tests/test_preemption_resume.py).
                drain_all()     # flush in-flight metrics into the logger
                                # so its checkpointed state covers step i
                if self._saver is not None:
                    self._saver.wait()
                ckpt.save_state(self.out, state, epoch=epoch,
                                best_score=best,
                                extra={"logger": self.logger.state_dict(),
                                       "mid_epoch_step": i + 1,
                                       **(self._preempt_extra or {})})
                raise SystemExit(
                    f"preempted at epoch {epoch} step {i + 1}: "
                    f"state checkpointed to {self.out}")
        if inflight:
            jax.block_until_ready(inflight[-1][1]["loss"])
        dt = time.time() - t0 if t0 is not None else 0.0
        drain_all()
        if n_done > 0 and dt > 0:
            # integrated sustained throughput: real pipeline feeding the
            # device, steady state (first/compile step excluded)
            qa = n_done * self.task_cfg.batch_size / dt
            self.last_epoch_qa_per_sec = qa
            print(f"epoch {epoch}: {n_done} steady-state steps in {dt:.1f}s "
                  f"= {qa:.0f} QA/s integrated")
        self.logger.show_train(epoch)
        return state, best

    # -- checkpoint routing (async by default) ----------------------------

    def _save_params(self, name, params):
        if self._saver is not None:
            self._saver.save_params(self.out, name, params)
        else:
            ckpt.save_params(self.out, name, params)

    def _save_state(self, state, **kw):
        if self._saver is not None:
            self._saver.save_state(self.out, state, **kw)
        else:
            ckpt.save_state(self.out, state, **kw)

    def _save_epoch_state(self, state, epoch: int, best: float) -> None:
        """End-of-epoch resume checkpoint: full state on the save_every
        cadence and on the final epoch; a cheap params-only save for the
        gap epochs when mid_save="params" (nothing otherwise)."""
        full = ((epoch + 1) % self.save_every == 0
                or epoch == self.task_cfg.num_epoch - 1)
        if full or self.mid_save == "params":
            self._save_state(state, epoch=epoch, best_score=best,
                             extra={"logger": self.logger.state_dict()},
                             params_only=not full)

    def _export_torch(self, name, params):
        path = os.path.join(self.out, name)
        if self._saver is not None:
            self._saver.export_torch_bin(path, params, self.model_name)
        else:
            ckpt.export_torch_bin(path, params, self.model_name)

    def _flush_saves(self):
        if self._saver is not None:
            self._saver.wait()

    # -- recipes ----------------------------------------------------------

    def _fresh_theta0(self):
        # copy: the jitted step donates its input state, which would otherwise
        # consume the shared theta_0 buffers needed by rewind/other recipes
        return jax.tree.map(jnp.array, self.params0)

    def _resume_meta(self, state):
        """(state, start_epoch, start_step, best) from the latest checkpoint.
        A meta with 'mid_epoch_step' re-enters that epoch at the recorded
        step; an end-of-epoch meta starts the next epoch."""
        state, meta = ckpt.resume_state(self.out, state)
        if meta.get("params_only"):
            print("WARNING: resuming from a params-only (mid_save) "
                  "checkpoint: optimizer moments restart at zero (schedule "
                  "clock fast-forwarded); training is NOT bit-identical to "
                  "an uninterrupted run", file=sys.stderr)
        self.logger.load_state_dict(meta.get("logger", {}))
        best = meta["best_score"]
        if meta.get("mid_epoch_step"):
            return state, meta["epoch"], meta["mid_epoch_step"], best
        return state, meta["epoch"] + 1, 0, best

    def finetune(self, *, resume: bool = False) -> float:
        opt = self._build_opt()
        step_fn = self._make_step(opt)
        params = self._fresh_theta0()
        state = TrainState(params, opt.init(params),
                           jnp.zeros((), jnp.int32))
        start_epoch, start_step, best = 0, 0, -1.0
        if resume:
            try:
                state, start_epoch, start_step, best = \
                    self._resume_meta(state)
            except FileNotFoundError:
                pass
        state = self._perlayer(state)     # training layout (loop.py)
        for epoch in range(start_epoch, self.task_cfg.num_epoch):
            state, best = self._train_epoch(
                state, step_fn, epoch, best=best,
                start_step=start_step if epoch == start_epoch else 0,
                on_best=lambda s: self._save_params("params_best", s.params),
                lr_step_base=epoch * self.pipe.steps_per_epoch())
            score = self.evaluate(state.params, epoch)
            if score > best:
                best = score
                self._save_params("params_best", state.params)
            self._save_epoch_state(state, epoch, best)
        self._flush_saves()
        return best

    # -- prune-resume plumbing ---------------------------------------------
    # The reference's pruning entry carries the same --resume_file machinery
    # as train (train_task_prunning.py:609-789 mirrors train_task.py:279-280;
    # train_utils.py:488-510). Ours is two-level: a cheap prune_meta.json
    # records every completed ROUND (no train state needed — the next round
    # rewinds to theta_0 anyway, and the round's mask is already on disk as
    # mask_lt{r}.npz), while a mid-round SIGTERM rides the standard
    # step-granular state checkpoint with the prune cursor merged in
    # (_preempt_extra), so resume is bit-exact (tests/test_prune_resume.py).

    def _prune_meta_path(self) -> str:
        return os.path.join(self.out, "prune_meta.json")

    def _write_prune_meta(self, next_round: int, history: list,
                          best: float, best_epoch: int) -> None:
        import json
        tmp = self._prune_meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"next_round": next_round, "history": history,
                       "best_score": best, "best_epoch": best_epoch,
                       "logger": self.logger.state_dict()}, f)
        os.replace(tmp, self._prune_meta_path())

    def _round_input_mask(self, rnd: int):
        """Mask that prune round `rnd` trains under: the output of round
        rnd-1 (mask_lt{rnd-1}.npz) — or the all-ones init for round 0."""
        if rnd <= 0:
            return pr.init_mask(self.params0, self.model_name)
        return pr.load_mask(
            os.path.join(self.out, f"mask_lt{rnd - 1}.npz"),
            self.params0, self.model_name)

    def _resume_prune(self, opt):
        """(mask, start_round, start_step, mid_state, history, best,
        best_epoch) from on-disk prune artifacts; defaults if none exist."""
        import json
        mask = pr.init_mask(self.params0, self.model_name)
        start_round, start_step, mid_state = 0, 0, None
        history, best, best_epoch = [], -1.0, -1
        pm_path = self._prune_meta_path()
        if os.path.exists(pm_path):
            with open(pm_path) as f:
                pmeta = json.load(f)
            start_round = pmeta["next_round"]
            history = pmeta["history"]
            best, best_epoch = pmeta["best_score"], pmeta["best_epoch"]
            self.logger.load_state_dict(pmeta.get("logger", {}))
            mask = self._round_input_mask(start_round)
        # a mid-round preemption state supersedes the round record only if
        # its round was not already completed (prune_meta is written AFTER
        # each round, so a stale state checkpoint from an earlier round
        # must be ignored)
        meta_path = os.path.join(self.out, "meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                smeta = json.load(f)
            pcur = smeta.get("prune")
            if (pcur is not None and smeta.get("mid_epoch_step")
                    and pcur["round"] >= start_round):
                like_params = self._fresh_theta0()
                like = TrainState(like_params, opt.init(like_params),
                                  jnp.zeros((), jnp.int32))
                state, smeta = ckpt.resume_state(self.out, like)
                self.logger.load_state_dict(smeta.get("logger", {}))
                start_round = pcur["round"]
                start_step = smeta["mid_epoch_step"]
                history = pcur["history"]
                best, best_epoch = pcur["best_score"], pcur["best_epoch"]
                mask = self._round_input_mask(start_round)
                mid_state = self._perlayer(state)
        return mask, start_round, start_step, mid_state, history, best, \
            best_epoch

    def imp_prune(self, *, fraction: float = 0.1,
                  resume: bool = False) -> dict:
        # ONE optimizer/step program for every prune round: the reference
        # rebuilds optimizer+scheduler from scratch each round (791-866) —
        # opt.init() below resets count/moments, which is exactly that — and
        # the mask rides the step as a runtime argument, so re-pruning never
        # recompiles.
        opt = self._build_opt()
        step_fn = self._make_step(opt)
        mask = pr.init_mask(self.params0, self.model_name)
        start_round, start_step, mid_state = 0, 0, None
        history, best, best_epoch = [], -1.0, -1
        if resume:
            (mask, start_round, start_step, mid_state, history, best,
             best_epoch) = self._resume_prune(opt)
        for epoch in range(start_round, self.task_cfg.num_epoch):
            self._preempt_extra = {"prune": {
                "round": epoch, "history": history,
                "best_score": best, "best_epoch": best_epoch}}
            if mid_state is not None and epoch == start_round:
                state, s0 = mid_state, start_step
            else:
                params = pr.apply_mask(self._fresh_theta0(), mask)
                state = self._perlayer(TrainState(params, opt.init(params),
                                                  jnp.zeros((), jnp.int32)))
                s0 = 0
            state, _ = self._train_epoch(state, step_fn, epoch,
                                         start_step=s0,
                                         grad_mask=self._runtime_mask(mask))
            from ..models.layers import restack_layer_tree
            mask = pr.imp_prune_step(
                jax.tree.map(np.asarray, restack_layer_tree(state.params)),
                mask, fraction)
            sp = pr.sparsity(mask)
            # Reference order (train_task_prunning.py:791-877): prune ->
            # rewind to theta_0 -> rebuild optimizer -> evaluate the REWOUND
            # masked weights (theta_0 * mask); mask_best is selected on that
            # score, not on trained * mask.
            score = self.evaluate(
                pr.apply_mask(self._fresh_theta0(), mask), epoch)
            history.append({"epoch": epoch, "sparsity": sp, "score": score})
            pr.save_mask(os.path.join(self.out, f"mask_lt{epoch}.npz"), mask)
            if score > best:
                best, best_epoch = score, epoch
                pr.save_mask(os.path.join(self.out, "mask_best.npz"), mask)
            # round complete: record the resume cursor (cheap json — masks
            # and history only; the next round rewinds to theta_0 so no
            # train state is needed at a round boundary)
            self._write_prune_meta(epoch + 1, history, best, best_epoch)
            # rewind: next round restarts from theta_0 (mask persists)
        self._preempt_extra = None
        return {"best_score": best, "best_epoch": best_epoch,
                "history": history}

    def sft(self, mask_path: str, *, resume: bool = False) -> float:
        mask = pr.load_mask(mask_path, self.params0, self.model_name)
        params = pr.apply_mask(self._fresh_theta0(), mask)
        opt = self._build_opt()
        step_fn = self._make_step(opt)
        mask_rt = self._runtime_mask(mask)
        state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
        start_epoch, start_step, best = 0, 0, -1.0
        if resume:
            try:
                state, start_epoch, start_step, best = \
                    self._resume_meta(state)
            except FileNotFoundError:
                pass
        state = self._perlayer(state)
        def save_best(s):
            self._save_params("params_best", s.params)
            self._export_torch("model_best_sft.bin", s.params)

        for epoch in range(start_epoch, self.task_cfg.num_epoch):
            state, best = self._train_epoch(
                state, step_fn, epoch, best=best, grad_mask=mask_rt,
                start_step=start_step if epoch == start_epoch else 0,
                on_best=save_best,
                lr_step_base=epoch * self.pipe.steps_per_epoch())
            score = self.evaluate(state.params, epoch)
            if score > best:
                best = score
                save_best(state)
            # logger state rides end-of-epoch saves exactly like finetune's
            # (and like the mid-epoch preemption save): an sft resume must
            # not silently reset metric history
            self._save_epoch_state(state, epoch, best)
        self._flush_saves()
        return best
