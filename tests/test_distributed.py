"""Multi-process data parallelism (parallel/distributed.py), apex-style.

The reference's real deployment mode is multi-process DDP
(train_task.py:148-159 NCCL bootstrap, apex DDP wrap at :288-295) and its
dependency tree tests that with real multi-process single-node jobs
(volta/apex/tests/distributed). Equivalent here: spawn TWO actual Python
processes, each with 4 virtual CPU devices, that join one jax.distributed
runtime (gloo collectives), span a dp4 x mp2 GSPMD mesh across all 8
devices, pull host-disjoint batch halves through
TrainPipeline(host_id, num_hosts), and run one real UC2 train step — then
assert the two processes agree BIT-FOR-BIT with each other and match the
same program run single-process on an 8-device mesh to float32 reduction
tolerance (the dp gradient psum reduces hierarchically — local shards
first, then gloo across processes — so the summation ORDER differs from
the flat single-process reduce; measured delta ~1e-7 relative, which is
exactly one fp32 reassociation, not a semantic divergence).
"""
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from clg_vqa_tpu.data.pipeline import TrainPipeline
from clg_vqa_tpu.parallel import mesh as pm
from clg_vqa_tpu.train import loop as tl

from distributed_worker import (ACC, GLOBAL_MBS, N_DP, N_MP, SynthDataset,
                                checksum, host_batch, make_world)

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
_RESULT = re.compile(r"RESULT p(\d) loss=([\d.e+-]+) checksum=([\d.e+-]+)")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """The same one-step program on this process's 8-device mesh, fed the
    CONCATENATION of the two hosts' TrainPipeline halves (host 0 owns dp
    shards 0-1 -> batch rows 0..3, host 1 rows 4..7 — the exact layout
    make_array_from_process_local_data stitches in the workers)."""
    import jax.numpy as jnp

    cfg, state, step = make_world()
    h0 = host_batch(cfg, host_id=0, num_hosts=2)
    h1 = host_batch(cfg, host_id=1, num_hosts=2)
    batch = {k: jnp.asarray(np.concatenate([h0[k], h1[k]], axis=1))
             for k in h0}
    mesh = pm.make_mesh(n_dp=N_DP, n_mp=N_MP)
    sharded = tl.shard_train_step(step, mesh, state, batch, donate=False)
    new_state, metrics = sharded(state, batch, jax.random.key(0))
    return float(np.asarray(metrics["loss"])), checksum(new_state.params)


def test_host_sharded_orders_partition_dataset():
    """TrainPipeline's per-host strided orders are disjoint (up to the
    wrap-around padding) and cover the dataset — DistributedSampler
    semantics (task_utils.py:478-482)."""
    cfg, _, _ = make_world()
    ds = SynthDataset(64, cfg)
    pipes = [TrainPipeline(ds, micro_batch_size=4, grad_acc_steps=2,
                           seed=3, host_id=h, num_hosts=2)
             for h in range(2)]
    o0, o1 = (p._epoch_order(0) for p in pipes)
    assert len(o0) == len(o1) == 32
    assert set(o0).isdisjoint(o1)
    assert set(o0) | set(o1) == set(range(64))
    assert pipes[0].steps_per_epoch() == pipes[1].steps_per_epoch() == 4


def test_two_process_step_matches_single_process():
    """2 x (jax.distributed.initialize + 4 virtual devices) == 1 x 8
    virtual devices, bit for bit, on a real train step."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(WORKER)),
         env.get("PYTHONPATH", "")]).rstrip(os.pathsep)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(port), str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.dirname(WORKER))
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = {}
    for out in outs:
        m = _RESULT.search(out)
        assert m, f"no RESULT line in worker output:\n{out[-3000:]}"
        results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    assert procs[0].returncode == 0 and procs[1].returncode == 0, outs
    # the two processes run ONE shared SPMD program: bit-equal, always
    assert results[0] == results[1], results

    # vs single-process: identical up to the dp-psum's hierarchical
    # (local-then-gloo) reduction order — see module docstring
    ref = _single_process_reference()
    np.testing.assert_allclose(results[0], ref, rtol=1e-6)
