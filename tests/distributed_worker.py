"""Multi-process data-parallel worker (run as a subprocess by
tests/test_distributed.py, apex-style — the reference's dependency tree
tests its NCCL DDP path with real multi-process single-node jobs,
volta/apex/tests/distributed; this is our jax.distributed equivalent).

Each of the 2 processes exposes 4 virtual CPU devices, joins the runtime
via parallel.distributed.initialize (the reference's
torch.distributed.init_process_group + --local_rank bootstrap,
train_task.py:148-159), spans a dp4 x mp2 mesh over all 8 devices, feeds
its host-sharded half of the global batch through
TrainPipeline(host_id, num_hosts) (the DistributedSampler equivalent,
task_utils.py:478-482), runs ONE real train step, and prints a RESULT
line the test asserts bit-equal across processes AND against an
in-process single-host run of the same program.

The module is import-safe (the test imports make_world/checksum for the
single-process reference); only __main__ touches jax.distributed.
"""
import os
import sys

import numpy as np


class SynthDataset:
    """Deterministic synthetic GQA-shaped dataset: every field is a pure
    function of the entry index, so two hosts (and the single-process
    reference) materialize identical rows without sharing files."""

    T, R = 6, 4

    def __init__(self, n: int, cfg):
        self.n = n
        self.cfg = cfg

    def __len__(self):
        return self.n

    def make_batch(self, idxs, with_features: bool = True):
        cfg = self.cfg
        rows = [np.random.RandomState(10_000 + i) for i in idxs]
        return {
            "input_ids": np.stack(
                [r.randint(3, cfg.vocab_size, self.T) for r in rows]
            ).astype(np.int32),
            "input_mask": np.ones((len(rows), self.T), np.int32),
            "features": np.stack(
                [r.randn(self.R, cfg.v_feature_size) for r in rows]
            ).astype(np.float32),
            "locs": np.stack(
                [r.rand(self.R, cfg.num_locs) for r in rows]
            ).astype(np.float32),
            "image_mask": np.ones((len(rows), self.R), np.int32),
            "labels": np.array(
                [r.randint(0, cfg.num_labels) for r in rows], np.int32),
        }


ACC, GLOBAL_MBS, N_DP, N_MP = 2, 8, 4, 2


def make_world():
    """(cfg, state, step, D) — identical on every process (same keys)."""
    import jax
    import jax.numpy as jnp
    from clg_vqa_tpu.config import UC2Config
    from clg_vqa_tpu.models import uc2
    from clg_vqa_tpu.train import loop as tl
    from clg_vqa_tpu.train.optim import make_optimizer

    cfg = UC2Config(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                    intermediate_size=64, v_feature_size=16, num_locs=7,
                    pooler_size=32, clf_hidden_size=32, num_labels=8,
                    hidden_dropout_prob=0.0,
                    attention_probs_dropout_prob=0.0, clf_dropout_prob=0.0)
    params = uc2.init_params(jax.random.key(0), cfg)
    D = jnp.asarray(np.random.RandomState(0).rand(
        cfg.num_labels, cfg.num_labels).astype(np.float32))
    opt = make_optimizer(params, 1e-3, weight_decay=1e-4, clip_norm=1.0)
    state = tl.TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step = tl.make_train_step(uc2.forward, cfg, opt, D, semantic_lambda=10.0,
                              top_k=4, compute_dtype=None, use_dropout=False)
    return cfg, state, step


def host_batch(cfg, host_id: int, num_hosts: int):
    """This host's first-epoch first-step batch through TrainPipeline's
    host-sharded order: [ACC, GLOBAL_MBS/num_hosts, ...] numpy."""
    from clg_vqa_tpu.data.pipeline import TrainPipeline

    ds = SynthDataset(64, cfg)
    pipe = TrainPipeline(ds, micro_batch_size=GLOBAL_MBS // num_hosts,
                         grad_acc_steps=ACC, seed=3, host_id=host_id,
                         num_hosts=num_hosts, device_put=False)
    it = pipe.epoch(0)
    batch = next(iter(it))
    it.close() if hasattr(it, "close") else None
    return batch


def checksum(params):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _cs(p):
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(p))

    return float(np.asarray(jax.device_get(_cs(params))))


def main(port: str, pid: int) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from clg_vqa_tpu.parallel import distributed as dist

    dist.initialize(coordinator_address=f"localhost:{port}",
                    num_processes=2, process_id=pid)
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
    assert dist.host_id() == pid and dist.num_hosts() == 2
    assert dist.is_primary() == (pid == 0)

    from jax.sharding import NamedSharding, PartitionSpec as P
    from clg_vqa_tpu.parallel import mesh as pm
    from clg_vqa_tpu.train import loop as tl

    cfg, state, step = make_world()
    mesh = pm.make_mesh(n_dp=N_DP, n_mp=N_MP)

    # host-sharded input: each process assembles ONLY its TrainPipeline
    # rows; make_array_from_process_local_data stitches the global
    # [ACC, GLOBAL_MBS, ...] dp-sharded batch from the two local halves
    # (host 0 owns dp shards 0-1 = rows 0..3, host 1 rows 4..7)
    local = host_batch(cfg, host_id=pid, num_hosts=2)
    bsh = NamedSharding(mesh, P(None, "dp"))
    batch = {k: jax.make_array_from_process_local_data(bsh, v)
             for k, v in local.items()}

    # state: the step's own sharding tree (params Megatron-sharded, AdamW
    # moments mirroring); every process holds the full numpy and serves
    # each local device its shard
    state_sh = tl._shard_opt_state_like(mesh, state)
    state = jax.tree.map(
        lambda x, sh: jax.make_array_from_callback(
            np.shape(x), sh, lambda idx, x=x: np.asarray(x)[idx]),
        state, state_sh)

    sharded = tl.shard_train_step(step, mesh, state, batch, donate=False)
    new_state, metrics = sharded(state, batch, jax.random.key(0))
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    print(f"RESULT p{pid} loss={loss!r} checksum="
          f"{checksum(new_state.params)!r}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
