"""Full-scale sanity: one 256-QA batch, 400 steps, loss must collapse
(training machinery optimizes at 281M; the rehearsal's flat accuracy is
the random-init plateau, not a training defect)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from clg_vqa_tpu.config import UC2Config
from clg_vqa_tpu.models import uc2
from clg_vqa_tpu.train import loop as tl
from clg_vqa_tpu.train.optim import make_optimizer
from clg_vqa_tpu.models.layers import unstack_layer_params

cfg = UC2Config()
params = uc2.init_params(jax.random.key(0), cfg)
D = jnp.zeros((cfg.num_labels, cfg.num_labels), jnp.float32)
opt = make_optimizer(unstack_layer_params(params, cfg.num_layers), 3e-4)
state = tl.perlayer_state(
    tl.TrainState(params, opt.init(params), jnp.zeros((), jnp.int32)),
    cfg.num_layers)
step = jax.jit(tl.make_train_step(uc2.forward, cfg, opt, D,
                                  semantic_lambda=0.0, use_dropout=False),
               donate_argnums=(0,))
r = np.random.RandomState(0)
acc, mbs, T, R = 2, 128, 40, 36
batch = {
    "input_ids": jnp.asarray(r.randint(3, cfg.vocab_size, (acc, mbs, T)), jnp.int32),
    "input_mask": jnp.ones((acc, mbs, T), jnp.int32),
    "features": jnp.asarray(r.randn(acc, mbs, R, 2048), np.float32),
    "locs": jnp.asarray(r.rand(acc, mbs, R, 7), np.float32),
    "image_mask": jnp.ones((acc, mbs, R), jnp.int32),
    "labels": jnp.asarray(r.randint(0, 1842, (acc, mbs)), jnp.int32),
}
rng = jax.random.key(0, impl="rbg")
t0 = time.time()
for i in range(401):
    state, m = step(state, batch, rng)
    if i % 50 == 0:
        print(f"step {i}: loss {float(m['loss']):.1f} "
              f"acc {float(m['score']):.3f} ({time.time()-t0:.0f}s)", flush=True)
print("OVERFIT", "OK" if float(m["score"]) > 0.9 else "WEAK",
      float(m["loss"]), float(m["score"]))
