"""Pretraining heads/losses: formula parity of the visual criterions vs the
reference torch implementations (volta/volta/losses.py), and a forward/loss
smoke for the full pretraining objective."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clg_vqa_tpu.config import UC2Config
from clg_vqa_tpu.models import uc2
from clg_vqa_tpu.models.pretrain import (init_pretrain_heads, pretrain_loss,
                                         pretrain_forward)
from clg_vqa_tpu.ops import pretrain_losses as PL


def _torch_ref(name, pred, label, **kw):
    import sys, types
    for m in ["boto3", "requests", "botocore", "botocore.exceptions",
              "tensorboardX"]:
        sys.modules.setdefault(m, types.ModuleType(m))
    sys.modules["botocore.exceptions"].ClientError = Exception
    sys.path.insert(0, "/root/reference/volta")
    import torch
    from volta import losses as RL
    t = lambda x: None if x is None else torch.from_numpy(np.asarray(x))
    fn = getattr(RL, name)
    out = fn(t(pred), 1.0, t(label), t(kw.get("image_cls")),
             t(kw.get("image_feat")), t(kw.get("obj_labels")),
             t(kw.get("obj_confs")), t(kw.get("attr_labels")),
             t(kw.get("attr_confs")))
    return float(out)


@pytest.fixture(scope="module")
def vis_data():
    r = np.random.RandomState(0)
    B, R = 3, 5
    label = (r.rand(B, R) < 0.4).astype(np.int64)
    label[0, 0] = 1
    cls_ = r.rand(B, R, 1601).astype(np.float32)
    cls_ /= cls_.sum(-1, keepdims=True)
    return {
        "label": label,
        "image_cls": cls_,
        "image_feat": r.randn(B, R, 2048).astype(np.float32),
        "obj_labels": r.randint(0, 1600, (B, R)),
        "obj_confs": r.rand(B, R).astype(np.float32),
        "attr_labels": r.randint(0, 400, (B, R)),
        "attr_confs": r.rand(B, R).astype(np.float32),
    }


@pytest.mark.parametrize("key,name,dim", [
    ("0", "kl_1601", 1601), ("1", "mse_2048", 2048), ("3", "xent_1600", 1600),
    ("4", "xent_400", 400), ("5", "huber_2048", 2048),
    ("6", "xent_1601", 1601),
])
def test_vis_criterion_parity(vis_data, key, name, dim):
    r = np.random.RandomState(1)
    pred = r.randn(3, 5, dim).astype(np.float32)
    ref = _torch_ref(name, pred, vis_data["label"],
                     image_cls=vis_data["image_cls"],
                     image_feat=vis_data["image_feat"],
                     obj_labels=vis_data["obj_labels"],
                     obj_confs=vis_data["obj_confs"],
                     attr_labels=vis_data["attr_labels"],
                     attr_confs=vis_data["attr_confs"])
    ours = float(PL.PRE_VIS_CRITERIONS[key](
        jnp.asarray(pred), jnp.asarray(vis_data["label"]),
        image_cls=jnp.asarray(vis_data["image_cls"]),
        image_feat=jnp.asarray(vis_data["image_feat"]),
        obj_labels=jnp.asarray(vis_data["obj_labels"]),
        obj_confs=jnp.asarray(vis_data["obj_confs"]),
        attr_labels=jnp.asarray(vis_data["attr_labels"]),
        attr_confs=jnp.asarray(vis_data["attr_confs"]),
        rng=jax.random.key(0)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_pretrain_forward_and_loss_smoke():
    cfg = UC2Config(vocab_size=100, hidden_size=32, num_layers=2, num_heads=2,
                    intermediate_size=64, v_feature_size=16, num_locs=7,
                    pooler_size=32, clf_hidden_size=32, num_labels=8)
    params = uc2.init_params(jax.random.key(0), cfg)
    heads = init_pretrain_heads(jax.random.key(1), cfg,
                                visual_target_weights={"0": 1.0, "1": 0.5})
    r = np.random.RandomState(0)
    B, T, R = 2, 6, 4
    cls_ = r.rand(B, R, 1601).astype(np.float32)
    cls_ /= cls_.sum(-1, keepdims=True)
    batch = {
        "input_ids": jnp.asarray(r.randint(3, 100, (B, T)), jnp.int32),
        "input_mask": jnp.ones((B, T), jnp.int32),
        "features": jnp.asarray(r.randn(B, R, 16), jnp.float32),
        "locs": jnp.asarray(r.rand(B, R, 7), jnp.float32),
        "image_mask": jnp.ones((B, R), jnp.int32),
        "lm_labels": jnp.asarray(
            np.where(r.rand(B, T) < 0.3, r.randint(0, 100, (B, T)), -1),
            jnp.int32),
        "is_match": jnp.asarray(r.randint(0, 2, (B,)), jnp.int32),
        "image_label": jnp.asarray((r.rand(B, R) < 0.3).astype(np.int64)),
        "image_cls": jnp.asarray(cls_),
    }
    # mrm target "1" regresses the 2048-d feature; here v_feature_size=16 so
    # only run target "0" for shape sanity + "1" vs features dim
    heads["img"]["decoders"]["1"] = {
        "w": jnp.zeros((32, 16)), "b": jnp.zeros((16,))}
    tl_, itm, vis = pretrain_forward(params, heads, cfg, batch)
    assert tl_.shape == (B, T, 100) and itm.shape == (B, 2)
    assert vis["0"].shape == (B, R, 1601)
    losses = pretrain_loss(params, heads, cfg, batch,
                           visual_target_weights={"0": 1.0, "1": 0.5})
    assert np.isfinite(float(losses["total"]))
    assert {"masked_lm", "itm", "vis_0", "vis_1", "total"} <= set(losses)


def test_lm_decoder_tied_to_embeddings():
    cfg = UC2Config(vocab_size=50, hidden_size=16, num_layers=1, num_heads=2,
                    intermediate_size=32, v_feature_size=8, num_locs=7,
                    pooler_size=16, clf_hidden_size=16, num_labels=4)
    params = uc2.init_params(jax.random.key(0), cfg)
    heads = init_pretrain_heads(jax.random.key(1), cfg)
    batch = {
        "input_ids": jnp.asarray([[0, 5, 6, 2]], jnp.int32),
        "input_mask": jnp.ones((1, 4), jnp.int32),
        "features": jnp.zeros((1, 3, 8)),
        "locs": jnp.zeros((1, 3, 7)),
        "image_mask": jnp.ones((1, 3), jnp.int32),
    }
    t1, _, _ = pretrain_forward(params, heads, cfg, batch)
    params2 = jax.tree.map(lambda x: x, params)
    params2["embeddings"]["word"] = params["embeddings"]["word"] * 2.0
    t2, _, _ = pretrain_forward(params2, heads, cfg, batch)
    assert not np.allclose(np.asarray(t1), np.asarray(t2))  # tie is live


def test_pretrain_loss_trains():
    """The pretraining objective is end-to-end differentiable: a few AdamW
    steps on (encoder params + heads) jointly must reduce the total loss
    (BertForVLPreTraining's training contract, encoders.py:1045-1152)."""
    import optax
    cfg = UC2Config(vocab_size=100, hidden_size=32, num_layers=2, num_heads=2,
                    intermediate_size=64, v_feature_size=16, num_locs=7,
                    pooler_size=32, clf_hidden_size=32, num_labels=8)
    params = uc2.init_params(jax.random.key(0), cfg)
    heads = init_pretrain_heads(jax.random.key(1), cfg,
                                visual_target_weights={"0": 1.0})
    r = np.random.RandomState(1)
    B, T, R = 4, 6, 4
    cls_ = r.rand(B, R, 1601).astype(np.float32)
    cls_ /= cls_.sum(-1, keepdims=True)
    batch = {
        "input_ids": jnp.asarray(r.randint(3, 100, (B, T)), jnp.int32),
        "input_mask": jnp.ones((B, T), jnp.int32),
        "features": jnp.asarray(r.randn(B, R, 16), jnp.float32),
        "locs": jnp.asarray(r.rand(B, R, 7), jnp.float32),
        "image_mask": jnp.ones((B, R), jnp.int32),
        "lm_labels": jnp.asarray(
            np.where(r.rand(B, T) < 0.3, r.randint(0, 100, (B, T)), -1),
            jnp.int32),
        "is_match": jnp.asarray(r.randint(0, 2, (B,)), jnp.int32),
        "image_label": jnp.asarray((r.rand(B, R) < 0.3).astype(np.int64)),
        "image_cls": jnp.asarray(cls_),
    }
    both = {"enc": params, "heads": heads}
    opt = optax.adam(1e-3)
    opt_state = opt.init(both)

    @jax.jit
    def step(both, opt_state):
        def loss_fn(b):
            return pretrain_loss(b["enc"], b["heads"], cfg, batch,
                                 visual_target_weights={"0": 1.0})["total"]
        loss, grads = jax.value_and_grad(loss_fn)(both)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(both, updates), opt_state, loss

    first = None
    for _ in range(8):
        both, opt_state, loss = step(both, opt_state)
        first = first if first is not None else float(loss)
    assert float(loss) < first * 0.9, (first, float(loss))
