"""Degenerate/empty-input edge cases — the reference's detectron2 suite
tests E2E models on empty inputs (py-bottom-up-attention/tests/
test_model_e2e.py:40-50); these are the equivalents for our fixed-shape
formulations, where "empty" means all-masked/all-invalid, never a 0-sized
array."""
import numpy as np

import jax
import jax.numpy as jnp

from clg_vqa_tpu.config import UC2Config
from clg_vqa_tpu.models import uc2
from clg_vqa_tpu.ops.nms import batched_nms_fixpoint, nms


def test_nms_no_valid_candidates():
    boxes = jnp.asarray(np.random.RandomState(0).rand(8, 4), jnp.float32)
    scores = jnp.asarray(np.random.RandomState(1).rand(8), jnp.float32)
    idx, keep = nms(boxes, scores, 0.5, max_outputs=4,
                    valid=jnp.zeros((8,), bool))
    assert not np.asarray(keep).any()             # zero survivors


def test_fixpoint_nms_all_invalid_class():
    r = np.random.RandomState(2)
    boxes = jnp.asarray(r.rand(3, 8, 4) * 50, jnp.float32)
    scores = jnp.asarray(r.rand(3, 8), jnp.float32)
    valid = jnp.asarray([[True] * 8, [False] * 8, [True] * 8])
    keep = batched_nms_fixpoint(boxes, scores, 0.5, valid=valid)
    assert not np.asarray(keep)[1].any()          # empty class keeps nothing
    assert np.asarray(keep)[0].any()


def test_uc2_forward_all_image_masked():
    """A sample whose every region is masked (no image evidence) must still
    produce finite logits — the -10000 additive mask keeps softmax defined
    because text keys remain valid (encoders.py:987-995 semantics)."""
    cfg = UC2Config(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                    intermediate_size=64, v_feature_size=16, num_locs=7,
                    pooler_size=32, clf_hidden_size=32, num_labels=8)
    params = uc2.init_params(jax.random.key(0), cfg)
    r = np.random.RandomState(3)
    batch = {
        "input_ids": jnp.asarray(r.randint(3, 64, (2, 6)), jnp.int32),
        "input_mask": jnp.ones((2, 6), jnp.int32),
        "features": jnp.asarray(r.randn(2, 4, 16), jnp.float32),
        "locs": jnp.asarray(r.rand(2, 4, 7), jnp.float32),
        "image_mask": jnp.zeros((2, 4), jnp.int32),      # no valid regions
    }
    logits = uc2.forward(params, cfg, batch, deterministic=True,
                         compute_dtype=None)
    assert np.isfinite(np.asarray(logits)).all()


def test_eval_step_all_padding_batch():
    """A tail batch that is 100% padding (valid all-zero) must not divide by
    zero and must contribute 0 correct / 0 count."""
    from clg_vqa_tpu.train.loop import make_eval_step
    cfg = UC2Config(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                    intermediate_size=64, v_feature_size=16, num_locs=7,
                    pooler_size=32, clf_hidden_size=32, num_labels=8)
    params = uc2.init_params(jax.random.key(0), cfg)
    r = np.random.RandomState(4)
    batch = {
        "input_ids": jnp.asarray(r.randint(3, 64, (2, 6)), jnp.int32),
        "input_mask": jnp.ones((2, 6), jnp.int32),
        "features": jnp.asarray(r.randn(2, 4, 16), jnp.float32),
        "locs": jnp.asarray(r.rand(2, 4, 7), jnp.float32),
        "image_mask": jnp.ones((2, 4), jnp.int32),
        "labels": jnp.zeros((2,), jnp.int32),
        "valid": jnp.zeros((2,), jnp.float32),
    }
    m = jax.jit(make_eval_step(uc2.forward, cfg, compute_dtype=None))(
        params, batch)
    assert float(m["count"]) == 0.0 and float(m["correct"]) == 0.0
    assert np.isfinite(float(m["loss"]))


def test_extractor_blank_image():
    """A constant-color image (no gradients for the RPN to latch onto) must
    still return the fixed-shape record with finite features."""
    from clg_vqa_tpu.models.detector import extractor
    cfg = extractor.ExtractorConfig(num_boxes=6, pre_nms_topk=200,
                                    post_nms_topk=50, pad_h=128, pad_w=160,
                                    short=96, max_size=160)
    params = extractor.init_extractor_params(jax.random.key(0))
    ex = extractor.Extractor36(params, cfg)
    img = np.full((100, 140, 3), 128, np.uint8)
    rec = ex.extract(img, "blank")
    assert rec.features.shape == (6, 2048)
    assert np.isfinite(rec.features).all()
    assert np.isfinite(rec.boxes).all()


def test_code_mix_empty_question():
    """CDM on an empty/whitespace question must not crash and must return a
    string (reference loops over tokens; zero tokens -> unchanged)."""
    from clg_vqa_tpu.data.code_mix import CodeMixer
    dicts = {"languages": ["de"], "de": {"dog": ["hund"]}}
    cm = CodeMixer(dicts, ratio=1.0, cross=1.0, seed=0)
    assert isinstance(cm("", 0), str)
    assert isinstance(cm("   ", 1), str)
