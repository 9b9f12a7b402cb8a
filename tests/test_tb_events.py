"""TensorBoard event-writer parity: our pure-Python TFRecord/protobuf
serialization must be readable by the official tensorboard reader — the
contract the reference's tbLogger (tensorboardX) provides."""
import math

import pytest

from clg_vqa_tpu.utils.logging import MetricsLogger
from clg_vqa_tpu.utils.tb_events import EventWriter, _crc32c


def test_crc32c_known_vectors():
    # RFC 3720 test vectors (iSCSI CRC32C)
    assert _crc32c(b"") == 0
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(bytes(32)) == 0x8A9136AA


def test_events_readable_by_tensorboard(tmp_path):
    ea_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator")

    w = EventWriter(str(tmp_path))
    w.add_scalars({"train/loss": 1.5, "train/lr": 4e-5}, step=1)
    w.add_scalars({"train/loss": 0.75}, step=2)
    w.close()

    acc = ea_mod.EventAccumulator(str(tmp_path))
    acc.Reload()
    assert set(acc.Tags()["scalars"]) == {"train/loss", "train/lr"}
    loss = acc.Scalars("train/loss")
    assert [e.step for e in loss] == [1, 2]
    assert math.isclose(loss[0].value, 1.5)
    assert math.isclose(loss[1].value, 0.75)
    assert math.isclose(acc.Scalars("train/lr")[0].value, 4e-5,
                        rel_tol=1e-6)


def test_metrics_logger_emits_tb(tmp_path):
    ea_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator")

    lg = MetricsLogger(str(tmp_path), task="GQA")
    lg.step_train(epoch=0, loss=2.0, score=0.1, lr=1e-4)
    lg.step_val(loss=1.0, correct=3.0, count=4.0)
    lg.show_val(epoch=0)
    lg.close()

    acc = ea_mod.EventAccumulator(str(tmp_path))
    acc.Reload()
    tags = set(acc.Tags()["scalars"])
    assert {"train/GQA_loss", "train/GQA_score", "train/GQA_lr",
            "val/GQA_loss", "val/GQA_score"} <= tags
    assert math.isclose(acc.Scalars("val/GQA_score")[0].value, 0.75)


def test_varint_rejects_negative():
    import pytest
    from clg_vqa_tpu.utils.tb_events import _varint
    with pytest.raises(ValueError):
        _varint(-1)                 # would otherwise loop forever
