"""TensorBoard event-file writer: record framing + proto round-trip."""

import glob
import struct

from video_chapter_generation_tpu.core.tb_writer import (
    TensorBoardWriter,
    _masked_crc,
    crc32c,
)


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"123456789") == 0xE3069283


def test_event_file_structure(tmp_path):
    w = TensorBoardWriter(str(tmp_path))
    w.add_scalar("train/loss", 0.5, 1)
    w.add_scalar("train/loss", 0.25, 2)
    w.close()

    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    data = open(files[0], "rb").read()

    # walk TFRecords, verifying CRCs
    records = []
    off = 0
    while off < len(data):
        (length,) = struct.unpack("<Q", data[off : off + 8])
        (hcrc,) = struct.unpack("<I", data[off + 8 : off + 12])
        assert hcrc == _masked_crc(data[off : off + 8])
        payload = data[off + 12 : off + 12 + length]
        (pcrc,) = struct.unpack(
            "<I", data[off + 12 + length : off + 16 + length]
        )
        assert pcrc == _masked_crc(payload)
        records.append(payload)
        off += 16 + length

    assert len(records) == 3  # file_version + 2 scalars
    assert b"brain.Event:2" in records[0]
    assert b"train/loss" in records[1]
    # simple_value 0.25 encoded little-endian float in record 2
    assert struct.pack("<f", 0.25) in records[2]


def test_metric_writer_integration(tmp_path):
    from video_chapter_generation_tpu.core.metrics import MetricWriter

    w = MetricWriter(str(tmp_path))
    w.add_scalar("x", 1.0, 0)
    w.close()
    assert glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert (tmp_path / "scalars.jsonl").exists()
