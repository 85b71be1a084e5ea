"""TensorBoard event-file writer: wire-format and round-trip checks.

The strong check decodes our hand-encoded tfevents files with the real
tensorboard reader (available in this environment); framing/CRC invariants
are also pinned independently so the suite still guards the writer if
tensorboard ever disappears from the image.
"""

import struct

import numpy as np
import pytest

from tf_faster_rcnn_tpu.utils.tb_writer import (TBEventWriter, _masked_crc,
                                                crc32c)


def test_crc32c_known_vectors():
    # RFC 3720 test vectors for CRC32C (Castagnoli)
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA
    assert crc32c(bytes([0xFF] * 32)) == 0x62A8AB43


def test_tfrecord_framing(tmp_path):
    w = TBEventWriter(str(tmp_path))
    w.add_scalar("loss", 1.5, step=3)
    w.close()
    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(files) == 1
    data = files[0].read_bytes()
    # walk records: u64 len, u32 crc(len), payload, u32 crc(payload)
    off, n = 0, 0
    while off < len(data):
        header = data[off:off + 8]
        (length,) = struct.unpack("<Q", header)
        (hcrc,) = struct.unpack("<I", data[off + 8:off + 12])
        assert hcrc == _masked_crc(header)
        payload = data[off + 12:off + 12 + length]
        (pcrc,) = struct.unpack("<I",
                                data[off + 12 + length:off + 16 + length])
        assert pcrc == _masked_crc(payload)
        off += 16 + length
        n += 1
    assert off == len(data) and n == 2  # file_version event + scalar event


@pytest.fixture
def accumulate(tmp_path):
    def run(write_fn):
        ea = pytest.importorskip(
            "tensorboard.backend.event_processing.event_accumulator")
        w = TBEventWriter(str(tmp_path))
        write_fn(w)
        w.close()
        acc = ea.EventAccumulator(str(tmp_path), size_guidance={
            ea.SCALARS: 0, ea.HISTOGRAMS: 0, ea.IMAGES: 0})
        acc.Reload()
        return acc
    return run


def test_scalars_roundtrip(accumulate):
    def write(w):
        w.add_scalar("total_loss", 2.25, step=10)
        w.add_scalars({"a": 1.0, "b": -3.5}, step=20, prefix="val")

    acc = accumulate(write)
    (ev,) = acc.Scalars("total_loss")
    assert ev.step == 10 and ev.value == 2.25
    (ev,) = acc.Scalars("val/a")
    assert ev.step == 20 and ev.value == 1.0
    (ev,) = acc.Scalars("val/b")
    assert ev.value == -3.5


def test_histogram_roundtrip(accumulate):
    values = np.random.RandomState(0).randn(1000)

    def write(w):
        w.add_histogram("weights", values, step=5)

    acc = accumulate(write)
    (ev,) = acc.Histograms("weights")
    h = ev.histogram_value
    assert h.num == 1000
    np.testing.assert_allclose(h.min, values.min())
    np.testing.assert_allclose(h.max, values.max())
    np.testing.assert_allclose(h.sum, values.sum())
    assert sum(h.bucket) == 1000


def test_image_roundtrip(accumulate, tmp_path):
    img = np.zeros((8, 12, 3), np.uint8)
    img[2:5, 3:7] = [255, 0, 0]

    def write(w):
        w.add_image("gt", img, step=1)

    acc = accumulate(write)
    (ev,) = acc.Images("gt")
    assert ev.width == 12 and ev.height == 8
    from PIL import Image
    import io
    back = np.asarray(Image.open(io.BytesIO(ev.encoded_image_string)))
    np.testing.assert_array_equal(back, img)
