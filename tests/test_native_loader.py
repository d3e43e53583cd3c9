"""Native C++ data-loader tests (skipped when libyolodata.so isn't built)."""

import glob

import numpy as np
import pytest

from experiment_yolo_tpu.data import make_synthetic_dataset
from experiment_yolo_tpu.data import native_loader as nl
from experiment_yolo_tpu.data.augment import letterbox

pytestmark = pytest.mark.skipif(not nl.available(), reason="native lib not built (make -C native)")


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_native")
    make_synthetic_dataset(root, n_train=8, n_val=2, imgsz=213)  # odd size
    return sorted(glob.glob(str(root / "images" / "train" / "*.jpg")))


def test_decode_bit_exact_vs_cv2(paths):
    import cv2

    img = nl.decode_image(paths[0])
    ref = cv2.imread(paths[0])[..., ::-1]
    assert img.shape == ref.shape
    np.testing.assert_array_equal(img, ref)


def test_batch_letterbox_matches_cv2_path(paths):
    import cv2

    batch, rp, fails = nl.load_letterboxed_batch(paths[:4], 256, workers=4)
    assert fails == 0
    assert batch.shape == (4, 256, 256, 3)
    for i in range(4):
        ref_bgr = cv2.imread(paths[i])
        lb, gain, (pw, ph) = letterbox(ref_bgr, (256, 256))
        assert rp[i, 0] == pytest.approx(gain, abs=1e-6)
        assert rp[i, 1] == pw and rp[i, 2] == ph
        diff = np.abs(batch[i].astype(int) - lb[..., ::-1].astype(int))
        assert diff.mean() < 0.5  # bilinear rounding differs by <= 1 LSB
        assert diff.max() <= 2


def test_missing_file_counts_failure(paths, tmp_path):
    batch, rp, fails = nl.load_letterboxed_batch([paths[0], str(tmp_path / "nope.jpg")], 128, workers=2)
    assert fails == 1
    assert (batch[1] == 114).all()  # failed slot stays letterbox-fill


def test_decode_buffer_matches_file_decode(paths, tmp_path):
    raw = open(paths[0], "rb").read()
    from_buf = nl.decode_image_bytes(raw)
    assert from_buf is not None
    np.testing.assert_array_equal(from_buf, nl.decode_image(paths[0]))

    # PNG path via magic sniffing
    import cv2

    png = tmp_path / "x.png"
    cv2.imwrite(str(png), cv2.imread(paths[0]))
    from_buf = nl.decode_image_bytes(png.read_bytes())
    assert from_buf is not None
    np.testing.assert_array_equal(from_buf, nl.decode_image(str(png)))

    # garbage bytes -> graceful None (cv2 fallback in serve)
    assert nl.decode_image_bytes(b"not an image") is None


def test_serve_decode_uses_native_and_matches_cv2(paths):
    import cv2

    from experiment_yolo_tpu.serve import DetectionServer

    raw = open(paths[0], "rb").read()
    got = DetectionServer._decode(raw)  # BGR out
    ref = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_decode_buffer_rejects_forged_huge_header():
    """A tiny buffer declaring enormous dimensions must fail cleanly before
    allocating (serving hot path receives untrusted bytes)."""
    import struct
    import zlib

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 100_000, 100_000, 8, 2, 0, 0, 0)  # 10 GP
    forged = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    assert nl.decode_image_bytes(forged) is None
