import numpy as np
import pytest

from lbf_spark.functions import codec


def test_png_roundtrip_exact():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (8, 8), (16, 9), (32, 32)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(codec.png_decode(codec.png_encode(img)), img)


def test_lossy_psnr_above_gate():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    dec = codec.decode_lossy(codec.encode_lossy(img))
    assert codec.psnr(img, dec) >= 40.0  # BASELINE.json per-row invariant


def test_lossy_deterministic():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert codec.encode_lossy(img) == codec.encode_lossy(img.copy())


def test_psnr_identical_is_inf():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    assert codec.psnr(img, img) == float("inf")


def test_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        codec.decode_image(b"xxxx", "webp")
