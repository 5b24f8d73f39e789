"""16-bit output tests: save_image (native libpng + pure-Python
encoders) round-trips through cv2's IMREAD_UNCHANGED oracle.

The reference's example flow can only persist an 8-bit Mat
(examples/main.rs:150-158); 16-bit PNG output preserves the extra depth
a stacked mean carries.
"""

import numpy as np
import pytest

from libstacker_tpu.errors import StackerIoError
from libstacker_tpu.utils import io, native_loader

cv2 = pytest.importorskip("cv2")


def _content(h=37, w=53):
    # full-range gradient + noise exercising >8-bit depth, plus the
    # extremes
    rng = np.random.default_rng(42)
    img = np.linspace(0.0, 1.0, h * w * 3, dtype=np.float32)
    img = img.reshape(h, w, 3) + rng.normal(0, 1e-3, (h, w, 3)).astype(
        np.float32
    )
    img = np.clip(img, 0.0, 1.0)
    img[0, 0] = 0.0
    img[-1, -1] = 1.0
    return img


def _read16(path):
    dec = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    assert dec is not None, "cv2 could not decode the written PNG"
    return dec[..., ::-1]  # BGR -> RGB


def test_save_image_16bit_roundtrip(tmp_path):
    img = _content()
    expect = np.clip(img * 65535.0 + 0.5, 0, 65535).astype(np.uint16)
    p = tmp_path / "out16.png"
    io.save_image(p, img, bit_depth=16)
    dec = _read16(p)
    assert dec.dtype == np.uint16
    np.testing.assert_array_equal(dec, expect)
    # quantisation really uses the extra depth: more distinct levels
    # than any 8-bit image can hold
    assert len(np.unique(expect)) > 256


def test_save_image_16bit_python_encoder_matches_native(tmp_path):
    img = _content(23, 41)
    p_py = tmp_path / "py.png"
    io._write_png16_py(
        p_py, np.clip(img * 65535.0 + 0.5, 0, 65535).astype(np.uint16)
    )
    dec_py = _read16(p_py)
    if native_loader.available():
        p_nat = tmp_path / "nat.png"
        native_loader.write_png16_native(
            p_nat,
            np.clip(img * 65535.0 + 0.5, 0, 65535).astype(np.uint16),
        )
        np.testing.assert_array_equal(_read16(p_nat), dec_py)
    np.testing.assert_array_equal(
        dec_py, np.clip(img * 65535.0 + 0.5, 0, 65535).astype(np.uint16)
    )


def test_save_image_16bit_accepts_uint8_and_uint16(tmp_path):
    u8 = (np.arange(7 * 9 * 3, dtype=np.uint32) % 256).astype(
        np.uint8
    ).reshape(7, 9, 3)
    p = tmp_path / "u8.png"
    io.save_image(p, u8, bit_depth=16)
    np.testing.assert_array_equal(
        _read16(p), u8.astype(np.uint16) * 257
    )  # 255 -> 65535 exactly

    u16 = (np.arange(7 * 9 * 3, dtype=np.uint32) * 251 % 65536).astype(
        np.uint16
    ).reshape(7, 9, 3)
    p2 = tmp_path / "u16.png"
    io.save_image(p2, u16, bit_depth=16)
    np.testing.assert_array_equal(_read16(p2), u16)


def test_save_image_8bit_matches_quantisation(tmp_path):
    img = _content(19, 31)
    p = tmp_path / "out8.png"
    io.save_image(p, img, bit_depth=8)
    dec = cv2.imread(str(p), cv2.IMREAD_UNCHANGED)[..., ::-1]
    assert dec.dtype == np.uint8
    np.testing.assert_array_equal(
        dec, np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    )


def test_save_image_16bit_grayscale_expands(tmp_path):
    g = np.linspace(0.0, 1.0, 11 * 13, dtype=np.float32).reshape(11, 13)
    p = tmp_path / "g.png"
    io.save_image(p, g, bit_depth=16)
    dec = _read16(p)
    expect = np.clip(g * 65535.0 + 0.5, 0, 65535).astype(np.uint16)
    for c in range(3):
        np.testing.assert_array_equal(dec[..., c], expect)


def test_save_image_rejects_bad_depth_and_tiff(tmp_path):
    img = _content(5, 5)
    with pytest.raises(ValueError):
        io.save_image(tmp_path / "x.png", img, bit_depth=12)
    with pytest.raises(StackerIoError):
        io.save_image(tmp_path / "x.tif", img, bit_depth=16)


def test_16bit_roundtrip_through_imread_unchanged(tmp_path):
    # our own raw-depth reader (PIL) sees the full depth of single
    # values cv2 wrote -- and imread_rgb's documented 8-bit reduction
    # takes the high byte
    img = _content(9, 9)
    expect = np.clip(img * 65535.0 + 0.5, 0, 65535).astype(np.uint16)
    p = tmp_path / "rt.png"
    io.save_image(p, img, bit_depth=16)
    rgb8 = io.imread_rgb(p)
    assert rgb8.dtype == np.uint8
    np.testing.assert_array_equal(rgb8, (expect >> 8).astype(np.uint8))
