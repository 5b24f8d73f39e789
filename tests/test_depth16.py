"""16-bit input-depth tests: uint16 bursts align identically to their
high-byte uint8 reduction (alignment runs on the 8-bit domain) while
stacking preserves the full depth — beyond the reference, whose OpenCV
stages assert 8-bit input (findTransformECC/ORB CV_8U asserts).
"""

import numpy as np
import pytest

from libstacker_tpu import (
    EccMatchParameters,
    KeyPointMatchParameters,
    MotionType,
)
from libstacker_tpu.errors import InvalidParamsError, StackerIoError
from libstacker_tpu.models.ecc import ecc_match_arrays
from libstacker_tpu.models.keypoint import keypoint_match_arrays
from libstacker_tpu.utils import io, native_loader


def _smooth_u16(h, w, seed):
    rng = np.random.default_rng(seed)
    base = rng.random((h, w)).astype(np.float32)
    for _ in range(3):
        base = (
            base
            + np.roll(base, 1, 0) + np.roll(base, -1, 0)
            + np.roll(base, 1, 1) + np.roll(base, -1, 1)
        ) / 5.0
    base -= base.min()
    base /= base.max() + 1e-9
    return (base * 65535).astype(np.uint16)


def _burst_u16(h=96, w=128, n=4, seed=11):
    """Integer-shift burst (no resampling aliasing) with live low bytes."""
    base = np.stack([_smooth_u16(h, w, seed + c) for c in range(3)], -1)
    return np.stack([np.roll(base, i, axis=1) for i in range(n)])


def test_ecc_u16_aligns_like_high_byte_and_stacks_at_depth():
    frames16 = _burst_u16()
    frames8 = (frames16 >> 8).astype(np.uint8)
    p = EccMatchParameters(
        motion_type=MotionType.Translation, max_count=60, epsilon=1e-4
    )
    out16, st16 = ecc_match_arrays(frames16, p, return_stats=True)
    out8, st8 = ecc_match_arrays(frames8, p, return_stats=True)
    # identical alignment: the u16 solve ran on the high-byte grey
    assert st16.ecc_iterations == st8.ecc_iterations
    np.testing.assert_allclose(st16.ecc_rho, st8.ecc_rho, rtol=0, atol=0)
    # same image up to 8-bit quantisation of the inputs
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out8),
                               atol=1.5 / 255.0)
    # and genuinely deeper: the u16 stack resolves low-byte structure
    # the u8 stack cannot (sub-8-bit quantisation error)
    err16 = np.abs(np.asarray(out16) - frames16[0] / 65535.0)
    err8 = np.abs(np.asarray(out8) - frames16[0] / 65535.0)
    # central crop (shifted borders differ)
    sl = (slice(8, -8), slice(8, -8))
    assert np.median(err16[sl]) < 0.5 * np.median(err8[sl]) + 1e-7


def test_ecc_u16_low_byte_gradient_survives():
    # structured high byte (so alignment converges) + a pure low-byte
    # gradient: the 16-bit stack must reproduce the full value exactly;
    # an 8-bit pipeline cannot see the gradient at all
    h, w = 64, 96
    hi = (_smooth_u16(h, w, 5) >> 8).astype(np.uint16) << 8
    grad = (np.arange(w, dtype=np.uint16) * 255 // (w - 1)).astype(np.uint16)
    base = hi + np.tile(grad, (h, 1))
    frames = np.stack([np.stack([base] * 3, -1)] * 3).astype(np.uint16)
    p = EccMatchParameters(
        motion_type=MotionType.Translation, max_count=30, epsilon=1e-3
    )
    out = np.asarray(ecc_match_arrays(frames, p))
    # identical frames, identity warp: the stack is the input value
    np.testing.assert_allclose(
        out[:, :, 0] * 65535.0, base.astype(np.float64), atol=0.75
    )
    # the 8-bit run flattens the low byte: its reconstruction error
    # on the 16-bit values spans the gradient's full range
    out8 = np.asarray(
        ecc_match_arrays((frames >> 8).astype(np.uint8), p)
    )
    err8 = np.abs(out8[:, :, 0] * 65535.0 - base.astype(np.float64))
    assert err8.max() > 200.0


def test_keypoint_u16_matches_high_byte_alignment():
    rng = np.random.default_rng(3)
    h, w = 120, 160
    small = rng.integers(0, 256, (h // 8, w // 8), np.uint8)
    tex = small.repeat(8, 0).repeat(8, 1).astype(np.uint16) << 8
    tex += rng.integers(0, 256, tex.shape).astype(np.uint16)  # live low byte
    frames16 = np.stack(
        [np.stack([np.roll(tex, i % 3, axis=1)] * 3, -1) for i in range(3)]
    )
    p = KeyPointMatchParameters()
    d16, out16 = keypoint_match_arrays(frames16, p, seed=5)
    d8, out8 = keypoint_match_arrays(
        (frames16 >> 8).astype(np.uint8), p, seed=5
    )
    assert d16 == d8
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out8),
                               atol=1.5 / 255.0)


def test_rejects_unsupported_dtypes():
    f = np.zeros((2, 32, 48, 3), np.float32)
    with pytest.raises(InvalidParamsError):
        ecc_match_arrays(
            f, EccMatchParameters(motion_type=MotionType.Translation)
        )
    with pytest.raises(InvalidParamsError):
        keypoint_match_arrays(f.astype(np.int32), KeyPointMatchParameters())


@pytest.mark.skipif(
    not native_loader.available16(),
    reason="native 16-bit decoder not built",
)
def test_load_frames_preserve_depth_native(tmp_path):
    rng = np.random.default_rng(21)
    a16 = rng.integers(0, 65536, (40, 56, 3), np.uint16).astype(np.uint16)
    b8 = rng.integers(0, 256, (40, 56, 3), np.uint8).astype(np.uint8)
    io.save_image(tmp_path / "a.png", a16, bit_depth=16)
    io.save_image(tmp_path / "b.png", b8, bit_depth=8)
    frames = io.load_frames(
        [tmp_path / "a.png", tmp_path / "b.png"], preserve_depth=True
    )
    assert frames.dtype == np.uint16 and frames.shape == (2, 40, 56, 3)
    np.testing.assert_array_equal(frames[0], a16)
    np.testing.assert_array_equal(frames[1], b8.astype(np.uint16) * 257)
    # default load of the same files is the high-byte reduction
    f8 = io.load_frames([tmp_path / "a.png", tmp_path / "b.png"])
    assert f8.dtype == np.uint8
    np.testing.assert_array_equal(f8[0], (a16 >> 8).astype(np.uint8))
    np.testing.assert_array_equal(f8[1], b8)


@pytest.mark.skipif(
    not native_loader.available16(),
    reason="native 16-bit decoder not built",
)
def test_load_frames_preserve_depth_tiff16(tmp_path):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(9)
    a16 = rng.integers(0, 65536, (33, 47, 3), np.uint16).astype(np.uint16)
    assert cv2.imwrite(str(tmp_path / "a.tif"), a16[..., ::-1])  # BGR
    frames = io.load_frames([tmp_path / "a.tif"], preserve_depth=True)
    assert frames.dtype == np.uint16
    np.testing.assert_array_equal(frames[0], a16)


def test_load_frames_preserve_depth_pil_fallback(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(17)
    g16 = rng.integers(0, 65536, (28, 36), np.uint16).astype(np.uint16)
    Image.fromarray(g16).save(tmp_path / "g.png")  # mode I;16
    frames = io.load_frames(
        [tmp_path / "g.png"], preserve_depth=True, use_native=False
    )
    assert frames.dtype == np.uint16
    for c in range(3):
        np.testing.assert_array_equal(frames[0, :, :, c], g16)

    # 16-bit RGB without the native decoder must refuse, not reduce
    rgb16 = rng.integers(0, 65536, (28, 36, 3), np.uint16).astype(np.uint16)
    io.save_image(tmp_path / "rgb.png", rgb16, bit_depth=16)
    with pytest.raises(StackerIoError):
        io.load_frames(
            [tmp_path / "rgb.png"], preserve_depth=True, use_native=False
        )


def test_preserve_depth_refuses_16bit_rgb_tiff_without_native(tmp_path):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(8)
    a16 = rng.integers(0, 65536, (24, 30, 3), np.uint16).astype(np.uint16)
    assert cv2.imwrite(str(tmp_path / "a.tif"), a16[..., ::-1])
    with pytest.raises(StackerIoError):
        io.load_frames(
            [tmp_path / "a.tif"], preserve_depth=True, use_native=False
        )
