"""IO: native C++ loader vs PIL decode, file collection, batching."""

import numpy as np
import pytest
from PIL import Image

from libstacker_tpu.errors import NotEnoughFilesError, StackerIoError
from libstacker_tpu.utils import io, native_loader


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory, rng):
    d = tmp_path_factory.mktemp("imgs")
    for i in range(4):
        arr = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"frame{i}.png")
        if i == 0:
            Image.fromarray(arr).save(d / "skipme.txt.gif")
    Image.fromarray(
        rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    ).save(d / "frame_jpg.jpg", quality=95)
    return d


def test_collect_image_files(image_dir):
    files = io.collect_image_files(image_dir)
    names = [f.name for f in files]
    assert "skipme.txt.gif" not in names
    assert len(files) == 5


def test_load_frames_shapes(image_dir):
    files = sorted(image_dir.glob("frame*.png"))
    frames = io.load_frames(files)
    assert frames.shape == (4, 48, 64, 3)
    assert frames.dtype == np.uint8


def test_native_loader_matches_pil(image_dir):
    if not native_loader.available():
        pytest.skip("native loader not built")
    files = sorted(image_dir.glob("frame*.png"))
    nat = native_loader.load_frames_native(files)
    pil = io.load_frames(files, use_native=False)
    np.testing.assert_array_equal(nat, pil)


def test_native_loader_jpeg(image_dir):
    if not native_loader.available():
        pytest.skip("native loader not built")
    files = [image_dir / "frame_jpg.jpg"]
    nat = native_loader.load_frames_native(files)
    pil = io.load_frames(files, use_native=False)
    # independent JPEG decoders (libjpeg vs PIL's bundled libjpeg-turbo):
    # allow small IDCT differences
    assert nat.shape == pil.shape
    diff = np.abs(nat.astype(int) - pil.astype(int))
    assert diff.max() <= 2


def test_native_gray_matches_host(image_dir, rng):
    if not native_loader.available():
        pytest.skip("native loader not built")
    rgb = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        native_loader.rgb_to_gray_native(rgb), io.rgb_to_gray_u8_host(rgb)
    )


def test_native_loader_tiff(tmp_path, rng):
    if not native_loader.available():
        pytest.skip("native loader not built")
    paths = []
    want = []
    for i in range(3):
        arr = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
        p = tmp_path / f"f{i}.tif"
        Image.fromarray(arr).save(p)
        paths.append(p)
        want.append(arr)
    got = native_loader.load_frames_native(paths, 0)
    np.testing.assert_array_equal(got, np.stack(want))


def test_imread_16bit(tmp_path, rng):
    """16-bit PNG: imread_unchanged preserves uint16; imread_rgb scales
    to 8 bits by dropping the low byte (documented deviation — the
    reference's IMREAD_UNCHANGED passthrough fails downstream in OpenCV
    anyway, ref src/utils.rs:111-117)."""
    raw = rng.integers(0, 65536, size=(24, 36), dtype=np.uint16)
    p = tmp_path / "deep.png"
    Image.fromarray(raw, mode="I;16").save(p)
    u = io.imread_unchanged(p)
    assert u.dtype == np.uint16
    np.testing.assert_array_equal(u, raw)
    rgb = io.imread_rgb(p)
    assert rgb.dtype == np.uint8 and rgb.shape == (24, 36, 3)
    np.testing.assert_array_equal(rgb[..., 0], (raw >> 8).astype(np.uint8))
    # and a 16-bit burst loads end to end
    frames = io.load_frames([p, p])
    assert frames.shape == (2, 24, 36, 3)


def test_load_frames_empty():
    with pytest.raises(NotEnoughFilesError):
        io.load_frames([])


def test_load_frames_size_mismatch(image_dir, tmp_path, rng):
    odd = tmp_path / "odd.png"
    Image.fromarray(
        rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    ).save(odd)
    files = sorted(image_dir.glob("frame*.png"))[:1] + [odd]
    with pytest.raises(StackerIoError):
        io.load_frames(files)

def test_load_frames_accepts_directory(tmp_path):
    """A bare path argument means a directory of frames (or one file),
    never an iterable of one-character file names."""
    local = np.random.default_rng(7)
    for i in range(3):
        Image.fromarray(
            local.integers(0, 256, size=(16, 20, 3), dtype=np.uint8)
        ).save(tmp_path / f"f{i}.png")
    frames = io.load_frames(str(tmp_path))
    assert frames.shape == (3, 16, 20, 3)
    one = io.load_frames(str(tmp_path / "f0.png"))
    assert one.shape == (1, 16, 20, 3)
    empty = tmp_path / "emptydir"
    empty.mkdir()
    with pytest.raises(NotEnoughFilesError):
        io.load_frames(str(empty))
