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