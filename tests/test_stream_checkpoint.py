"""Checkpoint/resume tests for the streaming pipelines: an interrupted
run resumes from the last saved chunk and produces a BIT-IDENTICAL
result to an uninterrupted run (utils/checkpoint.py; SURVEY.md §5
checkpoint/resume — the reference's fold is all-or-nothing)."""

import numpy as np
import pytest
from PIL import Image

from libstacker_tpu import EccMatchParameters, MotionType
from libstacker_tpu.models.ecc import ecc_match_stream
from libstacker_tpu.models.keypoint import keypoint_match_stream
from libstacker_tpu.params import KeyPointMatchParameters
from libstacker_tpu.utils import io as io_mod


@pytest.fixture()
def burst_dir(tmp_path):
    rng = np.random.default_rng(33)
    h, w = 96, 128
    small = rng.integers(0, 256, (h // 8, w // 8), np.uint8)
    tex = small.repeat(8, 0).repeat(8, 1)
    d = tmp_path / "burst"
    d.mkdir()
    for i in range(6):
        f = np.roll(tex, i % 3, axis=1)
        Image.fromarray(np.stack([f] * 3, -1)).save(d / f"f{i}.png")
    return d


_ORIG_PREFETCH = io_mod.prefetched_chunks


class _Interrupter:
    """Wrap io.prefetched_chunks: record the start index of every run
    and optionally raise after ``limit`` yielded chunks."""

    def __init__(self, limit=None):
        self.limit = limit
        self.starts = []
        self._orig = _ORIG_PREFETCH

    def __call__(self, files, chunk_size, h, w, start=1, **kw):
        self.starts.append(start)
        inner = self._orig(files, chunk_size, h, w, start=start, **kw)

        def gen():
            for i, chunk in enumerate(inner):
                if self.limit is not None and i >= self.limit:
                    raise RuntimeError("simulated crash")
                yield chunk
            if self.limit is not None:
                raise RuntimeError("simulated crash")

        return gen()


def test_burst_key_sensitivity(tmp_path):
    from libstacker_tpu.utils.checkpoint import burst_key

    p = _ecc_params()
    base = burst_key(["a.png", "b.png"], p, None, 2, extra="ecc")
    assert base == burst_key(["a.png", "b.png"], p, None, 2, extra="ecc")
    assert base != burst_key(["a.png", "c.png"], p, None, 2, extra="ecc")
    assert base != burst_key(["a.png", "b.png"], p, 400.0, 2, extra="ecc")
    assert base != burst_key(["a.png", "b.png"], p, None, 4, extra="ecc")
    assert base != burst_key(["a.png", "b.png"], p, None, 2, extra="kp|0")
    m = np.zeros((4, 4), np.uint8)
    with_mask = burst_key(["a.png", "b.png"], p, None, 2, extra="ecc",
                          mask=m)
    assert base != with_mask
    m2 = m.copy()
    m2[0, 0] = 1
    assert with_mask != burst_key(["a.png", "b.png"], p, None, 2,
                                  extra="ecc", mask=m2)


def _ecc_params():
    return EccMatchParameters(
        motion_type=MotionType.Translation, max_count=40, epsilon=1e-4
    )


def test_ecc_stream_checkpoint_resume(burst_dir, tmp_path, monkeypatch):
    files = io_mod.collect_image_files(burst_dir)
    p = _ecc_params()
    ref = ecc_match_stream(files, p, chunk_size=2)

    ck = tmp_path / "ecc_ck.npz"
    crash = _Interrupter(limit=2)
    monkeypatch.setattr(io_mod, "prefetched_chunks", crash)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ecc_match_stream(
            files, p, chunk_size=2,
            checkpoint_path=ck, checkpoint_every=1,
        )
    assert ck.exists()

    resume = _Interrupter(limit=None)
    monkeypatch.setattr(io_mod, "prefetched_chunks", resume)
    out, stats = ecc_match_stream(
        files, p, chunk_size=2, checkpoint_path=ck, checkpoint_every=1,
        return_stats=True,
    )
    # the resumed run skipped the checkpointed chunk (start = 1 + 1*2)
    assert resume.starts == [3]
    np.testing.assert_array_equal(out, ref)
    assert not ck.exists()  # removed on success
    # stats cover EVERY frame, including the pre-crash checkpointed
    # chunk (iters/rho ride the checkpoint)
    assert stats.frames_total == 6
    assert len(stats.ecc_iterations) == 5
    assert len(stats.ecc_rho) == 5
    assert stats.frames_kept == 6 and stats.frames_dropped == 0


def test_ecc_stream_checkpoint_key_mismatch_restarts(
    burst_dir, tmp_path, monkeypatch
):
    files = io_mod.collect_image_files(burst_dir)
    ck = tmp_path / "ecc_ck.npz"
    crash = _Interrupter(limit=2)
    monkeypatch.setattr(io_mod, "prefetched_chunks", crash)
    with pytest.raises(RuntimeError):
        ecc_match_stream(
            files, _ecc_params(), chunk_size=2,
            checkpoint_path=ck, checkpoint_every=1,
        )
    assert ck.exists()

    # different parameters -> different burst key -> clean restart
    p2 = EccMatchParameters(
        motion_type=MotionType.Translation, max_count=40, epsilon=1e-3
    )
    fresh = _Interrupter(limit=None)
    monkeypatch.setattr(io_mod, "prefetched_chunks", fresh)
    out = ecc_match_stream(
        files, p2, chunk_size=2, checkpoint_path=ck, checkpoint_every=1
    )
    assert fresh.starts == [1]  # checkpoint ignored
    ref = ecc_match_stream(files, p2, chunk_size=2)
    np.testing.assert_array_equal(out, ref)


def test_ecc_stream_corrupt_checkpoint_ignored(
    burst_dir, tmp_path, monkeypatch
):
    files = io_mod.collect_image_files(burst_dir)
    ck = tmp_path / "ecc_ck.npz"
    ck.write_bytes(b"not an npz at all")
    fresh = _Interrupter(limit=None)
    monkeypatch.setattr(io_mod, "prefetched_chunks", fresh)
    out = ecc_match_stream(
        files, _ecc_params(), chunk_size=2,
        checkpoint_path=ck, checkpoint_every=1,
    )
    assert fresh.starts == [1]
    ref = ecc_match_stream(files, _ecc_params(), chunk_size=2)
    np.testing.assert_array_equal(out, ref)


def test_keypoint_stream_checkpoint_resume(burst_dir, tmp_path, monkeypatch):
    files = io_mod.collect_image_files(burst_dir)
    p = KeyPointMatchParameters()
    d_ref, ref = keypoint_match_stream(files, p, chunk_size=2, seed=7)

    ck = tmp_path / "kp_ck.npz"
    crash = _Interrupter(limit=2)
    monkeypatch.setattr(io_mod, "prefetched_chunks", crash)
    with pytest.raises(RuntimeError, match="simulated crash"):
        keypoint_match_stream(
            files, p, chunk_size=2, seed=7,
            checkpoint_path=ck, checkpoint_every=1,
        )
    assert ck.exists()

    resume = _Interrupter(limit=None)
    monkeypatch.setattr(io_mod, "prefetched_chunks", resume)
    d_out, out, stats = keypoint_match_stream(
        files, p, chunk_size=2, seed=7,
        checkpoint_path=ck, checkpoint_every=1, return_stats=True,
    )
    assert resume.starts == [3]
    # RNG replay makes the resumed run draw the same RANSAC hypotheses:
    # bit-identical result
    assert d_out == d_ref
    np.testing.assert_array_equal(out, ref)
    assert not ck.exists()
    # match/inlier stats cover every frame via the checkpoint
    assert stats.frames_total == 6
    assert len(stats.match_counts) == 5
    assert len(stats.inlier_counts) == 5
    assert all(c > 0 for c in stats.inlier_counts)
