"""Pallas warp kernel logic tests (interpret mode — runs on CPU).

On TPU the kernel is bit-identical to the gather path (verified on
hardware); interpret mode checks the same tile/window/shift logic in CI.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libstacker_tpu.ops import warp, warp_pallas


@pytest.fixture(scope="module")
def img(rng):
    return cv2.GaussianBlur(
        rng.random((192, 512)).astype(np.float32), (0, 0), 2.0
    )


def _compare(img, m3, frac=0.0, **kw):
    got = np.asarray(
        warp_pallas.warp_bilinear_pallas(
            jnp.asarray(img)[None], jnp.asarray(m3, jnp.float32)[None],
            interpret=True, **kw,
        )[0]
    )
    ref = np.asarray(
        warp.warp_perspective(
            jnp.asarray(img), jnp.asarray(m3, jnp.float32),
            (img.shape[0], img.shape[1]), inverse_map=True,
        )
    )
    diff = np.abs(got - ref)
    # identical quantisation; rare f32 op-order flips at exact 1/32-bin
    # boundaries are bounded by one interpolation step
    assert (diff > 1e-5).mean() <= frac, f"{(diff > 1e-5).mean()} off"
    assert diff.max() < (0.02 if frac else 1e-5), diff.max()


def test_identity(img):
    _compare(img, np.eye(3))


def test_translation(img):
    m = np.eye(3); m[0, 2] = 17.25; m[1, 2] = -4.5
    _compare(img, m)


def test_rotation_scale_perspective(img):
    m = cv2.getRotationMatrix2D((256.0, 96.0), 1.4, 1.01)
    m3 = np.vstack([m, [1e-6, -2e-6, 1.0]])
    _compare(img, m3, frac=1e-3)


def test_large_translation_outside(img):
    # shifts a large region out of the image: border-constant zeros
    m = np.eye(3); m[0, 2] = 300.0; m[1, 2] = 150.0
    _compare(img, m)


def test_border_value(img):
    m = np.eye(3); m[0, 2] = -40.0
    got = np.asarray(
        warp_pallas.warp_bilinear_pallas(
            jnp.asarray(img)[None], jnp.asarray(m, jnp.float32)[None],
            border_value=0.25, interpret=True,
        )[0]
    )
    # columns x < 40 sample sx = x - 40 < 0 -> border value
    np.testing.assert_allclose(got[:, :39], 0.25, atol=1e-6)


def test_shared_source_indirection(img):
    img2 = img[::-1].copy()
    srcs = jnp.stack([jnp.asarray(img), jnp.asarray(img2)])
    m = np.eye(3, dtype=np.float32)
    m3 = jnp.asarray(np.stack([m, m, m]))
    idx = jnp.asarray([1, 0, 1], jnp.int32)
    out = np.asarray(
        warp_pallas.warp_bilinear_pallas(
            srcs, m3, src_index=idx, interpret=True
        )
    )
    np.testing.assert_allclose(out[0], img2, atol=1e-6)
    np.testing.assert_allclose(out[1], img, atol=1e-6)
    np.testing.assert_allclose(out[2], img2, atol=1e-6)


@pytest.mark.parametrize("shape", [(192, 400), (161, 512), (97, 391)])
def test_non_aligned_sizes(rng, shape):
    """Regression: sizes with h % 8 != 0 or w % 128 != 0 used to read
    roll-wrapped garbage at the right/bottom edges (the clipped-and-
    floored window origin could not cover the last w % 128 columns).
    The source is now padded to aligned extents internally."""
    im = cv2.GaussianBlur(
        rng.random(shape).astype(np.float32), (0, 0), 2.0
    )
    if shape[0] < 160:  # below the window minimum for the default tile?
        # 97 rows: hp=104 < wh=152 -> must raise cleanly, not corrupt
        with pytest.raises(ValueError):
            warp_pallas.warp_bilinear_pallas(
                jnp.asarray(im)[None], jnp.eye(3, dtype=jnp.float32)[None],
                interpret=True,
            )
        return
    _compare(im, np.eye(3))
    m = np.eye(3); m[0, 2] = 5.75; m[1, 2] = -3.25
    _compare(im, m)
    m = cv2.getRotationMatrix2D((shape[1] / 2.0, shape[0] / 2.0), 0.9, 1.004)
    _compare(im, np.vstack([m, [0, 0, 1]]), frac=1e-3)


def test_non_aligned_warp3(rng):
    """The fused 3-source kernel at a non-aligned size (192x400)."""
    im = cv2.GaussianBlur(rng.random((192, 400)).astype(np.float32), (0, 0), 2.0)
    srcs = jnp.stack([jnp.asarray(im), jnp.asarray(im) * 0.5,
                      jnp.asarray(im[::-1].copy())])
    m = cv2.getRotationMatrix2D((200.0, 96.0), 0.6, 1.0)
    m[0, 2] += 2.5
    m3 = jnp.asarray(np.vstack([m, [0, 0, 1]]).astype(np.float32))[None]
    out = np.asarray(warp_pallas.warp3_bilinear_pallas(srcs, m3, interpret=True))
    for c in range(3):
        ref = np.asarray(
            warp.warp_perspective(srcs[c], m3[0], (192, 400), inverse_map=True)
        )
        diff = np.abs(out[0, c] - ref)
        assert (diff > 1e-5).mean() <= 1e-3
        assert diff.max() < 0.02


def test_prepadded_true_hw(rng):
    """Pre-padded source + true_hw must equal the internally-padded path."""
    im = cv2.GaussianBlur(rng.random((192, 400)).astype(np.float32), (0, 0), 2.0)
    m = np.eye(3, dtype=np.float32); m[0, 2] = 7.5
    auto = np.asarray(
        warp_pallas.warp_bilinear_pallas(
            jnp.asarray(im)[None], jnp.asarray(m)[None], interpret=True
        )[0]
    )
    pad = np.zeros((192, 512), np.float32)
    pad[:, :400] = im
    pre = np.asarray(
        warp_pallas.warp_bilinear_pallas(
            jnp.asarray(pad)[None], jnp.asarray(m)[None],
            interpret=True, true_hw=(192, 400),
        )[0]
    )
    assert pre.shape == (192, 400)
    np.testing.assert_array_equal(auto, pre)


def test_residual_domain_ok():
    """Kernel-domain check: translations of any size and small rotations
    pass; large rotations, strong perspective, and non-finite matrices
    fail (they would silently clip to the border inside the kernel)."""
    h, w = 2160, 3840

    def rot(deg, persp=0.0):
        m = cv2.getRotationMatrix2D((w / 2.0, h / 2.0), deg, 1.0)
        return np.vstack([m, [persp, 0, 1]]).astype(np.float32)

    big_t = np.eye(3, dtype=np.float32)
    big_t[0, 2] = 500.0
    big_t[1, 2] = -300.0
    mats = np.stack([
        np.eye(3, dtype=np.float32),  # identity: ok
        big_t,                        # huge translation: ok (variation 0)
        rot(1.0),                     # 1 deg rotation: ok at k=7
        rot(10.0),                    # 10 deg: out of domain
        rot(0.0, persp=1e-4),         # strong perspective: out of domain
        np.full((3, 3), np.nan, np.float32),  # non-finite: out
    ])
    got = np.asarray(
        warp_pallas.residual_domain_ok(jnp.asarray(mats), h, w, k=7)
    )
    np.testing.assert_array_equal(
        got, [True, True, True, False, False, False]
    )
    # numpy host path agrees
    got_np = warp_pallas.residual_domain_ok(mats, h, w, k=7, xp=np)
    np.testing.assert_array_equal(np.asarray(got_np), got)


def test_pallas_domain_ok_host():
    from libstacker_tpu.ops import warp_batch

    h, w = 2160, 3840
    m = cv2.getRotationMatrix2D((w / 2.0, h / 2.0), 0.5, 1.0)
    good = np.vstack([m, [0, 0, 1]]).astype(np.float64)[None]
    bad = good.copy()
    bad[0, 0, 0] = np.nan
    singular = np.zeros((1, 3, 3))
    # on CPU CI _pallas_usable is False -> always False (kernel unused);
    # the matrix-level check still runs through residual_domain_ok above
    res = warp_batch.pallas_domain_ok_host(good, h, w)
    assert res in (True, False)
    assert warp_batch.pallas_domain_ok_host(bad, h, w) is False
    assert warp_batch.pallas_domain_ok_host(singular, h, w) is False


def test_warp3_matches_single_source(img):
    """The fused 3-source kernel (ECC inner-loop path) must match three
    independent single-source warps."""
    srcs = jnp.stack(
        [jnp.asarray(img), jnp.asarray(img) * 0.5, jnp.asarray(img[::-1].copy())]
    )
    ms = []
    for i in range(2):
        m = cv2.getRotationMatrix2D((256.0, 96.0), 0.4 * i, 1.0)
        m[0, 2] += 1.5 * i
        ms.append(np.vstack([m, [0, 0, 1]]).astype(np.float32))
    m3 = jnp.asarray(np.stack(ms))
    out = np.asarray(
        warp_pallas.warp3_bilinear_pallas(srcs, m3, interpret=True)
    )
    assert out.shape == (2, 3, img.shape[0], img.shape[1])
    for b in range(2):
        for c in range(3):
            ref = np.asarray(
                warp_pallas.warp_bilinear_pallas(
                    srcs[c][None], m3[b][None], interpret=True
                )[0]
            )
            np.testing.assert_allclose(out[b, c], ref, atol=1e-6)


@pytest.mark.parametrize(
    "border", ["replicate", "reflect", "reflect101", "wrap", "transparent"]
)
def test_warp_frames_batch_border_modes_kernel(border, monkeypatch):
    """Non-constant border modes through the Pallas kernel (apron-
    extended source, r2 VERDICT item 4) match the XLA borderInterpolate
    path.  The integer apron shift commutes exactly with the 1/32
    coordinate quantisation; the residual tolerance here is the known
    interpret-mode artifact (CPU FMA fusion perturbs f32 coordinates at
    1/32-bin boundaries, flipping isolated pixels by one interpolation
    step — same allowance as the fused-ECC tests; on-hardware parity is
    machine-checked by bench.py)."""
    from libstacker_tpu.ops import warp as warp_ops
    from libstacker_tpu.ops import warp_batch

    rng = np.random.default_rng(45)  # local: see conftest rng note
    h, w = 192, 512
    img = cv2.GaussianBlur(
        (rng.random((h, w, 3)) * 255).astype(np.float32), (0, 0), 1.2
    )
    # rotation + a shift large enough to pull edge samples out of the
    # source (exercises the apron), still inside the k=7 domain
    m = cv2.getRotationMatrix2D((w / 2.0, h / 2.0), 0.8, 1.0)
    m[0, 2] += 25.0
    m[1, 2] -= 17.0
    m3 = np.vstack([m, [0, 0, 1]]).astype(np.float32)
    mats = jnp.asarray(m3)[None]
    frames = jnp.asarray(img)[None]

    want = np.asarray(
        jax.vmap(
            lambda f, mm: warp_ops.warp_perspective(
                f, mm, (h, w), border_mode=border, border_value=0.0
            )
        )(frames, mats)
    )

    monkeypatch.setenv("LIBSTACKER_FORCE_PALLAS", "1")
    monkeypatch.setenv("LIBSTACKER_WARP_INTERPRET", "1")
    k = warp_batch.pallas_pick_k(np.asarray(mats), h, w)
    assert k is not None
    apron = 0
    if border in warp_batch._PAD_MODES:
        apron = warp_batch.pallas_required_apron(np.asarray(mats), h, w, k)
        assert apron is not None and 0 < apron <= 64
    got = np.asarray(
        warp_batch.warp_frames_batch(
            frames, mats, perspective=True, border_value=0.0,
            allow_pallas=True, pallas_k=k, border_mode=border, apron=apron,
        )
    )
    d = np.abs(got - want)
    # isolated 1-bin coordinate flips move a pixel by at most one
    # interpolation step (< 1.5 grey levels on this smooth texture)
    assert d.max() < 1.5, d.max()
    assert (d > 0.05).mean() < 2e-3, (d > 0.05).mean()
    # the border-extended region itself (source coords outside the
    # image) must agree — this is where the modes differ
    minv = np.linalg.inv(m3.astype(np.float64))
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    den = minv[2, 0] * xs + minv[2, 1] * ys + minv[2, 2]
    sx = (minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]) / den
    sy = (minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]) / den
    outside = (sx < 0) | (sx > w - 1) | (sy < 0) | (sy > h - 1)
    assert outside.any()
    assert d[0][outside].max() < 1.5


def test_warp_kernel_k1_parity(img):
    """k=1 band (near-pure-translation fast path, 36-tap loop): exact
    parity with the XLA path for a small shift inside the band."""
    h, w = img.shape
    m = np.eye(3, dtype=np.float32)
    m[0, 2], m[1, 2] = 30.4, -17.6
    minv = np.linalg.inv(m)
    want = np.asarray(
        warp.warp_perspective(
            jnp.asarray(img), jnp.asarray(m), (h, w), inverse_map=False
        )
    )
    pad_h = ((h + 7) // 8) * 8
    pad_w = ((w + 127) // 128) * 128
    im = np.zeros((pad_h, pad_w), np.float32)
    im[:h, :w] = img
    got = np.asarray(
        warp_pallas.warp_bilinear_pallas(
            jnp.asarray(im)[None], jnp.asarray(minv)[None], k=1,
            interpret=True, true_hw=(h, w),
        )[0]
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize(
    "ang,k,rows",
    [(8.0, 15, 64), (16.0, 23, 32)],
)
def test_large_rotation_shrunk_tiles(img, ang, k, rows):
    """Large legitimate rotations (beyond the 128x128 tile's per-axis
    ~6.4 deg ceiling at k=7) stay at kernel speed on the tile-shrink
    rungs: the in-tile residual spread scales with the tile extents, so
    (15, 64) covers to ~12.7 deg and (23, 32) to ~20 deg.  Parity vs
    the XLA path, and the dispatch ladder must actually pick the
    expected shrunk-tile rung."""
    import os

    from libstacker_tpu.ops import warp_batch

    h, w = img.shape
    m = cv2.getRotationMatrix2D((w / 2.0, h / 2.0), ang, 1.0)
    m3 = np.vstack([m, [0, 0, 1]]).astype(np.float32)
    os.environ["LIBSTACKER_FORCE_PALLAS"] = "1"
    try:
        picked = warp_batch.pallas_pick_config(m3[None], h, w)
    finally:
        del os.environ["LIBSTACKER_FORCE_PALLAS"]
    assert picked == (k, rows), picked
    _compare(img, np.linalg.inv(m3), frac=2e-3, k=k, tile=(rows, 128))


def test_wide_tile_cols_env(img, rng, monkeypatch):
    """LIBSTACKER_WARP_TILE_COLS=256 (column-DMA amortisation knob):
    kernel parity at the wide tile, consistent dispatch (the domain
    check and the warp geometry resolve the same columns), and the
    shrunk-row rungs keep 128 cols (wide columns would undo their
    extended rotation coverage)."""
    from libstacker_tpu.ops import warp_batch

    monkeypatch.setenv("LIBSTACKER_WARP_TILE_COLS", "256")
    monkeypatch.setenv("LIBSTACKER_FORCE_PALLAS", "1")
    # in-band at (128,256)/k=1: the per-axis in-tile spread scales with
    # tile extent, so the wide tile needs a gentler motion
    m = cv2.getRotationMatrix2D((256.0, 96.0), 0.15, 1.001)
    m3 = np.vstack([m, [0, 0, 1]]).astype(np.float32)
    h, w = img.shape
    assert warp_batch.pallas_domain_ok_host(
        m3[None], h, w, k=1, tile=(128, 256)
    )
    _compare(img, np.linalg.inv(m3), frac=2e-3, k=1, tile=(128, 256))

    wp = 512
    assert warp_batch._warp_tile_cols(wp, 128) == 256
    assert warp_batch._warp_tile_cols(wp, 64) == 128  # shrunk rung
    assert warp_batch._warp_tile_cols(384, 128) == 128  # too narrow
    with pytest.raises(ValueError):
        monkeypatch.setenv("LIBSTACKER_WARP_TILE_COLS", "200")
        warp_batch._warp_tile_cols(wp, 128)

    # end-to-end through warp_accumulate_rgb (fused accum kernel) at
    # the wide tile, vs the unfused 128-col reference
    monkeypatch.setenv("LIBSTACKER_WARP_TILE_COLS", "256")
    monkeypatch.setenv("LIBSTACKER_WARP_INTERPRET", "1")
    burst = jnp.asarray(
        np.stack([np.stack([img] * 3, -1)] * 3).astype(np.float32)
    )
    fw = np.linalg.inv(m3).astype(np.float32)
    mats = jnp.asarray(np.stack([np.eye(3, dtype=np.float32), fw, fw]))
    oks = jnp.asarray([True, True, False])
    got = np.asarray(warp_batch.warp_accumulate_rgb(
        burst, mats, oks, perspective=True, allow_pallas=True, pallas_k=1,
    ))
    monkeypatch.delenv("LIBSTACKER_WARP_TILE_COLS")
    ref = np.asarray(warp_batch.warp_accumulate_rgb(
        burst, mats, oks, perspective=True, allow_pallas=True, pallas_k=1,
    ))
    assert np.array_equal(got, ref)
