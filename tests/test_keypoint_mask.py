"""Masked ORB detection (cv2 ``detectAndCompute``'s mask) parity and
pipeline semantics.

OpenCV's per-level mask behaviour was pinned by black-box probing on a
half-plane mask (see ops/orb.py): the mask pyramid is resized
successively with INTER_LINEAR and re-binarised each level so only
fully-interior pixels survive (THRESH_TOZERO at 254), and keypoints
are filtered after FAST's NMS.
"""

import cv2
import jax.numpy as jnp
import numpy as np

from libstacker_tpu.models.keypoint import keypoint_match_arrays
from libstacker_tpu.ops import orb
from libstacker_tpu.params import KeyPointMatchParameters


def _textured(h=300, w=400, seed=3):
    rng = np.random.default_rng(seed)
    img = rng.random((h, w)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 1.2)
    return cv2.normalize(img, None, 0, 255, cv2.NORM_MINMAX).astype(
        np.uint8
    )


def _blob_mask(h, w, seed=9):
    rng = np.random.default_rng(seed)
    mask = np.full((h, w), 255, np.uint8)
    for _ in range(4):
        y, x = rng.integers(0, h - 60), rng.integers(0, w - 80)
        mask[y : y + rng.integers(30, 60), x : x + rng.integers(40, 80)] = 0
    return mask


def _mask_pyramid_levels(mask, nlevels=8, scale_factor=1.2):
    """The pinned OpenCV model in numpy: successive INTER_LINEAR resize
    + full-interior re-binarise per level."""
    h, w = mask.shape
    m = (mask > 0).astype(np.float32)
    out = [m.astype(bool)]
    prev = m
    for level in range(1, nlevels):
        s = scale_factor ** level
        lh, lw = int(round(h / s)), int(round(w / s))
        prev = cv2.resize(prev, (lw, lh), interpolation=cv2.INTER_LINEAR)
        prev = (np.rint(prev * 255.0) >= 255.0).astype(np.float32)
        out.append(prev.astype(bool))
    return out


def test_masked_keypoints_respect_mask_per_level():
    img = _textured()
    mask = _blob_mask(*img.shape)
    feats = orb.orb_detect_and_compute(jnp.asarray(img), mask=jnp.asarray(mask))
    valid = np.asarray(feats.valid)
    xy = np.asarray(feats.xy)[valid]
    octv = np.asarray(feats.octave)[valid]
    assert valid.sum() > 200
    levels = _mask_pyramid_levels(mask)
    for (x, y), o in zip(xy, octv):
        s = 1.2 ** int(o)
        lx, ly = int(round(x / s)), int(round(y / s))
        assert levels[int(o)][ly, lx], (x, y, o)


def test_masked_keypoints_overlap_cv2():
    """Statistical parity with cv2.ORB under the same mask (the
    unmasked detector already matches at this level — test_orb.py)."""
    img = _textured()
    mask = _blob_mask(*img.shape)
    feats = orb.orb_detect_and_compute(jnp.asarray(img), mask=jnp.asarray(mask))
    valid = np.asarray(feats.valid)
    xy = np.asarray(feats.xy)[valid]
    cv_orb = cv2.ORB_create()
    cv_kps = cv_orb.detect(img, mask)
    assert len(cv_kps) > 100
    cv_xy = np.array([k.pt for k in cv_kps], np.float32)
    d = np.linalg.norm(xy[:, None, :] - cv_xy[None, :, :], axis=-1)
    near = (d.min(axis=1) <= 2.0).mean()
    assert near > 0.6, f"only {near:.0%} of masked keypoints near cv2's"


def test_keypoint_pipeline_mask_defeats_static_overlay():
    """A static high-contrast overlay (same pixels in every frame)
    produces self-matches that vote for an identity homography; with
    the overlay masked, the pipeline recovers the true shifts."""
    rng = np.random.default_rng(31)
    h, w = 240, 320
    base = rng.random((h, w, 3)).astype(np.float32)
    base = cv2.GaussianBlur(base, (0, 0), 1.2)
    base = cv2.normalize(base, None, 0, 255, cv2.NORM_MINMAX).astype(
        np.uint8
    )
    shifts = [(0, 0), (6, -4), (-5, 7)]
    frames = np.stack([np.roll(base, s, axis=(0, 1)) for s in shifts])
    bh, bw = h // 2, w // 2
    y0, x0 = h // 4, w // 4
    overlay = ((rng.random((bh, bw, 3)) > 0.5) * 255).astype(np.uint8)
    overlay = cv2.GaussianBlur(overlay, (0, 0), 1.0)
    frames[:, y0 : y0 + bh, x0 : x0 + bw] = overlay
    mask = np.full((h, w), 255, np.uint8)
    mask[y0 : y0 + bh, x0 : x0 + bw] = 0

    params = KeyPointMatchParameters()
    dropped, out, stats = keypoint_match_arrays(
        frames, params, return_stats=True, mask=mask
    )
    assert dropped == 0
    # outside the overlay the masked stack matches frame 0 closely
    crop = np.s_[8 : y0 - 6, x0 + bw + 8 : w - 8]
    ref_f = frames[0].astype(np.float32) / 255.0
    err_m = np.abs(out[crop] - ref_f[crop]).mean()
    assert err_m < 0.04, err_m

    dropped_u, out_u = keypoint_match_arrays(frames, params)
    err_u = np.abs(out_u[crop] - ref_f[crop]).mean()
    # the unmasked pipeline is dominated by overlay self-matches
    # (identity homography -> ghosted stack) or drops frames
    assert (err_u > 2 * err_m) or dropped_u > 0, (err_m, err_u, dropped_u)


def test_pipeline_mask_scaled_path():
    rng = np.random.default_rng(37)
    h, w = 240, 320
    base = rng.random((h, w, 3)).astype(np.float32)
    base = cv2.GaussianBlur(base, (0, 0), 1.2)
    base = cv2.normalize(base, None, 0, 255, cv2.NORM_MINMAX).astype(
        np.uint8
    )
    frames = np.stack(
        [np.roll(base, s, axis=(0, 1)) for s in [(0, 0), (4, -3)]]
    )
    mask = np.full((h, w), 255, np.uint8)
    mask[h // 4 : 3 * h // 4, w // 4 : 3 * w // 4] = 0
    dropped, out = keypoint_match_arrays(
        frames, KeyPointMatchParameters(), scale_down_width=160.0,
        mask=mask,
    )
    assert dropped == 0
    assert out.shape == (h, w, 3)
