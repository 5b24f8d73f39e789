"""ORB detector/descriptor statistical parity vs cv2.ORB (SURVEY.md N4).

Exact keypoint-set equality is not expected (sub-pixel resize and
atan2-vs-fastAtan2 differences shuffle rankings); we assert strong
statistical agreement, which is what the keypoint_match pipeline needs
(SURVEY.md §7 phase 5)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libstacker_tpu.ops import orb


@pytest.fixture(scope="module")
def textured(rng):
    small = rng.integers(0, 256, size=(40, 50), dtype=np.uint8)
    img = cv2.resize(small, (400, 320), interpolation=cv2.INTER_NEAREST)
    return cv2.GaussianBlur(img, (3, 3), 0.8)


def test_orb_keypoints_overlap_cv2(textured):
    feats = orb.orb_detect_and_compute(jnp.asarray(textured))
    valid = np.asarray(feats.valid)
    xy = np.asarray(feats.xy)[valid]
    assert valid.sum() > 200

    cv_orb = cv2.ORB_create()
    cv_kps = cv_orb.detect(textured)
    cv_xy = np.array([k.pt for k in cv_kps])
    # fraction of our keypoints with a cv2 keypoint within 2px
    d = np.linalg.norm(xy[:, None, :] - cv_xy[None, :, :], axis=-1)
    near = (d.min(axis=1) < 2.0).mean()
    assert near > 0.6, f"only {near:.0%} of our keypoints near a cv2 keypoint"


def test_orb_descriptors_match_cv2_at_same_keypoints(textured):
    """Feed OUR keypoint locations to cv2.ORB.compute and compare bits."""
    feats = orb.orb_detect_and_compute(jnp.asarray(textured))
    valid = np.asarray(feats.valid)
    xy = np.asarray(feats.xy)
    ang = np.asarray(feats.angle)
    octv = np.asarray(feats.octave)
    desc = np.asarray(feats.descriptors)

    # only level-0 keypoints: provided-keypoint octaves rescale otherwise
    sel = np.nonzero(valid & (octv == 0))[0][:80]
    assert len(sel) >= 30
    cv_orb = cv2.ORB_create()
    kps = [
        cv2.KeyPoint(float(xy[i, 0]), float(xy[i, 1]), 31.0, float(ang[i]), 0.0, 0)
        for i in sel
    ]
    kps_out, cv_desc = cv_orb.compute(textured, kps)
    assert cv_desc.shape[0] == len(sel)
    ham = np.array(
        [
            np.unpackbits(desc[i] ^ cv_desc[j]).sum()
            for j, i in enumerate(sel)
        ]
    )
    # identical angles + recovered pattern => near-identical descriptors
    assert np.median(ham) <= 8, f"median Hamming {np.median(ham)}"
    assert (ham <= 24).mean() > 0.8


def test_orb_angles_match_cv2(textured):
    """Orientation parity: compare our IC angle with cv2's at shared
    detections (fastAtan2 approximation allows ~0.5 deg)."""
    feats = orb.orb_detect_and_compute(jnp.asarray(textured))
    valid = np.asarray(feats.valid)
    octv = np.asarray(feats.octave)
    xy = np.asarray(feats.xy)
    ang = np.asarray(feats.angle)

    cv_orb = cv2.ORB_create()
    cv_kps = cv_orb.detect(textured)
    cv_map = {}
    for k in cv_kps:
        if k.octave == 0:
            cv_map[(round(k.pt[0]), round(k.pt[1]))] = k.angle
    checked = 0
    diffs = []
    for i in np.nonzero(valid & (octv == 0))[0]:
        key = (round(xy[i, 0]), round(xy[i, 1]))
        if key in cv_map:
            d = abs(ang[i] - cv_map[key]) % 360
            diffs.append(min(d, 360 - d))
            checked += 1
    assert checked >= 20
    assert np.median(diffs) < 0.5, f"median angle diff {np.median(diffs)}"


def test_orb_batched_vmap(textured):
    batch = jnp.stack([jnp.asarray(textured)] * 2)
    feats = jax.vmap(orb.orb_detect_and_compute)(batch)
    assert feats.descriptors.shape[0] == 2
    np.testing.assert_array_equal(
        np.asarray(feats.descriptors[0]), np.asarray(feats.descriptors[1])
    )
