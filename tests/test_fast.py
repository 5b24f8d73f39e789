"""FAST-9/16 detector parity vs cv2.FastFeatureDetector (SURVEY.md N4)."""

import cv2
import jax.numpy as jnp
import numpy as np

from libstacker_tpu.ops import fast


def _textured(rng, h=120, w=160):
    small = rng.integers(0, 256, size=(h // 8, w // 8), dtype=np.uint8)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)


def test_fast_matches_cv2(rng):
    img = _textured(rng)
    det = cv2.FastFeatureDetector_create(
        threshold=20, nonmaxSuppression=True,
        type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16,
    )
    kps = det.detect(img)
    cv_set = {(int(k.pt[0]), int(k.pt[1])): k.response for k in kps}

    mask, score = fast.fast_detect(jnp.asarray(img), 20)
    mask = np.asarray(mask)
    score = np.asarray(score)
    ys, xs = np.nonzero(mask)
    our_set = {(int(x), int(y)): score[y, x] for y, x in zip(ys, xs)}

    # cv2 FAST only scans y in [3, h-3); our implementation the same.
    missing = set(cv_set) - set(our_set)
    extra = set(our_set) - set(cv_set)
    assert not missing, f"missing {len(missing)} of {len(cv_set)}: {sorted(missing)[:5]}"
    assert not extra, f"extra {len(extra)}: {sorted(extra)[:5]}"
    for p, r in cv_set.items():
        assert our_set[p] == r, (p, our_set[p], r)


def test_fast_no_nms_superset(rng):
    img = _textured(rng)
    det = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=False)
    kps = det.detect(img)
    cv_set = {(int(k.pt[0]), int(k.pt[1])) for k in kps}
    mask, _ = fast.fast_detect(jnp.asarray(img), 20, nonmax=False)
    ys, xs = np.nonzero(np.asarray(mask))
    our_set = {(int(x), int(y)) for y, x in zip(ys, xs)}
    assert cv_set == our_set
