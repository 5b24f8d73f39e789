"""Hamming 2-NN matcher parity vs cv2.BFMatcher (SURVEY.md N1/N2)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from libstacker_tpu.ops import matcher


def _random_desc(rng, n):
    return rng.integers(0, 256, size=(n, 32), dtype=np.uint8)


def test_knn2_matches_bfmatcher(rng):
    q = _random_desc(rng, 64)
    t = _random_desc(rng, 96)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=False)
    knn = bf.knnMatch(q, t, k=2)
    res = matcher.knn_match2(
        jnp.asarray(q),
        jnp.asarray(t),
        jnp.ones(64, bool),
        jnp.ones(96, bool),
    )
    got_idx = np.asarray(res.train_idx)
    got_dist = np.asarray(res.distance)
    for i, m in enumerate(knn):
        assert len(m) == 2
        # distances must agree exactly; indices may differ only on ties
        assert got_dist[i, 0] == m[0].distance
        assert got_dist[i, 1] == m[1].distance
        if m[0].distance != m[1].distance:
            assert got_idx[i, 0] == m[0].trainIdx


def test_knn2_respects_train_mask(rng):
    q = _random_desc(rng, 16)
    t = _random_desc(rng, 32)
    tv = np.zeros(32, bool)
    tv[:8] = True
    res = matcher.knn_match2(
        jnp.asarray(q), jnp.asarray(t), jnp.ones(16, bool), jnp.asarray(tv)
    )
    assert np.asarray(res.train_idx).max() < 8


def test_ratio_filter_matches_reference_semantics(rng):
    q = _random_desc(rng, 128)
    t = _random_desc(rng, 128)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=False)
    knn = bf.knnMatch(q, t, k=2)
    ratio, keep_ratio = 0.95, 0.75
    # oracle: the reference's filter chain (src/lib.rs:221-236)
    filt = [m[0] for m in knn if len(m) == 2 and m[0].distance < ratio * m[1].distance]
    filt.sort(key=lambda m: m.distance)
    n_keep = int(np.floor(len(filt) * keep_ratio + 0.5))
    oracle_dists = sorted(m.distance for m in filt)[:n_keep]

    res = matcher.knn_match2(
        jnp.asarray(q), jnp.asarray(t), jnp.ones(128, bool), jnp.ones(128, bool)
    )
    out = matcher.ratio_filter_sort_keep(res, ratio, keep_ratio)
    kept = np.asarray(out.keep)
    dists = np.asarray(out.distance)[kept]
    assert int(out.count) == n_keep
    np.testing.assert_array_equal(np.sort(dists), np.array(oracle_dists))
