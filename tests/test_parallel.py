"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §2c: DP-over-frames with psum; §5: spatial halo exchange)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libstacker_tpu.ops import color, sharpness
from libstacker_tpu.params import MotionType
from libstacker_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def burst(rng):
    h, w = 64, 80
    base = cv2.GaussianBlur(
        (rng.random((h * 2, w * 2)) * 255).astype(np.uint8), (0, 0), 3.0
    )
    frames = []
    for i in range(8):
        dx, dy = rng.uniform(-2, 2, 2)
        m = np.array([[1, 0, dx], [0, 1, dy]], np.float32)
        cur = cv2.warpAffine(
            base, m, (w * 2, h * 2), flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP
        )[h // 2 : h // 2 + h, w // 2 : w // 2 + w]
        frames.append(np.stack([cur] * 3, -1))
    return np.stack(frames)


def test_mesh_requires_8_devices():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"


def test_sharded_ecc_stack_matches_unsharded(burst):
    m = pmesh.make_mesh(data=4, spatial=2)
    ref_grey = color.rgb_to_gray_u8(jnp.asarray(burst[0])).astype(jnp.float32)
    frames_j = pmesh.shard_frames(jnp.asarray(burst), m)
    stacked, ok = pmesh.ecc_stack_step(
        frames_j, ref_grey, m,
        motion_type=MotionType.Translation, num_iters=10, eps=1e-4,
    )
    assert np.asarray(ok).all()

    # unsharded oracle: same program on one device
    m1 = pmesh.make_mesh(jax.devices()[:1], data=1, spatial=1)
    stacked1, ok1 = pmesh.ecc_stack_step(
        jnp.asarray(burst), ref_grey, m1,
        motion_type=MotionType.Translation, num_iters=10, eps=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(stacked), np.asarray(stacked1), atol=1e-5
    )


def test_spatial_sharpness_matches_dense(burst):
    m = pmesh.make_mesh(data=4, spatial=2)
    greys = color.rgb_to_gray_u8(jnp.asarray(burst)).astype(jnp.float32)
    got = np.asarray(pmesh.sharpness_teng_spatial(greys, m))
    expected = np.asarray(sharpness.sharpness_tenengrad(greys, 3))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_warp_rows_sharded_matches_dense(rng):
    """Row-sharded warp with ppermute halo exchange equals the dense
    single-device warp for in-halo-domain motions (small rotation +
    shift), including the global top/bottom border behavior."""
    from libstacker_tpu.ops import warp

    h, w = 256, 320
    img = cv2.GaussianBlur(
        (rng.random((h, w)) * 255).astype(np.float32), (0, 0), 2.0
    )
    rot = cv2.getRotationMatrix2D((w / 2.0, h / 2.0), 1.0, 1.002)
    rot[0, 2] += 3.5
    rot[1, 2] -= 12.0  # pushes rows across shard boundaries
    m3 = np.vstack([rot, [0, 0, 1]]).astype(np.float32)

    dense = np.asarray(
        warp.warp_perspective(jnp.asarray(img), jnp.asarray(m3), (h, w))
    )
    m = pmesh.make_mesh(jax.devices(), data=2, spatial=4)
    img_sharded = jax.device_put(
        jnp.asarray(img),
        jax.sharding.NamedSharding(m, jax.sharding.PartitionSpec("spatial")),
    )
    with m:
        got = np.asarray(
            pmesh.warp_rows_sharded(img_sharded, jnp.asarray(m3), m, halo=32)
        )
    diff = np.abs(got - dense)
    # f32 matrix-composition rounding can flip rare 1/32-bin taps
    assert (diff > 1e-4).mean() < 1e-3, (diff > 1e-4).mean()
    assert diff.max() < 3.0
