import jax.numpy as jnp
import numpy as np
import pytest

from simpb_tpu.core import box3d
from simpb_tpu.core.box3d import (
    COS_YAW,
    SIN_YAW,
    VX,
    X,
    Y,
    Z,
)


def random_anchor(rng, bs=2, n=5):
    a = rng.normal(size=(bs, n, 11)).astype(np.float32)
    # keep sizes sane and yaw normalised
    a[..., 3:6] = rng.uniform(-1, 1, size=(bs, n, 3))
    yaw = rng.uniform(-np.pi, np.pi, size=(bs, n))
    a[..., SIN_YAW] = np.sin(yaw)
    a[..., COS_YAW] = np.cos(yaw)
    return a


def test_decode_encode_roundtrip():
    rng = np.random.default_rng(0)
    anchor = random_anchor(rng)
    decoded = box3d.decode_box(jnp.asarray(anchor))
    reencoded = box3d.encode_box(decoded)
    np.testing.assert_allclose(np.asarray(reencoded), anchor, atol=1e-4)


def test_decode_box_values():
    anchor = np.zeros((1, 1, 11), dtype=np.float32)
    anchor[0, 0, :3] = [1.0, 2.0, 3.0]
    anchor[0, 0, 3:6] = np.log([4.0, 5.0, 6.0])
    anchor[0, 0, SIN_YAW] = np.sin(0.3)
    anchor[0, 0, COS_YAW] = np.cos(0.3)
    anchor[0, 0, VX:] = [0.1, 0.2, 0.3]
    out = np.asarray(box3d.decode_box(jnp.asarray(anchor)))[0, 0]
    np.testing.assert_allclose(out[:3], [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(out[3:6], [4, 5, 6], rtol=1e-5)
    np.testing.assert_allclose(out[6], 0.3, atol=1e-6)
    np.testing.assert_allclose(out[7:], [0.1, 0.2, 0.3], atol=1e-6)


def test_anchor_projection_identity_keeps_center():
    rng = np.random.default_rng(1)
    anchor = random_anchor(rng)
    T = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    out = np.asarray(
        box3d.anchor_projection(jnp.asarray(anchor), jnp.asarray(T))
    )
    np.testing.assert_allclose(out[..., :6], anchor[..., :6], atol=1e-6)
    # Reference yaw-layout quirk (detection3d/blocks.py:274-278): under the
    # identity transform the SIN_YAW slot now holds cos(yaw) and vice versa.
    np.testing.assert_allclose(
        out[..., SIN_YAW], anchor[..., COS_YAW], atol=1e-6
    )
    np.testing.assert_allclose(
        out[..., COS_YAW], anchor[..., SIN_YAW], atol=1e-6
    )
    np.testing.assert_allclose(out[..., VX:], anchor[..., VX:], atol=1e-6)


def test_anchor_projection_translation_and_velocity():
    anchor = np.zeros((1, 1, 11), dtype=np.float32)
    anchor[0, 0, :3] = [1.0, 0.0, 0.0]
    anchor[0, 0, VX:] = [2.0, 0.0, 0.0]
    anchor[0, 0, COS_YAW] = 1.0
    T = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1))
    T[0, :3, 3] = [10.0, 0.0, 0.0]
    dt = jnp.asarray([0.5])
    out = np.asarray(
        box3d.anchor_projection(jnp.asarray(anchor), jnp.asarray(T), dt)
    )
    # center - vel*dt then translated: (1 - 2*0.5) + 10 = 10
    np.testing.assert_allclose(out[0, 0, :3], [10.0, 0.0, 0.0], atol=1e-6)


def test_box_corners_axis_aligned():
    anchor = np.zeros((1, 1, 11), dtype=np.float32)
    anchor[0, 0, :3] = [1.0, 2.0, 3.0]
    anchor[0, 0, 3:6] = np.log([2.0, 4.0, 6.0])
    anchor[0, 0, COS_YAW] = 1.0
    corners = np.asarray(box3d.box_corners(jnp.asarray(anchor)))[0, 0]
    assert corners.shape == (8, 3)
    np.testing.assert_allclose(corners.min(0), [0.0, 0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(corners.max(0), [2.0, 4.0, 6.0], atol=1e-5)


def test_box_corners_rotation_invariant_extent():
    anchor = np.zeros((1, 1, 11), dtype=np.float32)
    anchor[0, 0, 3:6] = np.log([2.0, 2.0, 2.0])
    anchor[0, 0, SIN_YAW] = np.sin(np.pi / 4)
    anchor[0, 0, COS_YAW] = np.cos(np.pi / 4)
    corners = np.asarray(box3d.box_corners(jnp.asarray(anchor)))[0, 0]
    # a rotated cube keeps corner distances from center
    d = np.linalg.norm(corners, axis=-1)
    np.testing.assert_allclose(d, np.sqrt(3.0), atol=1e-5)


def test_project_points_pinhole():
    # simple pinhole: fx=fy=100, cx=50, cy=25
    P = np.zeros((1, 1, 4, 4), dtype=np.float32)
    P[0, 0] = np.array(
        [
            [100, 0, 50, 0],
            [0, 100, 25, 0],
            [0, 0, 1, 0],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )
    pts = np.array([[[[1.0, 0.5, 2.0]]]], dtype=np.float32)  # [1,1,1,3]
    out = np.asarray(
        box3d.project_points(jnp.asarray(pts), jnp.asarray(P))
    )
    # x = (100*1 + 50*2)/2 = 100, y = (100*0.5+25*2)/2 = 50
    np.testing.assert_allclose(out[0, 0, 0, 0], [100.0, 50.0], atol=1e-4)


def test_project_points_depth_clamp():
    P = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1, 1))
    pts = np.array([[[[1.0, 1.0, -3.0]]]], dtype=np.float32)
    out = np.asarray(
        box3d.project_points(jnp.asarray(pts), jnp.asarray(P))
    )
    assert np.all(np.isfinite(out))
    # depth clamped to 1e-5 -> huge positive coords
    assert out[0, 0, 0, 0, 0] > 1e4
