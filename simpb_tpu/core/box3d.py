"""3D box state-vector codec and geometry for SimPB-TPU.

The anchor / box state layout follows the reference exactly
(reference: projects/mmdet3d_plugin/core/box3d.py:1-3):

    undecoded state vector (11 dims):
        [X, Y, Z, W, L, H, SIN_YAW, COS_YAW, VX, VY, VZ]
    where W/L/H are *log* sizes and yaw is stored as (sin, cos).

    decoded box (nuScenes LiDAR convention, 10 dims):
        [x, y, z, w, l, h, yaw, vx, vy, vz]

All functions here are pure jnp and shape-polymorphic over leading batch
dims; they are the single source of truth for box geometry in the
framework (keypoints, corner projection, ego-motion compensation).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import lax

# Geometry transforms are tiny but precision-sensitive (pose matrices,
# projective divides); force full fp32 MXU precision regardless of the
# global default.
_matmul = functools.partial(jnp.matmul, precision=lax.Precision.HIGHEST)
_einsum = functools.partial(jnp.einsum, precision=lax.Precision.HIGHEST)

# Undecoded state indices (reference core/box3d.py:1).
X, Y, Z, W, L, H, SIN_YAW, COS_YAW, VX, VY, VZ = range(11)
# Quality indices: centerness / yawness (reference core/box3d.py:2).
CNS, YNS = 0, 1
# Decoded yaw index (reference core/box3d.py:3).
YAW = 6

STATE_DIM = 11


def decode_box(box: jnp.ndarray) -> jnp.ndarray:
    """Undecoded 11-dim state -> decoded 10-dim box.

    Mirrors SparseBox3DDecoder.decode_box
    (reference detection3d/decoder.py:23-34): yaw = atan2(sin, cos),
    sizes exponentiated, velocity passed through.
    """
    yaw = jnp.arctan2(box[..., SIN_YAW], box[..., COS_YAW])
    return jnp.concatenate(
        [
            box[..., (X, Y, Z)],
            jnp.exp(box[..., (W, L, H)]),
            yaw[..., None],
            box[..., VX:],
        ],
        axis=-1,
    )


def encode_box(box: jnp.ndarray, vel_dims: int = 3) -> jnp.ndarray:
    """Decoded GT box -> 11-dim anchor parameterisation.

    Mirrors SparseBox3DTarget.encode_reg_target
    (reference detection3d/target.py:90-106): log-sizes, (sin, cos) yaw.
    """
    out = jnp.concatenate(
        [
            box[..., (X, Y, Z)],
            jnp.log(jnp.maximum(box[..., (W, L, H)], 1e-8)),
            jnp.sin(box[..., YAW])[..., None],
            jnp.cos(box[..., YAW])[..., None],
            box[..., YAW + 1 : YAW + 1 + vel_dims],
        ],
        axis=-1,
    )
    return out


def yaw_rotation_matrix(anchor: jnp.ndarray) -> jnp.ndarray:
    """[..., 11] anchors -> [..., 3, 3] rotation about z by the anchor yaw.

    Matches the explicit construction in the reference keypoint generator
    (detection3d/blocks.py:203-209) and allocation (allocation.py:35-40).
    """
    cos = anchor[..., COS_YAW]
    sin = anchor[..., SIN_YAW]
    zero = jnp.zeros_like(cos)
    one = jnp.ones_like(cos)
    rot = jnp.stack(
        [
            jnp.stack([cos, -sin, zero], axis=-1),
            jnp.stack([sin, cos, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
    return rot


def box_corners(anchor: jnp.ndarray, size_clip: tuple | None = None) -> jnp.ndarray:
    """[..., 11] anchors -> [..., 8, 3] world-frame corner points.

    Corner ordering follows the reference's
    `np.unravel_index(np.arange(8), [2, 2, 2]) - 0.5` convention
    (allocation.py:43-52): binary counting over (x, y, z) half-extents.
    `size_clip` optionally clamps exp-sizes (reference limit_anchor_size).
    """
    # (8, 3) binary corner template in {-0.5, +0.5}^3, x-major like unravel_index.
    idx = jnp.arange(8)
    corners_norm = (
        jnp.stack([(idx // 4) % 2, (idx // 2) % 2, idx % 2], axis=-1).astype(
            anchor.dtype
        )
        - 0.5
    )
    size = jnp.exp(anchor[..., (W, L, H)])
    if size_clip is not None:
        size = jnp.minimum(size, jnp.asarray(size_clip, dtype=anchor.dtype))
    corners = size[..., None, :] * corners_norm
    rot = yaw_rotation_matrix(anchor)
    corners = _einsum("...ij,...kj->...ki", rot, corners)
    return corners + anchor[..., None, (X, Y, Z)]


def project_points(
    key_points: jnp.ndarray,
    projection_mat: jnp.ndarray,
    image_wh: jnp.ndarray | None = None,
    min_depth: float = 1e-5,
) -> jnp.ndarray:
    """Project 3D key points into every camera.

    Mirrors DeformableFeatureAggregation.project_points
    (reference models/blocks.py:198-213): homogeneous multiply, divide by
    depth clamped to `min_depth`, optionally normalise by image size.

    Args:
      key_points: [bs, A, P, 3] points in the ego/lidar frame.
      projection_mat: [bs, cams, 4, 4] lidar->image matrices.
      image_wh: optional [bs, cams, 2].

    Returns:
      [bs, cams, A, P, 2] normalised 2D locations.
    """
    pts = jnp.concatenate(
        [key_points, jnp.ones_like(key_points[..., :1])], axis=-1
    )
    # [bs, cams, A, P, 4]
    proj = _einsum("bnij,bapj->bnapi", projection_mat, pts)
    pts2d = proj[..., :2] / jnp.maximum(proj[..., 2:3], min_depth)
    if image_wh is not None:
        pts2d = pts2d / image_wh[:, :, None, None]
    return pts2d


def anchor_projection(
    anchor: jnp.ndarray,
    T_src2dst: jnp.ndarray,
    time_interval: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Ego-motion-compensate anchors across frames.

    Mirrors SparseBox3DKeyPointsGenerator.anchor_projection
    (reference detection3d/blocks.py:248-280) including the acknowledged
    yaw-layout quirk: the rotated yaw vector is computed from
    [COS_YAW, SIN_YAW] but written back into the [SIN_YAW, COS_YAW] slots
    *unswapped* (the reference's "TODO: Fix bug" at :274-278). Checkpoint
    parity requires replicating this bit-for-bit.

    Args:
      anchor: [bs, N, 11].
      T_src2dst: [bs, 4, 4] transform from source to destination frame.
      time_interval: optional [bs] seconds; velocity back-propagation
        `center -= vel * dt` is applied when given.
    """
    vel = anchor[..., VX:]
    vel_dim = vel.shape[-1]
    T = T_src2dst[:, None].astype(anchor.dtype)  # [bs, 1, 4, 4]

    center = anchor[..., (X, Y, Z)]
    if time_interval is not None:
        translation = vel * time_interval[:, None, None].astype(vel.dtype)
        center = center - translation
    center = (
        _matmul(T[..., :3, :3], center[..., None]).squeeze(-1) + T[..., :3, 3]
    )
    size = anchor[..., (W, L, H)]
    # NOTE reference quirk: input (cos, sin) rotated, stored into (sin, cos).
    yaw = _matmul(
        T[..., :2, :2], anchor[..., (COS_YAW, SIN_YAW)][..., None]
    ).squeeze(-1)
    vel = _matmul(T[..., :vel_dim, :vel_dim], vel[..., None]).squeeze(-1)
    return jnp.concatenate([center, size, yaw, vel], axis=-1)


def anchor_distance(anchor: jnp.ndarray) -> jnp.ndarray:
    """BEV distance of anchors (reference detection3d/blocks.py:282-284)."""
    return jnp.linalg.norm(anchor[..., :2], axis=-1)
