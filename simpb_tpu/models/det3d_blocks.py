"""3D anchor encoder / refinement / keypoint modules.

TPU-native equivalents of reference detection3d/blocks.py: the anchor
embedding MLPs (SparseBox3DEncoder, :23-74), per-layer box refinement
(SparseBox3DRefinementModule, :77-154), and the keypoint generator
(SparseBox3DKeyPointsGenerator, :157-284). Pure-geometry pieces live in
simpb_tpu.core.box3d; these modules only add the learnable parts.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..core import box3d
from ..core.box3d import COS_YAW, H, L, SIN_YAW, VX, W, X, Y, Z
from .layers import MLPStack, Scale


class SparseBox3DEncoder(nn.Module):
    """Anchor state -> embedding.

    Released config (simpb_nus_r50_img_704x256.py:136-144): decoupled
    attention mode => per-component dims [128, 32, 32, 64], mode="cat",
    no output fc, out_loops=4.
    """

    embed_dims: Sequence[int] = (128, 32, 32, 64)
    vel_dims: int = 3
    mode: str = "cat"
    output_fc: bool = False
    in_loops: int = 1
    out_loops: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, anchor: jnp.ndarray) -> jnp.ndarray:
        def emb(dims, name):
            return MLPStack(
                embed_dims=dims,
                in_loops=self.in_loops,
                out_loops=self.out_loops,
                dtype=self.dtype,
                name=name,
            )

        pos = emb(self.embed_dims[0], "pos_fc")(anchor[..., (X, Y, Z)])
        size = emb(self.embed_dims[1], "size_fc")(anchor[..., (W, L, H)])
        yaw = emb(self.embed_dims[2], "yaw_fc")(anchor[..., (SIN_YAW, COS_YAW)])
        feats = [pos, size, yaw]
        if self.vel_dims > 0:
            vel = emb(self.embed_dims[3], "vel_fc")(
                anchor[..., VX : VX + self.vel_dims]
            )
            feats.append(vel)
        if self.mode == "add":
            out = sum(feats)
        else:
            out = jnp.concatenate(feats, axis=-1)
        if self.output_fc:
            out = emb(self.embed_dims[-1], "output_fc")(out)
        return out


class SparseBox3DRefinementModule(nn.Module):
    """Per-layer 3D refinement: state deltas + cls + quality branches.

    Reference detection3d/blocks.py:77-154. Deltas are added to
    [X..H] (+ yaw when refine_yaw); velocity is predicted as
    translation / time_interval plus the anchor velocity.
    """

    embed_dims: int = 256
    output_dim: int = 11
    num_cls: int = 10
    refine_yaw: bool = True
    normalize_yaw: bool = False
    with_cls_branch: bool = True
    with_quality_estimation: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        instance_feature: jnp.ndarray,
        anchor: jnp.ndarray,
        anchor_embed: jnp.ndarray,
        time_interval: jnp.ndarray | float = 1.0,
        return_cls: bool = True,
    ):
        feature = instance_feature + anchor_embed
        out = MLPStack(self.embed_dims, 2, 2, dtype=self.dtype, name="layers")(
            feature
        )
        out = nn.Dense(self.output_dim, dtype=self.dtype, name="out_fc")(out)
        out = Scale(self.output_dim, name="scale")(out)

        # refine_state is always a contiguous [0, n) prefix ([X..H] or
        # [X..COS_YAW]); use slice/concat forms — fused gather+scatter of
        # the same tensor miscompiles on the TPU stack (see
        # tests/test_backend_safety.py)
        n = 8 if self.refine_yaw else 6
        head_part = out[..., :n] + anchor[..., :n]
        if self.normalize_yaw:
            yaw = head_part[..., SIN_YAW:COS_YAW + 1]
            yaw = yaw / jnp.maximum(
                jnp.linalg.norm(yaw, axis=-1, keepdims=True), 1e-12
            )
            head_part = jnp.concatenate(
                [head_part[..., :SIN_YAW], yaw, head_part[..., COS_YAW + 1 :]],
                axis=-1,
            )
        tail = out[..., n:]
        if self.output_dim > 8:
            dt = jnp.asarray(time_interval, out.dtype)
            if dt.ndim == 0:
                dt = dt[None]
            mid = out[..., n:VX]  # yaw slots when refine_yaw is False
            velocity = out[..., VX:] / dt[:, None, None] + anchor[..., VX:]
            tail = jnp.concatenate([mid, velocity], axis=-1)
        refined = jnp.concatenate([head_part, tail], axis=-1)

        cls = None
        quality = None
        if return_cls:
            if self.with_cls_branch:
                c = MLPStack(
                    self.embed_dims, 1, 2, dtype=self.dtype, name="cls_layers"
                )(instance_feature)
                cls = nn.Dense(self.num_cls, dtype=self.dtype, name="cls_fc")(c)
            if self.with_quality_estimation:
                q = MLPStack(
                    self.embed_dims, 1, 2, dtype=self.dtype, name="quality_layers"
                )(feature)
                quality = nn.Dense(2, dtype=self.dtype, name="quality_fc")(q)
        return refined, cls, quality


class SparseBox3DKeyPointsGenerator(nn.Module):
    """Keypoints = (fixed scales ∪ learnable scales) · size, rotated+shifted.

    Reference detection3d/blocks.py:157-246. The released DFA config uses
    7 fixed + 6 learnable points (config:226-238).
    """

    fix_scale: Sequence[Sequence[float]] = (
        (0, 0, 0),
        (0.45, 0, 0),
        (-0.45, 0, 0),
        (0, 0.45, 0),
        (0, -0.45, 0),
        (0, 0, 0.45),
        (0, 0, -0.45),
    )
    num_learnable_pts: int = 6
    dtype: jnp.dtype = jnp.float32

    @property
    def num_pts(self) -> int:
        return len(self.fix_scale) + self.num_learnable_pts

    @nn.compact
    def __call__(
        self,
        anchor: jnp.ndarray,
        instance_feature: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        bs, num_anchor = anchor.shape[:2]
        fix = jnp.asarray(self.fix_scale, dtype=anchor.dtype)  # [F, 3]
        size = jnp.exp(anchor[..., None, (W, L, H)])  # [bs, A, 1, 3]
        key_points = fix * size
        if self.num_learnable_pts > 0 and instance_feature is not None:
            scale = nn.Dense(
                self.num_learnable_pts * 3, dtype=self.dtype, name="learnable_fc"
            )(instance_feature)
            scale = (
                nn.sigmoid(scale.reshape(bs, num_anchor, self.num_learnable_pts, 3))
                - 0.5
            )
            key_points = jnp.concatenate([key_points, scale * size], axis=-2)
        rot = box3d.yaw_rotation_matrix(anchor)  # [bs, A, 3, 3]
        key_points = jnp.einsum("baij,bapj->bapi", rot, key_points)
        return key_points + anchor[..., None, (X, Y, Z)]
