"""Deformable feature aggregation (3D keypoints -> multi-camera sampling).

TPU-native equivalent of reference models/blocks.py:45-261
(`DeformableFeatureAggregation`): generate per-anchor keypoints, compute
per-(camera, level, point, group) softmax fusion weights (with camera
embedding from the projection matrices), project keypoints into every
camera, and aggregate bilinear samples through the fused
`deformable_aggregation` op (the reference's custom CUDA kernel, here an
XLA gather/einsum contraction — simpb_tpu/ops/sampling.py).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import box3d
from ..ops.format import SpatialShapes
from ..ops.sampling import deformable_aggregation
from .det3d_blocks import SparseBox3DKeyPointsGenerator
from .layers import MLPStack


class DeformableFeatureAggregation(nn.Module):
    embed_dims: int = 256
    num_groups: int = 8
    num_levels: int = 4
    num_cams: int = 6
    attn_drop: float = 0.15
    use_camera_embed: bool = True
    residual_mode: str = "cat"
    proj_drop: float = 0.0
    num_learnable_pts: int = 6
    gather_capacity: Optional[int] = 4096
    sel_levels: Optional[int] = None
    level_capacity: Optional[int] = None
    # in-graph exactness guard: sow per-frame cap-overflow (and dropped
    # level mass when sel_levels is on) into the "guards" collection so
    # capped sampling becomes a CHECKED invariant at eval
    guard: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        instance_feature: jnp.ndarray,  # [bs, A, C]
        anchor: jnp.ndarray,  # [bs, A, 11]
        anchor_embed: jnp.ndarray,  # [bs, A, C]
        col_feats: jnp.ndarray,  # [bs, cams, ΣHW, C]
        spatial_shapes: SpatialShapes,
        projection_mat: jnp.ndarray,  # [bs, cams, 4, 4]
        image_wh: Optional[jnp.ndarray] = None,  # [bs, cams, 2]
        deterministic: bool = True,
        pair_table: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        bs, num_anchor = instance_feature.shape[:2]
        kps = SparseBox3DKeyPointsGenerator(
            num_learnable_pts=self.num_learnable_pts,
            dtype=self.dtype,
            name="kps_generator",
        )
        key_points = kps(anchor, instance_feature)  # [bs, A, P, 3]
        num_pts = key_points.shape[2]

        # ---- fusion weights (reference blocks.py:164-196) ----
        feature = instance_feature + anchor_embed
        if self.use_camera_embed:
            cam_in = projection_mat[:, :, :3].reshape(bs, self.num_cams, 12)
            camera_embed = MLPStack(
                self.embed_dims, 1, 2, dtype=self.dtype, name="camera_encoder"
            )(cam_in.astype(self.dtype))
            feature = feature[:, :, None] + camera_embed[:, None]
            weights = nn.Dense(
                self.num_groups * self.num_levels * num_pts,
                dtype=self.dtype,
                name="weights_fc",
            )(feature)  # [bs, A, cams, L*P*G]
        else:
            weights = nn.Dense(
                self.num_groups * self.num_cams * self.num_levels * num_pts,
                dtype=self.dtype,
                name="weights_fc",
            )(feature)
        weights = weights.reshape(bs, num_anchor, -1, self.num_groups)
        weights = jax.nn.softmax(weights, axis=-2)
        weights = weights.reshape(
            bs, num_anchor, self.num_cams, self.num_levels, num_pts,
            self.num_groups,
        )
        if self.attn_drop > 0 and not deterministic:
            # drop whole (cam, point) pairs (reference blocks.py:188-196)
            rng = self.make_rng("dropout")
            mask = jax.random.uniform(
                rng, (bs, num_anchor, self.num_cams, 1, num_pts, 1)
            )
            weights = jnp.where(mask > self.attn_drop, weights, 0.0) / (
                1 - self.attn_drop
            )

        # ---- projection + fused aggregation ----
        points_2d = box3d.project_points(key_points, projection_mat, image_wh)
        # [bs, cams, A, P, 2] -> [bs, A, P, cams, 2]
        points_2d = points_2d.transpose(0, 2, 3, 1, 4)
        # [bs, A, cams, L, P, G] -> [bs, A, P, cams, L, G]
        w = weights.transpose(0, 1, 4, 2, 3, 5)

        if self.guard and not self.is_initializing():
            # cap overflow: in-range (anchor, point) demand per camera
            # beyond `gather_capacity` means dropped keypoints (the same
            # in-range definition the op's compaction uses)
            in_r = (
                (points_2d[..., 0] > 0.0)
                & (points_2d[..., 0] < 1.0)
                & (points_2d[..., 1] > 0.0)
                & (points_2d[..., 1] < 1.0)
            )  # [bs, A, P, cams]
            counts = in_r.sum((1, 2))  # [bs, cams]
            cap = self.gather_capacity
            cap_eff = (
                cap
                if cap is not None and cap < num_anchor * num_pts
                else num_anchor * num_pts
            )
            self.sow(
                "guards", "dfa_overflow",
                jnp.maximum(jnp.max(counts) - cap_eff, 0).astype(
                    jnp.float32
                ),
            )
            if self.sel_levels is not None and self.sel_levels < self.num_levels:
                # dropped fusion-weight mass of non-top-k levels
                mass = w.astype(jnp.float32).sum(-1)  # [bs, A, P, cams, L]
                topk, _ = jax.lax.top_k(mass, self.sel_levels)
                self.sow(
                    "guards", "dfa_level_dropped_mass",
                    jnp.max(
                        jnp.where(
                            in_r, mass.sum(-1) - topk.sum(-1), 0.0
                        )
                    ),
                )
        features = deformable_aggregation(
            col_feats, spatial_shapes, points_2d.astype(col_feats.dtype),
            w.astype(col_feats.dtype), gather_capacity=self.gather_capacity,
            sel_levels=self.sel_levels, pair_table=pair_table,
            level_capacity=self.level_capacity,
        )

        output = nn.Dense(self.embed_dims, dtype=self.dtype, name="output_proj")(
            features.astype(self.dtype)
        )
        if self.proj_drop > 0.0:
            output = nn.Dropout(rate=self.proj_drop)(
                output, deterministic=deterministic
            )
        if self.residual_mode == "add":
            return output + instance_feature
        return jnp.concatenate([output, instance_feature], axis=-1)
