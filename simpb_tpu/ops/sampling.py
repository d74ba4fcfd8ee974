"""XLA-native deformable sampling ops.

This module is the TPU equivalent of the reference's two CUDA kernels:

* `deformable_aggregation` — the fused multi-camera multi-scale
  bilinear-sample + weighted-sum op
  (reference ops/src/deformable_aggregation_cuda.cu:129-187).
* multi-scale deformable attention sampling, used per camera group
  (mmcv `MultiScaleDeformableAttnFunction`, invoked at
  reference models/group_attn.py:229-232).

Both are expressed as batched gathers + einsum contractions that XLA maps
onto the TPU gather engine and MXU; gradients flow through `jax.grad` as
scatter-adds, which on TPU are deterministic (unlike the reference's
`atomicAdd` backward, deformable_aggregation_cuda.cu:190-262).

Sampling semantics replicated exactly from the CUDA kernel:
  * locations are normalised to (0, 1); a sample is **dropped entirely**
    when either coordinate is <= 0 or >= 1 (cu:169-171);
  * pixel mapping is `h_im = loc_h * H - 0.5` (align_corners=False,
    cu:180-181);
  * out-of-border bilinear corners contribute zero (cu:35-53).

A Pallas kernel with identical semantics can be substituted behind the
same function signatures (see simpb_tpu/ops/pallas_daf.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .format import SpatialShapes


def bilinear_sample(
    feat: jnp.ndarray,
    h: int,
    w: int,
    loc: jnp.ndarray,
    drop_out_of_range: bool = True,
) -> jnp.ndarray:
    """Bilinear sampling with CUDA-kernel border semantics.

    Args:
      feat: [B, H*W, C] flattened feature map (row-major H, W).
      h, w: static spatial dims.
      loc: [B, N, 2] (x, y) locations normalised to (0, 1).
      drop_out_of_range: zero the whole sample when loc outside (0, 1)
        (DAF kernel behaviour). When False only out-of-border corners are
        zeroed (grid_sample zero-padding, used by the MSDA path).

    Returns:
      [B, N, C] sampled features.
    """
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    hx = 1.0 - lx
    hy = 1.0 - ly

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(yi, xi, cw):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        # [B, N, C] gather along the flattened spatial axis.
        vals = jnp.take_along_axis(feat, idx[..., None], axis=1)
        return vals * (cw * valid.astype(feat.dtype))[..., None]

    out = (
        corner(y0i, x0i, hy * hx)
        + corner(y0i, x0i + 1, hy * lx)
        + corner(y0i + 1, x0i, ly * hx)
        + corner(y0i + 1, x0i + 1, ly * lx)
    )
    if drop_out_of_range:
        in_range = (
            (loc[..., 0] > 0.0)
            & (loc[..., 0] < 1.0)
            & (loc[..., 1] > 0.0)
            & (loc[..., 1] < 1.0)
        )
        out = out * in_range.astype(feat.dtype)[..., None]
    return out


def deformable_aggregation(
    col_feats: jnp.ndarray,
    spatial_shapes: SpatialShapes,
    points_2d: jnp.ndarray,
    weights: jnp.ndarray,
) -> jnp.ndarray:
    """Fused multi-camera multi-scale deformable aggregation.

    For each (batch, anchor, point, camera, level, group): bilinearly
    sample the feature column at the projected location and accumulate
    `weight * sample` into the per-anchor output — the exact contraction
    of the reference CUDA kernel (deformable_aggregation_cuda.cu:129-187)
    with its shape contract documented at deformable_aggregation.cpp:22-27.

    Args:
      col_feats: [bs, cams, ΣHW, C] packed features.
      spatial_shapes: static per-level (H, W).
      points_2d: [bs, A, P, cams, 2] normalised sampling locations.
      weights: [bs, A, P, cams, L, G] per-group fusion weights.

    Returns:
      [bs, A, C] aggregated anchor features.
    """
    bs, cams, _, c = col_feats.shape
    _, num_anchor, num_pts = points_2d.shape[:3]
    num_levels = spatial_shapes.num_levels
    num_groups = weights.shape[-1]
    group_dims = c // num_groups

    # [bs, cams, A*P, 2]
    loc = points_2d.transpose(0, 3, 1, 2, 4).reshape(bs, cams, -1, 2)
    loc = loc.reshape(bs * cams, num_anchor * num_pts, 2)

    out = jnp.zeros((bs, num_anchor, num_groups, group_dims), dtype=col_feats.dtype)
    for lvl in range(num_levels):
        h, w_ = spatial_shapes.shapes[lvl]
        start = spatial_shapes.start_indices[lvl]
        feat_l = col_feats[:, :, start : start + h * w_].reshape(
            bs * cams, h * w_, c
        )
        sampled = bilinear_sample(feat_l, h, w_, loc, drop_out_of_range=True)
        # [bs, cams, A, P, G, group_dims]
        sampled = sampled.reshape(
            bs, cams, num_anchor, num_pts, num_groups, group_dims
        )
        out = out + jnp.einsum(
            "bnapgd,bapng->bagd", sampled, weights[..., lvl, :]
        )
    return out.reshape(bs, num_anchor, c)


def msda(
    value: jnp.ndarray,
    spatial_shapes: SpatialShapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Multi-scale deformable attention sampling (one camera's values).

    Equivalent of mmcv's `MultiScaleDeformableAttnFunction` used for the
    2D query-group cross-attention (reference models/group_attn.py:222-235):
    per head, sample `num_levels × num_points` bilinear values with
    zero-padding borders (grid_sample semantics) and sum them with softmax
    weights.

    Args:
      value: [B, ΣHW, heads, head_dim].
      spatial_shapes: static per-level (H, W).
      sampling_locations: [B, Q, heads, L, P, 2] normalised to (0, 1).
      attention_weights: [B, Q, heads, L, P].

    Returns:
      [B, Q, heads * head_dim].
    """
    b, _, num_heads, head_dim = value.shape
    q = sampling_locations.shape[1]
    num_levels, num_points = sampling_locations.shape[3:5]

    out = jnp.zeros((b, q, num_heads, head_dim), dtype=value.dtype)
    for lvl in range(num_levels):
        h, w_ = spatial_shapes.shapes[lvl]
        start = spatial_shapes.start_indices[lvl]
        # [B, heads, HW, head_dim] -> [B*heads, HW, head_dim]
        feat_l = value[:, start : start + h * w_].transpose(0, 2, 1, 3)
        feat_l = feat_l.reshape(b * num_heads, h * w_, head_dim)
        # [B*heads, Q*P, 2]
        loc = sampling_locations[:, :, :, lvl].transpose(0, 2, 1, 3, 4)
        loc = loc.reshape(b * num_heads, q * num_points, 2)
        sampled = bilinear_sample(feat_l, h, w_, loc, drop_out_of_range=False)
        sampled = sampled.reshape(b, num_heads, q, num_points, head_dim)
        w_l = attention_weights[:, :, :, lvl]  # [B, Q, heads, P]
        out = out + jnp.einsum("bhqpd,bqhp->bqhd", sampled, w_l)
    return out.reshape(b, q, num_heads * head_dim)
