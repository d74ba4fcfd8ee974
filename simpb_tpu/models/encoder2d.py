"""Deformable-DETR 2D feature encoder (the reference's `encoder2d` hook).

The reference registers this surface but ships it DISABLED
(`encoder2d=None` in both released configs,
reference projects/configs/simpb_nus_r50_img_704x256.py:145); when
enabled, `SimPBHead.prepare2d` (reference simpb_head.py:214-276) runs a
deformable-DETR encoder over the flattened per-camera multi-level
features and the query-group cross-attention samples from the refined
memory instead of the raw FPN output (optionally shared back into the
3D path via `share_encoder2d`, simpb_head.py:415-417). The companion
`QueryGroupDeformableDetrTransformerDecoder`
(reference group_attn.py:259-346) is an iterative-refinement decoder
over that memory.

TPU redesign notes
- The reference builds per-level boolean padding masks that are always
  all-valid (`img_masks = new_zeros`, simpb_head.py:231; hence
  `valid_ratios == 1` and the key-padding mask is all-False). With
  static shapes there is nothing to mask, so the mask/valid-ratio
  machinery collapses: reference points are plain normalised pixel
  centres and no attention masking is needed. The sine positional
  encoding keeps the exact mmdet formula (offset=-0.5, normalize=True)
  evaluated on the all-valid mask.
- Cameras fold into the batch axis (as everywhere in this rebuild);
  the encoder is a per-camera operator exactly like the reference's
  `flatten(0, 1)` (simpb_head.py:226-227).
- Sampling reuses `ops.sampling.msda` — the same row-minimal pair-table
  gather as the decoder cross-attention.
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.format import SpatialShapes
from ..ops.sampling import msda
from .group_attn import msda_offset_bias_init
from .layers import MultiheadAttention, inverse_sigmoid


def sine_positional_encoding(
    h: int,
    w: int,
    num_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    offset: float = -0.5,
    scale: float = 2.0 * np.pi,
    eps: float = 1e-6,
) -> np.ndarray:
    """mmdet `SinePositionalEncoding` on an all-valid mask.

    Matches the released config (`type='SinePositionalEncoding',
    num_feats=128, normalize=True, offset=-0.5`, reference
    config:247-251). Returns [h, w, 2*num_feats] with the y-embedding
    channels first (mmdet concatenates (pos_y, pos_x)). Computed in
    numpy: the grid is static, so this is a compile-time constant.
    """
    y_embed = np.arange(1, h + 1, dtype=np.float64)[:, None] * np.ones((1, w))
    x_embed = np.ones((h, 1)) * np.arange(1, w + 1, dtype=np.float64)[None, :]
    if normalize:
        y_embed = (y_embed + offset) / (y_embed[-1:, :] + eps) * scale
        x_embed = (x_embed + offset) / (x_embed[:, -1:] + eps) * scale
    dim_t = np.arange(num_feats, dtype=np.float64)
    dim_t = temperature ** (2.0 * (dim_t // 2) / num_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    # interleave sin/cos over channel pairs (mmdet stack(..., dim=3).view)
    pos_x = np.stack(
        [np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])], axis=-1
    ).reshape(h, w, num_feats)
    pos_y = np.stack(
        [np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])], axis=-1
    ).reshape(h, w, num_feats)
    return np.concatenate([pos_y, pos_x], axis=-1).astype(np.float32)


def _packed_pos_and_refs(
    spatial_shapes: SpatialShapes, num_feats: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-slot sine position embedding and normalised reference point
    for the packed [ΣHW] layout (reference simpb_head.py:236-261 with
    `valid_ratios == 1`)."""
    pos, refs = [], []
    for h, w in spatial_shapes.shapes:
        pos.append(sine_positional_encoding(h, w, num_feats).reshape(h * w, -1))
        ys, xs = np.meshgrid(
            (np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w, indexing="ij"
        )
        refs.append(np.stack([xs, ys], -1).reshape(h * w, 2))
    return (
        np.concatenate(pos, 0),
        np.concatenate(refs, 0).astype(np.float32),
    )


class MSDAAttention(nn.Module):
    """mmcv `MultiScaleDeformableAttention` (one implementation for the
    encoder's self-attention — queries ARE the packed feature slots —
    and the decoder's cross-attention over the encoder memory; they
    differ only in reference-point rank and optional query_pos)."""

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Q, C] (cams folded into B)
        query_pos: Optional[jnp.ndarray],  # [Q, C] / [B, Q, C] / None
        reference_points: jnp.ndarray,  # [Q, 2] or [B, Q, 2] normalised
        value: jnp.ndarray,  # [B, ΣHW, C]
        spatial_shapes: SpatialShapes,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, q, c = query.shape
        identity = query
        if query_pos is not None:
            query = query + query_pos.astype(query.dtype)

        v = nn.Dense(self.embed_dims, dtype=self.dtype, name="value_proj")(
            value
        ).astype(value.dtype)

        offsets = nn.Dense(
            self.num_heads * self.num_levels * self.num_points * 2,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=msda_offset_bias_init(
                self.num_heads, self.num_levels, self.num_points
            ),
            name="sampling_offsets",
        )(query).reshape(
            b, q, self.num_heads, self.num_levels, self.num_points, 2
        )
        attn = nn.Dense(
            self.num_heads * self.num_levels * self.num_points,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(
            b, q, self.num_heads, self.num_levels * self.num_points
        )
        attn = jax.nn.softmax(attn, axis=-1).reshape(
            b, q, self.num_heads, self.num_levels, self.num_points
        )

        normalizer = jnp.asarray(
            [(w_, h_) for h_, w_ in spatial_shapes.shapes],
            dtype=offsets.dtype,
        )
        if reference_points.ndim == 2:  # [Q, 2] shared across batch
            reference_points = reference_points[None]
        loc = (
            reference_points[:, :, None, None, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )
        out = msda(v, spatial_shapes, loc, attn, num_heads=self.num_heads)
        out = nn.Dense(
            self.embed_dims, dtype=self.dtype, name="output_proj"
        )(out.astype(self.dtype))
        out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        return identity + out


class EncoderFFN(nn.Module):
    """mmcv `FFN` (embed → ffn(ReLU, drop) → embed, drop, residual)."""

    embed_dims: int = 256
    feedforward_channels: int = 1024
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        y = nn.Dense(
            self.feedforward_channels, dtype=self.dtype, name="fc1"
        )(x)
        y = nn.relu(y)
        y = nn.Dropout(rate=self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.embed_dims, dtype=self.dtype, name="fc2")(y)
        y = nn.Dropout(rate=self.dropout)(y, deterministic=deterministic)
        return x + y


class DeformableEncoder2D(nn.Module):
    """The `encoder2d` hook: N layers of (MSDA self-attn, LN, FFN, LN)
    over the packed per-camera features, with sine + level position
    embeddings (reference simpb_head.py:214-276)."""

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    num_layers: int = 1
    feedforward_channels: int = 1024
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        col_feats: jnp.ndarray,  # [bs, cams, ΣHW, C]
        spatial_shapes: SpatialShapes,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        bs, cams, n, c = col_feats.shape
        level_embeds = self.param(
            "level_embeds",
            nn.initializers.normal(1.0),
            (self.num_levels, self.embed_dims),
        )
        pos_np, refs_np = _packed_pos_and_refs(
            spatial_shapes, self.embed_dims // 2
        )
        lvl_of_slot = np.repeat(
            np.arange(spatial_shapes.num_levels), spatial_shapes.sizes
        )
        pos = jnp.asarray(pos_np) + level_embeds[lvl_of_slot]
        refs = jnp.asarray(refs_np)

        x = col_feats.reshape(bs * cams, n, c)
        for i in range(self.num_layers):
            x = MSDAAttention(
                embed_dims=self.embed_dims,
                num_heads=self.num_heads,
                num_levels=self.num_levels,
                num_points=self.num_points,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"layer{i}_attn",
            )(x, pos, refs, x, spatial_shapes, deterministic=deterministic)
            x = nn.LayerNorm(
                epsilon=1e-5, dtype=self.dtype, name=f"layer{i}_norm1"
            )(x)
            x = EncoderFFN(
                embed_dims=self.embed_dims,
                feedforward_channels=self.feedforward_channels,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"layer{i}_ffn",
            )(x, deterministic=deterministic)
            x = nn.LayerNorm(
                epsilon=1e-5, dtype=self.dtype, name=f"layer{i}_norm2"
            )(x)
        return x.reshape(bs, cams, n, c).astype(col_feats.dtype)


class DeformableDecoder2D(nn.Module):
    """`QueryGroupDeformableDetrTransformerDecoder` equivalent
    (reference group_attn.py:259-346): layers of (self-attn, LN, MSDA
    cross-attn, LN, FFN, LN) with per-layer iterative reference-point
    refinement through optional regression branches and stacked
    intermediate outputs. Unused by every released config (the
    reference registers it but no config instantiates it); provided and
    tested for surface completeness."""

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    num_layers: int = 2
    feedforward_channels: int = 1024
    dropout: float = 0.1
    return_intermediate: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Q, C]
        query_pos: Optional[jnp.ndarray],
        reference_points: jnp.ndarray,  # [B, Q, 2] in (0, 1)
        value: jnp.ndarray,  # [B, ΣHW, C]
        spatial_shapes: SpatialShapes,
        reg_branch: Optional[nn.Module] = None,
        deterministic: bool = True,
    ):
        intermediate, intermediate_refs = [], []
        x = query
        for i in range(self.num_layers):
            q_in = x + query_pos if query_pos is not None else x
            sa = MultiheadAttention(
                embed_dims=self.embed_dims,
                num_heads=self.num_heads,
                dtype=self.dtype,
                name=f"layer{i}_self_attn",
            )(q_in, q_in, x, deterministic=deterministic)
            x = nn.LayerNorm(
                epsilon=1e-5, dtype=self.dtype, name=f"layer{i}_norm1"
            )(x + sa)
            x = MSDAAttention(
                embed_dims=self.embed_dims,
                num_heads=self.num_heads,
                num_levels=self.num_levels,
                num_points=self.num_points,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"layer{i}_cross_attn",
            )(
                x, query_pos, reference_points, value, spatial_shapes,
                deterministic=deterministic,
            )
            x = nn.LayerNorm(
                epsilon=1e-5, dtype=self.dtype, name=f"layer{i}_norm2"
            )(x)
            x = EncoderFFN(
                embed_dims=self.embed_dims,
                feedforward_channels=self.feedforward_channels,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"layer{i}_ffn",
            )(x, deterministic=deterministic)
            x = nn.LayerNorm(
                epsilon=1e-5, dtype=self.dtype, name=f"layer{i}_norm3"
            )(x)
            if reg_branch is not None:
                # 2-point refinement (group_attn.py:330-335): logits add
                # in inverse-sigmoid space, detached (stop_gradient)
                delta = reg_branch(x)
                reference_points = jax.lax.stop_gradient(
                    jax.nn.sigmoid(
                        delta[..., :2] + inverse_sigmoid(reference_points)
                    )
                )
            if self.return_intermediate:
                intermediate.append(x)
                intermediate_refs.append(reference_points)
        if self.return_intermediate:
            return jnp.stack(intermediate), jnp.stack(intermediate_refs)
        return x, reference_points
