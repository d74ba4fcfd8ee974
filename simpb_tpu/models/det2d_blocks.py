"""2D anchor encoder / refinement modules.

TPU-native equivalents of reference detection2d/blocks.py: sine-embed 2D
anchor encoder (:20-63) and the 2D refinement head with cls / alpha /
optional depth branches (:65-145).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .layers import MLPStack, Scale, inverse_sigmoid, pos2posemb2d


class SparseBox2DEncoder(nn.Module):
    """2D anchor -> embedding; released config uses with_sin_embed=True
    (config:129-135): sine posemb of (cx, cy) through an MLP stack."""

    embed_dims: int = 256
    with_sin_embed: bool = True
    with_size: bool = False
    in_loops: int = 1
    out_loops: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, box2d: jnp.ndarray) -> jnp.ndarray:
        if self.with_sin_embed:
            emb = pos2posemb2d(box2d[..., :2]).astype(self.dtype)
            return MLPStack(
                self.embed_dims, self.in_loops, self.out_loops,
                dtype=self.dtype, name="query_embeddings2d",
            )(emb)
        pos = MLPStack(
            self.embed_dims, self.in_loops, self.out_loops,
            dtype=self.dtype, name="pos_fc",
        )(box2d[..., :2])
        if not self.with_size:
            return pos
        size = MLPStack(
            self.embed_dims, self.in_loops, self.out_loops,
            dtype=self.dtype, name="size_fc",
        )(box2d[..., 2:4])
        return MLPStack(
            self.embed_dims, self.in_loops, self.out_loops,
            dtype=self.dtype, name="output_fc",
        )(pos + size)


class SparseBox2DRefinementModule(nn.Module):
    """2D refinement: sigmoid-space box delta + cls + alpha (+depth).

    Reference detection2d/blocks.py:65-145. The box head adds its delta to
    `inverse_sigmoid(anchor2d)` and re-sigmoids; alpha is (sin, cos) of
    the observation angle; depth (disabled in released configs) is
    `exp(.) * focal / 100`.
    """

    embed_dims: int = 256
    output_dim: int = 4
    num_cls: int = 10
    alpha_dim: int = 2
    with_cls_branch: bool = True
    with_alpha_branch: bool = True
    with_depth_branch: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        instance_feature: jnp.ndarray,
        anchor2d: jnp.ndarray,
        anchor2d_embed: jnp.ndarray,
        focal: Optional[jnp.ndarray] = None,
        return_cls: bool = True,
    ):
        out = MLPStack(self.embed_dims, 2, 2, dtype=self.dtype, name="layers")(
            instance_feature + anchor2d_embed
        )
        out = nn.Dense(self.output_dim, dtype=self.dtype, name="out_fc")(out)
        out = Scale(self.output_dim, name="scale")(out)

        na = anchor2d.shape[-1]
        # explicit cast: the anchor logits are fp32 geometry while `out`
        # runs in the head compute dtype; without it jax's scatter-add
        # dtype check warns (and will error in future releases)
        out = out.at[..., :na].add(
            inverse_sigmoid(anchor2d).astype(out.dtype)
        )

        cls = None
        if return_cls and self.with_cls_branch:
            c = MLPStack(self.embed_dims, 1, 2, dtype=self.dtype, name="cls_layers")(
                instance_feature
            )
            cls = nn.Dense(self.num_cls, dtype=self.dtype, name="cls_fc")(c)

        alpha = None
        if self.with_alpha_branch:
            a = MLPStack(
                self.embed_dims, 1, 2, dtype=self.dtype, name="alpha_layers"
            )(instance_feature)
            a = nn.Dense(self.alpha_dim, dtype=self.dtype, name="alpha_fc")(a)
            alpha = Scale(self.alpha_dim, name="alpha_scale")(a)

        depth = None
        if self.with_depth_branch:
            d = MLPStack(
                self.embed_dims, 2, 2, dtype=self.dtype, name="depth_layers"
            )(instance_feature)
            d = nn.Dense(1, dtype=self.dtype, name="depth_fc")(d)
            d = Scale(1, name="depth_scale")(d)
            depth = jnp.exp(d)
            if focal is not None:
                depth = depth * focal[..., None] / 100.0

        return nn.sigmoid(out), cls, depth, alpha
