"""Adaptive query aggregation: gated 2D -> 3D merge.

TPU-native equivalent of reference models/aggregation.py:10-40
(`ReWeight`): each 2D query is gated by a learned alpha computed from
(query, center-count); gated queries are averaged back onto their 3D
parents through the transposed incidence matrix with a clamped divisor.
The surrounding self-attention lives in the head (it shares the decoupled
fc_before/fc_after projections, aggregation.py:96-99).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ReWeight(nn.Module):
    f_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query2d: jnp.ndarray,  # [bs, Q, C]
        query_pos2d: jnp.ndarray,  # [bs, Q, C]
        trans_matrix: jnp.ndarray,  # [bs, Q, A]
        center_matrix: jnp.ndarray,  # [bs, Q, A]
    ):
        # center-count channel == 1 when this slot is a center query
        # (reference aggregation.py:63: center_matrix.sum(-1))
        center_count = center_matrix.sum(-1, keepdims=True)
        param = jnp.concatenate(
            [query2d, center_count.astype(query2d.dtype)], axis=-1
        )
        h = nn.relu(nn.Dense(self.f_dim, dtype=self.dtype, name="reduce")(param))
        alpha = nn.sigmoid(nn.Dense(1, dtype=self.dtype, name="alpha")(h))

        # reweight_matrix[b, a, q] = trans[b, q, a] * alpha[b, q]
        rw = (trans_matrix * alpha).transpose(0, 2, 1)
        divisor = jnp.maximum(rw.sum(-1, keepdims=True), 1e-5)
        query = jnp.matmul(rw, query2d) / divisor
        query_pos = jnp.matmul(rw, query_pos2d) / divisor
        return query, query_pos
