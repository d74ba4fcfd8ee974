"""Shared neural building blocks.

TPU-native equivalents of the reference's mmcv-derived primitives:
`linear_relu_ln` MLP stacks (models/blocks.py:32-42), torch-style
multi-head attention used by all `gnn`/`temp_gnn`/aggregation ops, and
the `AsymmetricFFN` (models/blocks.py:325-393). Parameter layouts are
kept 1:1 convertible from the released torch checkpoints.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLPStack(nn.Module):
    """`linear_relu_ln(embed, in_loops, out_loops)` equivalent.

    Reference models/blocks.py:32-42: out_loops x [in_loops x (Linear,
    ReLU), LayerNorm].
    """

    embed_dims: int
    in_loops: int = 1
    out_loops: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        idx = 0
        for _ in range(self.out_loops):
            for _ in range(self.in_loops):
                x = nn.Dense(self.embed_dims, dtype=self.dtype, name=f"fc{idx}")(x)
                x = nn.relu(x)
                idx += 1
            x = nn.LayerNorm(
                epsilon=1e-5, dtype=self.dtype, name=f"ln{idx - 1}"
            )(x)  # torch LayerNorm eps
        return x


class Scale(nn.Module):
    """Per-channel learnable scale (mmcv Scale, used after refine MLPs)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "scale", lambda key: jnp.ones((self.dim,), jnp.float32)
        )
        return x * scale.astype(x.dtype)


def masked_softmax(logits: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Softmax that returns exact zeros for fully-masked (-inf) rows.

    Replaces the reference's `torch.nan_to_num` fix-up after fully masked
    attention rows (group_attn.py:131).
    """
    m = jnp.max(logits, axis=axis, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    unnorm = jnp.exp(logits - m)
    unnorm = jnp.where(jnp.isfinite(logits), unnorm, 0.0)
    denom = jnp.sum(unnorm, axis=axis, keepdims=True)
    return unnorm / jnp.maximum(denom, 1e-30)


class MultiheadAttention(nn.Module):
    """Torch-compatible multi-head attention.

    Matches `nn.MultiheadAttention` semantics (separate q/k/v projections
    + out_proj, scaled dot-product, additive or boolean attn_mask,
    dropout on attention probabilities) so released checkpoint weights
    transfer directly. Fully-masked rows produce zeros (see
    `masked_softmax`).
    """

    embed_dims: int
    num_heads: int
    attn_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [bs, L, E]
        key: Optional[jnp.ndarray] = None,  # [bs, S, E]
        value: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,  # [L,S] or [bs,L,S]; bool True=block or additive float
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if key is None:
            key = query
        if value is None:
            value = key
        e, h = self.embed_dims, self.num_heads
        hd = e // h
        dense = lambda name: nn.Dense(e, dtype=self.dtype, name=name)
        q = dense("q_proj")(query)
        k = dense("k_proj")(key)
        v = dense("v_proj")(value)

        bs, L = q.shape[:2]
        S = k.shape[1]
        q = q.reshape(bs, L, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(bs, S, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(bs, S, h, hd).transpose(0, 2, 1, 3)

        bias = None
        if attn_mask is not None:
            if attn_mask.dtype == jnp.bool_:
                bias = jnp.where(attn_mask, -jnp.inf, 0.0).astype(q.dtype)
            else:
                bias = attn_mask.astype(q.dtype)
            if bias.ndim == 2:
                bias = bias[None, None]
            elif bias.ndim == 3:
                bias = bias[:, None]

        drop = self.attn_drop if not deterministic else 0.0
        rng = self.make_rng("dropout") if drop > 0.0 else None

        # the attention core is rematerialised in the backward pass so the
        # [bs, h, L, S] logits/probs are never stored (the decoder's
        # dominant training-memory term; without this bs=4 training OOMs
        # on a 16G v5e chip)
        def core(q, k, v, bias, rng):
            logits = jnp.einsum("bhld,bhsd->bhls", q, k) / jnp.sqrt(
                jnp.asarray(hd, q.dtype)
            )
            if bias is not None:
                logits = logits + bias
            probs = masked_softmax(logits, axis=-1)
            if rng is not None:
                keep = jax.random.bernoulli(
                    rng, 1.0 - drop, probs.shape
                )
                probs = jnp.where(keep, probs / (1.0 - drop), 0.0)
            return jnp.einsum("bhls,bhsd->bhld", probs, v)

        out = jax.checkpoint(core)(q, k, v, bias, rng)
        out = out.transpose(0, 2, 1, 3).reshape(bs, L, e)
        return nn.Dense(e, dtype=self.dtype, name="out_proj")(out)


class ResidualAttention(nn.Module):
    """MHA + residual + dropout, matching mmcv MultiheadAttention wrapper
    and QueryGroupMultiheadAttention (group_attn.py:60-133):
    `identity + dropout_layer(proj_drop(attn(q+pos, k+pos, v)))`.

    The released configs pass `dropout=0.1` to the mmcv wrapper, which
    sets BOTH the attention-prob dropout and the output dropout_layer —
    `out_drop` mirrors the latter.
    """

    embed_dims: int
    num_heads: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    out_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query,
        key=None,
        value=None,
        query_pos=None,
        key_pos=None,
        attn_mask=None,
        identity=None,
        deterministic: bool = True,
    ):
        if key is None:
            key = query
        if value is None:
            value = key
        if identity is None:
            identity = query
        if key_pos is None and query_pos is not None and (
            query_pos.shape == key.shape
        ):
            key_pos = query_pos
        q = query + query_pos if query_pos is not None else query
        k = key + key_pos if key_pos is not None else key
        out = MultiheadAttention(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            attn_drop=self.attn_drop,
            dtype=self.dtype,
            name="attn",
        )(q, k, value, attn_mask=attn_mask, deterministic=deterministic)
        if self.proj_drop > 0.0:
            out = nn.Dropout(rate=self.proj_drop)(
                out, deterministic=deterministic
            )
        if self.out_drop > 0.0:
            out = nn.Dropout(rate=self.out_drop)(
                out, deterministic=deterministic
            )
        return identity + out


class AsymmetricFFN(nn.Module):
    """FFN with a wider (2x embed) input after `residual_mode='cat'` ops.

    Reference models/blocks.py:325-393 with the released config
    (pre_norm=LN, in_channels=2*embed, identity projection).
    """

    embed_dims: int = 256
    in_channels: int = 512
    feedforward_channels: int = 1024
    ffn_drop: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_norm")(x)
        out = nn.Dense(
            self.feedforward_channels, dtype=self.dtype, name="fc1"
        )(x)
        out = nn.relu(out)
        out = nn.Dropout(rate=self.ffn_drop)(out, deterministic=deterministic)
        out = nn.Dense(self.embed_dims, dtype=self.dtype, name="fc2")(out)
        out = nn.Dropout(rate=self.ffn_drop)(out, deterministic=deterministic)
        if self.in_channels == self.embed_dims:
            identity = x
        else:
            identity = nn.Dense(
                self.embed_dims, dtype=self.dtype, name="identity_fc"
            )(x)
        return identity + out


def pos2posemb2d(
    pos: jnp.ndarray, num_pos_feats: int = 128, temperature: float = 10000.0
) -> jnp.ndarray:
    """Sine positional embedding for 2D points (reference models/utils.py:44-63).

    pos: [..., 2] in (0, 1); returns [..., 2*num_pos_feats] ordered (y, x).
    """
    import numpy as np

    scale = 2 * np.pi
    pos = pos * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    px = pos[..., 0, None] / dim_t
    py = pos[..., 1, None] / dim_t
    px = jnp.stack([jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])], axis=-1)
    px = px.reshape(px.shape[:-2] + (-1,))
    py = jnp.stack([jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])], axis=-1)
    py = py.reshape(py.shape[:-2] + (-1,))
    return jnp.concatenate([py, px], axis=-1)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Numerically-stable logit (reference models/utils.py:4-9)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.maximum(x, eps)
    x2 = jnp.maximum(1.0 - x, eps)
    return jnp.log(x1 / x2)
