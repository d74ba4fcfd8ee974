"""encoder2d surface tests (reference simpb_head.py:214-276,
group_attn.py:259-346 — registered in the reference, disabled in every
released config).

Covers: sine positional encoding vs an independent torch oracle of the
mmdet formula, encoder forward/grad, decoder iterative refinement
semantics, and the head running end-to-end with encoder2d enabled
(shared and unshared).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpb_tpu.configs.base import simpb_tiny
from simpb_tpu.models.encoder2d import (
    DeformableDecoder2D,
    DeformableEncoder2D,
    sine_positional_encoding,
)
from simpb_tpu.ops.format import SpatialShapes


def torch_sine_pe(h, w, num_feats=128, temperature=10000, offset=-0.5):
    """Independent torch oracle of mmdet SinePositionalEncoding.forward
    (normalize=True) on an all-valid mask."""
    import torch

    mask = torch.zeros(1, h, w, dtype=torch.bool)
    not_mask = ~mask
    y_embed = not_mask.cumsum(1, dtype=torch.float32)
    x_embed = not_mask.cumsum(2, dtype=torch.float32)
    eps, scale = 1e-6, 2 * np.pi
    y_embed = (y_embed + offset) / (y_embed[:, -1:, :] + eps) * scale
    x_embed = (x_embed + offset) / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    B, H, W = mask.shape
    pos_x = torch.stack(
        (pos_x[:, :, :, 0::2].sin(), pos_x[:, :, :, 1::2].cos()), dim=4
    ).view(B, H, W, -1)
    pos_y = torch.stack(
        (pos_y[:, :, :, 0::2].sin(), pos_y[:, :, :, 1::2].cos()), dim=4
    ).view(B, H, W, -1)
    pos = torch.cat((pos_y, pos_x), dim=3)
    return pos[0].numpy()


@pytest.mark.parametrize("h,w", [(8, 16), (5, 7), (1, 2)])
def test_sine_positional_encoding_matches_mmdet(h, w):
    ours = sine_positional_encoding(h, w, num_feats=16)
    oracle = torch_sine_pe(h, w, num_feats=16)
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


SHAPES = SpatialShapes(((8, 16), (4, 8), (2, 4), (1, 2)))
N = sum(h * w for h, w in SHAPES.shapes)


def test_encoder_forward_and_grad():
    enc = DeformableEncoder2D(
        embed_dims=32, num_heads=4, num_levels=4, num_points=2, num_layers=2,
        feedforward_channels=64,
    )
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (2, 3, N, 32))
    params = enc.init(rng, feats, SHAPES)
    out = jax.jit(lambda p, f: enc.apply(p, f, SHAPES))(params, feats)
    assert out.shape == feats.shape
    assert np.isfinite(np.asarray(out)).all()

    # at mmcv init (zero offsets/weights) the attention output is a
    # plain average of bilinear samples at the grid-bias positions;
    # output must differ from input (residual + FFN applied)
    assert not np.allclose(np.asarray(out), np.asarray(feats))

    g = jax.grad(
        lambda p: jnp.sum(enc.apply(p, feats, SHAPES) ** 2)
    )(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # value/output projections must receive gradient
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


def test_decoder_iterative_refinement():
    import flax.linen as nn

    dec = DeformableDecoder2D(
        embed_dims=32, num_heads=4, num_levels=4, num_points=2, num_layers=3,
        feedforward_channels=64,
    )
    reg = nn.Dense(2)
    rng = jax.random.PRNGKey(1)
    mem = jax.random.normal(rng, (2, N, 32))
    q = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 32))
    refs = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(3), (2, 5, 2)))

    reg_params = reg.init(rng, q)
    bound_reg = lambda x: reg.apply(reg_params, x)
    params = dec.init(rng, q, None, refs, mem, SHAPES, reg_branch=bound_reg)
    inter, inter_refs = dec.apply(
        params, q, None, refs, mem, SHAPES, reg_branch=bound_reg
    )
    assert inter.shape == (3, 2, 5, 32)
    assert inter_refs.shape == (3, 2, 5, 2)
    r = np.asarray(inter_refs)
    assert np.isfinite(r).all() and (r >= 0).all() and (r <= 1).all()
    # refinement must actually move the reference points each layer
    assert not np.allclose(r[0], r[1])
    assert not np.allclose(r[1], r[2])


@pytest.mark.parametrize("share", [False, True])
def test_head_with_encoder2d(share, monkeypatch):
    from simpb_tpu.models.detector import SimPB

    cfg = simpb_tiny()
    head = dataclasses.replace(
        cfg.head, encoder2d_layers=1, share_encoder2d=share
    )
    cfg = dataclasses.replace(cfg, head=head)
    model = SimPB(cfg)
    rng = jax.random.PRNGKey(0)
    W, H = cfg.input_size
    img = jax.random.normal(rng, (1, 6, H, W, 3), jnp.float32)
    proj = jnp.tile(jnp.eye(4)[None, None], (1, 6, 1, 1))
    variables = jax.jit(lambda: model.init(rng, img, proj, train=False))()
    out = jax.jit(lambda v: model.apply(v, img, proj, train=False))(variables)
    assert np.isfinite(np.asarray(out["prediction"][-1])).all()
    assert np.isfinite(np.asarray(out["classification"][-1])).all()
    # encoder params actually exist in the tree
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    names = "/".join(str(k) for path, _ in flat for k in path)
    assert "encoder2d" in names


def test_msda_attention_reference_point_rank_equivalence():
    """The merged MSDAAttention must treat rank-2 reference points
    ([Q, 2], shared across batch) identically to the explicitly tiled
    rank-3 form ([B, Q, 2])."""
    from simpb_tpu.models.encoder2d import MSDAAttention

    attn = MSDAAttention(
        embed_dims=32, num_heads=4, num_levels=4, num_points=2
    )
    rng = jax.random.PRNGKey(0)
    b, q = 3, 10
    query = jax.random.normal(rng, (b, q, 32))
    value = jax.random.normal(jax.random.PRNGKey(1), (b, N, 32))
    refs2 = jax.random.uniform(jax.random.PRNGKey(2), (q, 2))
    params = attn.init(rng, query, None, refs2, value, SHAPES)
    out2 = attn.apply(params, query, None, refs2, value, SHAPES)
    refs3 = jnp.tile(refs2[None], (b, 1, 1))
    out3 = attn.apply(params, query, None, refs3, value, SHAPES)
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(out3), atol=1e-6, rtol=1e-6
    )
