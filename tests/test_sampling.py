"""Sampling ops vs torch.grid_sample as an independent oracle.

The reference's pure-torch fallback path (models/blocks.py:215-246) uses
`F.grid_sample(align_corners=False, padding_mode='zeros')` with the same
`loc*size - 0.5` pixel convention as its CUDA kernel, so grid_sample is a
faithful oracle for our bilinear sampler away from the exact border.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from simpb_tpu.ops.format import SpatialShapes, pack_feature_maps, unpack_feature_maps
from simpb_tpu.ops.sampling import bilinear_sample, deformable_aggregation, msda


def torch_grid_sample(feat_hw_c, h, w, loc):
    """feat: [B, H*W, C]; loc: [B, N, 2] in (0,1). Returns [B, N, C]."""
    B, _, C = feat_hw_c.shape
    fm = torch.from_numpy(np.asarray(feat_hw_c)).reshape(B, h, w, C)
    fm = fm.permute(0, 3, 1, 2)  # B,C,H,W
    grid = torch.from_numpy(np.asarray(loc)) * 2 - 1  # (0,1)->(-1,1)
    grid = grid.reshape(B, 1, -1, 2)
    out = F.grid_sample(fm, grid, align_corners=False, padding_mode="zeros")
    return out[:, :, 0].permute(0, 2, 1).numpy()  # B,N,C


def test_bilinear_sample_matches_grid_sample_interior():
    rng = np.random.default_rng(0)
    B, h, w, C, N = 3, 16, 24, 8, 200
    feat = rng.normal(size=(B, h * w, C)).astype(np.float32)
    loc = rng.uniform(0.05, 0.95, size=(B, N, 2)).astype(np.float32)
    ours = np.asarray(
        bilinear_sample(jnp.asarray(feat), h, w, jnp.asarray(loc))
    )
    oracle = torch_grid_sample(feat, h, w, loc)
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_bilinear_sample_drops_out_of_range():
    rng = np.random.default_rng(1)
    B, h, w, C = 1, 8, 8, 4
    feat = rng.normal(size=(B, h * w, C)).astype(np.float32)
    loc = np.array([[[-0.1, 0.5], [0.5, 1.2], [0.0, 0.5], [1.0, 0.5]]], np.float32)
    out = np.asarray(
        bilinear_sample(jnp.asarray(feat), h, w, jnp.asarray(loc), True)
    )
    # DAF kernel drop semantics (cu:169-171): <=0 or >=1 is dropped.
    np.testing.assert_allclose(out, 0.0, atol=0)


def test_bilinear_border_zero_padding():
    # location just inside (0,1): partial contribution, matches grid_sample
    rng = np.random.default_rng(2)
    B, h, w, C = 1, 8, 8, 4
    feat = rng.normal(size=(B, h * w, C)).astype(np.float32)
    loc = np.array([[[0.01, 0.5], [0.99, 0.5], [0.5, 0.01]]], np.float32)
    ours = np.asarray(
        bilinear_sample(jnp.asarray(feat), h, w, jnp.asarray(loc), True)
    )
    oracle = torch_grid_sample(feat, h, w, loc)
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def make_packed(rng, bs=2, cams=3, c=16, shapes=((8, 12), (4, 6))):
    fmaps = [
        jnp.asarray(rng.normal(size=(bs, cams, h, w, c)).astype(np.float32))
        for h, w in shapes
    ]
    return pack_feature_maps(fmaps), fmaps


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(3)
    (col, ss), fmaps = make_packed(rng)
    assert col.shape == (2, 3, 8 * 12 + 4 * 6, 16)
    assert ss.start_indices == (0, 96)
    rec = unpack_feature_maps(col, ss)
    for a, b in zip(rec, fmaps):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_deformable_aggregation_against_dense_reference():
    """DAF == explicit per-(cam,level) grid_sample + weighted sum."""
    rng = np.random.default_rng(4)
    bs, cams, c, A, P, G = 2, 3, 16, 5, 4, 4
    shapes = ((8, 12), (4, 6))
    (col, ss), fmaps = make_packed(rng, bs, cams, c, shapes)
    pts = rng.uniform(0.05, 0.95, size=(bs, A, P, cams, 2)).astype(np.float32)
    wts = rng.uniform(size=(bs, A, P, cams, len(shapes), G)).astype(np.float32)

    out = np.asarray(
        deformable_aggregation(col, ss, jnp.asarray(pts), jnp.asarray(wts))
    )

    # dense reference: loop all dims with torch grid_sample
    expected = np.zeros((bs, A, c), np.float32)
    gd = c // G
    for lvl, (h, w) in enumerate(shapes):
        fm = np.asarray(fmaps[lvl]).reshape(bs * cams, h * w, c)
        loc = pts.transpose(0, 3, 1, 2, 4).reshape(bs * cams, A * P, 2)
        s = torch_grid_sample(fm, h, w, loc).reshape(bs, cams, A, P, c)
        for g in range(G):
            expected[..., g * gd : (g + 1) * gd] += np.einsum(
                "bnapd,bapn->bad",
                s[..., g * gd : (g + 1) * gd],
                wts[..., lvl, g],
            )
    np.testing.assert_allclose(out, expected, atol=1e-4)


def test_deformable_aggregation_grad_finite():
    import jax

    rng = np.random.default_rng(5)
    bs, cams, c, A, P, G = 1, 2, 8, 3, 2, 2
    shapes = ((4, 4), (2, 2))
    (col, ss), _ = make_packed(rng, bs, cams, c, shapes)
    pts = jnp.asarray(
        rng.uniform(0.1, 0.9, size=(bs, A, P, cams, 2)).astype(np.float32)
    )
    wts = jnp.asarray(
        rng.uniform(size=(bs, A, P, cams, 2, G)).astype(np.float32)
    )

    def loss(col, pts, wts):
        return jnp.sum(deformable_aggregation(col, ss, pts, wts) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(col, pts, wts)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).sum()) > 0


def test_msda_matches_manual():
    rng = np.random.default_rng(6)
    B, heads, hd, Q, P = 2, 2, 8, 7, 3
    shapes = ((6, 10), (3, 5))
    ss = SpatialShapes(shapes)
    total = ss.total
    value = rng.normal(size=(B, total, heads * hd)).astype(np.float32)
    # include out-of-range locations to exercise zero-padding borders
    loc = rng.uniform(-0.1, 1.1, size=(B, Q, heads, 2, P, 2)).astype(
        np.float32
    )
    attw = rng.uniform(size=(B, Q, heads, 2, P)).astype(np.float32)

    out = np.asarray(
        msda(jnp.asarray(value), ss, jnp.asarray(loc), jnp.asarray(attw))
    )

    value_h = value.reshape(B, total, heads, hd)
    expected = np.zeros((B, Q, heads, hd), np.float32)
    for lvl, (h, w) in enumerate(shapes):
        st = ss.start_indices[lvl]
        for hh in range(heads):
            fm = value_h[:, st : st + h * w, hh]  # [B, HW, hd]
            l = loc[:, :, hh, lvl].reshape(B, Q * P, 2)
            s = torch_grid_sample(fm, h, w, l).reshape(B, Q, P, hd)
            expected[:, :, hh] += np.einsum("bqpd,bqp->bqd", s, attw[:, :, hh, lvl])
    np.testing.assert_allclose(
        out, expected.reshape(B, Q, heads * hd), atol=1e-4
    )


def test_daf_compaction_matches_full():
    """Compacted gather (capacity < A*P) equals the full path when the
    capacity covers every in-range slot."""
    rng = np.random.default_rng(7)
    bs, cams, c, A, P, G = 1, 2, 16, 6, 4, 4
    shapes = ((8, 12), (4, 6))
    (col, ss), _ = make_packed(rng, bs, cams, c, shapes)
    pts = rng.uniform(-0.3, 1.3, size=(bs, A, P, cams, 2)).astype(np.float32)
    wts = rng.uniform(size=(bs, A, P, cams, len(shapes), G)).astype(np.float32)
    full = np.asarray(
        deformable_aggregation(col, ss, jnp.asarray(pts), jnp.asarray(wts))
    )
    compact = np.asarray(
        deformable_aggregation(
            col, ss, jnp.asarray(pts), jnp.asarray(wts),
            gather_capacity=A * P - 1,  # < S triggers compaction
        )
    )
    np.testing.assert_allclose(full, compact, atol=1e-4)


def test_daf_border_and_oob_semantics():
    """Fast path preserves exact drop/border semantics vs dense oracle."""
    rng = np.random.default_rng(8)
    bs, cams, c, A, P, G = 2, 2, 8, 4, 3, 2
    shapes = ((8, 12), (4, 6))
    (col, ss), fmaps = make_packed(rng, bs, cams, c, shapes)
    pts = rng.uniform(-0.2, 1.2, size=(bs, A, P, cams, 2)).astype(np.float32)
    wts = rng.uniform(size=(bs, A, P, cams, 2, G)).astype(np.float32)
    out = np.asarray(
        deformable_aggregation(col, ss, jnp.asarray(pts), jnp.asarray(wts))
    )
    gd = c // G
    expected = np.zeros((bs, A, c), np.float32)
    inr = (
        (pts[..., 0] > 0) & (pts[..., 0] < 1)
        & (pts[..., 1] > 0) & (pts[..., 1] < 1)
    )
    for lvl, (h, w) in enumerate(shapes):
        fm = np.asarray(fmaps[lvl]).reshape(bs * cams, h * w, c)
        loc = pts.transpose(0, 3, 1, 2, 4).reshape(bs * cams, A * P, 2)
        s = torch_grid_sample(fm, h, w, loc).reshape(bs, cams, A, P, c)
        s = s * inr.transpose(0, 3, 1, 2)[..., None]
        for g in range(G):
            expected[..., g * gd : (g + 1) * gd] += np.einsum(
                "bnapd,bapn->bad",
                s[..., g * gd : (g + 1) * gd],
                wts[..., lvl, g],
            )
    np.testing.assert_allclose(out, expected, atol=1e-4)
