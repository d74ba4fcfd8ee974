"""Top-k level-selection fast knob (`sel_levels`) for the two gather ops.

Properties tested (see ops/sampling.py docstrings):
  * k = L reproduces the all-level path (selection is then a reorder);
  * when the fusion/attention weights put mass on <= k levels, top-k
    selection is EXACT vs the all-level path;
  * the deviation of k < L selection is bounded by the dropped weight
    mass times the feature range;
  * gradients stay finite through the selection.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpb_tpu.ops.format import SpatialShapes
from simpb_tpu.ops.sampling import deformable_aggregation, msda_patch

pytestmark = pytest.mark.medium

SHAPES = SpatialShapes(((16, 24), (8, 12), (8, 10), (8, 8)))
HW = sum(h * w for h, w in SHAPES.shapes)


def _dfa_inputs(rng, bs=2, cams=3, a=12, p=5, g=4, c=32, conc=None):
    feats = rng.normal(size=(bs, cams, HW, c)).astype(np.float32)
    pts = rng.uniform(0.05, 0.95, size=(bs, a, p, cams, 2)).astype(
        np.float32
    )
    # some out-of-range slots exercise the drop semantics
    pts[:, 0, 0] = 1.4
    raw = rng.normal(size=(bs, a, p, cams, SHAPES.num_levels, g))
    if conc is not None:
        # keep weight mass on `conc` levels only (per slot)
        mask = np.zeros((SHAPES.num_levels,))
        mask[list(conc)] = 1.0
        w = np.exp(raw) * mask[None, None, None, None, :, None]
        w = w / np.maximum(w.sum(axis=(-2, -1), keepdims=True), 1e-9)
    else:
        w = np.exp(raw)
        w = w / w.sum(axis=(-2, -1), keepdims=True)
    return (
        jnp.asarray(feats),
        jnp.asarray(pts),
        jnp.asarray(w.astype(np.float32)),
    )


def test_dfa_sel_all_levels_matches_exact():
    rng = np.random.default_rng(0)
    feats, pts, w = _dfa_inputs(rng)
    full = deformable_aggregation(feats, SHAPES, pts, w)
    sel = deformable_aggregation(
        feats, SHAPES, pts, w, sel_levels=SHAPES.num_levels
    )
    np.testing.assert_allclose(np.asarray(sel), np.asarray(full), atol=2e-5)


def test_dfa_sel_exact_when_mass_concentrated():
    rng = np.random.default_rng(1)
    feats, pts, w = _dfa_inputs(rng, conc=(1, 3))
    full = deformable_aggregation(feats, SHAPES, pts, w)
    sel = deformable_aggregation(feats, SHAPES, pts, w, sel_levels=2)
    np.testing.assert_allclose(np.asarray(sel), np.asarray(full), atol=2e-5)


def test_dfa_sel_deviation_bounded_by_dropped_mass():
    rng = np.random.default_rng(2)
    feats, pts, w = _dfa_inputs(rng)
    full = np.asarray(deformable_aggregation(feats, SHAPES, pts, w))
    sel = np.asarray(
        deformable_aggregation(feats, SHAPES, pts, w, sel_levels=2)
    )
    # dropped mass per (bs, anchor): sum over points/cams of the two
    # lightest levels' weights; |Δ| <= dropped_mass * max|feat| since
    # each dropped term is weight * bilinear-sample (a convex combo of
    # feature values)
    mass = np.asarray(w).sum(-1)  # [bs, a, p, cams, L]
    dropped = np.sort(mass, axis=-1)[..., :2].sum(-1).sum(axis=(2, 3))
    bound = dropped[..., None] * np.abs(np.asarray(feats)).max() + 1e-4
    assert (np.abs(sel - full) <= bound).all()


def test_dfa_sel_with_capacity_and_grads():
    rng = np.random.default_rng(3)
    feats, pts, w = _dfa_inputs(rng)

    def f(feats, w):
        out = deformable_aggregation(
            feats, SHAPES, pts, w, gather_capacity=32, sel_levels=2
        )
        return jnp.sum(out**2)

    g1, g2 = jax.grad(f, argnums=(0, 1))(feats, w)
    assert np.isfinite(np.asarray(g1)).all()
    assert np.isfinite(np.asarray(g2)).all()
    # selected levels' weights must receive gradient
    assert float(jnp.abs(g2).sum()) > 0


def _msda_inputs(rng, b=3, q=10, heads=4, pts=2, c=32, conc=None):
    L = SHAPES.num_levels
    value = rng.normal(size=(b, HW, c)).astype(np.float32)
    loc = rng.uniform(0.1, 0.9, size=(b, q, heads, L, pts, 2)).astype(
        np.float32
    )
    # keep each (query, level)'s samples within one 8x8 window so the
    # windowed op itself is exact and only level selection deviates
    center = rng.uniform(0.3, 0.7, size=(b, q, 1, L, 1, 2))
    loc = (center + (loc - 0.5) * 0.02).astype(np.float32)
    raw = rng.normal(size=(b, q, heads, L, pts))
    if conc is not None:
        mask = np.zeros((L,))
        mask[list(conc)] = 1.0
        w = np.exp(raw) * mask[None, None, None, :, None]
    else:
        w = np.exp(raw)
    w = w / np.maximum(w.sum(axis=(-2, -1), keepdims=True), 1e-9)
    return (
        jnp.asarray(value),
        jnp.asarray(loc),
        jnp.asarray(w.astype(np.float32)),
    )


def test_msda_patch_sel_all_levels_matches():
    rng = np.random.default_rng(4)
    value, loc, w = _msda_inputs(rng)
    full = msda_patch(value, SHAPES, loc, w)
    sel = msda_patch(value, SHAPES, loc, w, sel_levels=SHAPES.num_levels)
    np.testing.assert_allclose(np.asarray(sel), np.asarray(full), atol=2e-5)


def test_msda_patch_sel_exact_when_mass_concentrated():
    rng = np.random.default_rng(5)
    value, loc, w = _msda_inputs(rng, conc=(0, 2))
    full = msda_patch(value, SHAPES, loc, w)
    sel = msda_patch(value, SHAPES, loc, w, sel_levels=2)
    np.testing.assert_allclose(np.asarray(sel), np.asarray(full), atol=2e-5)


def test_msda_patch_sel_deviation_bounded_by_dropped_mass():
    rng = np.random.default_rng(6)
    value, loc, w = _msda_inputs(rng)
    full = np.asarray(msda_patch(value, SHAPES, loc, w))
    sel = np.asarray(msda_patch(value, SHAPES, loc, w, sel_levels=2))
    # per (b, q, head): dropped attention mass of the 2 lightest levels
    mass = np.asarray(w).sum(-1)  # [b, q, heads, L]
    per_q = np.sort(mass.sum(2), axis=-1)[..., :2].sum(-1)  # [b, q]
    bound = per_q[..., None] * np.abs(np.asarray(value)).max() + 1e-4
    assert (np.abs(sel - full) <= bound).all()


def test_msda_patch_sel_grads_finite():
    rng = np.random.default_rng(7)
    value, loc, w = _msda_inputs(rng)

    def f(value, loc, w):
        return jnp.sum(msda_patch(value, SHAPES, loc, w, sel_levels=2) ** 2)

    gs = jax.grad(f, argnums=(0, 1, 2))(value, loc, w)
    for g in gs:
        assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(gs[2]).sum()) > 0


def test_msda_patch_sel_small_level_fallback():
    """Pyramids with a level smaller than the patch fall back to the
    all-level loop (selection silently off — the static path is exact)."""
    shapes = SpatialShapes(((16, 24), (2, 4)))
    hw = sum(h * w for h, w in shapes.shapes)
    rng = np.random.default_rng(8)
    value = jnp.asarray(rng.normal(size=(2, hw, 16)).astype(np.float32))
    loc = jnp.asarray(
        rng.uniform(0.3, 0.7, size=(2, 5, 4, 2, 2, 2)).astype(np.float32)
    )
    w = jnp.asarray(
        rng.uniform(size=(2, 5, 4, 2, 2)).astype(np.float32)
    )
    out_sel = msda_patch(value, shapes, loc, w, sel_levels=1)
    out_full = msda_patch(value, shapes, loc, w)
    np.testing.assert_allclose(
        np.asarray(out_sel), np.asarray(out_full), atol=1e-6
    )


def test_dfa_level_capacity_exact_when_mass_fits():
    """Per-level budget (dfa level_capacity) is exact when each level's
    nonzero-mass in-range slots fit the budget."""
    rng = np.random.default_rng(9)
    feats, pts, w = _dfa_inputs(rng, a=12, p=5)
    # zero the mass of most slots at every level: keep 8 slots per level
    w_np = np.asarray(w)
    s = 12 * 5
    mask = np.zeros((2, 12, 5, 3, SHAPES.num_levels, 1))
    keep_slots = rng.permutation(s)[:8]
    ka, kp = keep_slots // 5, keep_slots % 5
    mask[:, ka, kp] = 1.0
    w2 = jnp.asarray((w_np * mask).astype(np.float32))
    # same gather_capacity in both — the budget's exactness claim is
    # relative to the capacity-compacted baseline
    full = deformable_aggregation(feats, SHAPES, pts, w2,
                                  gather_capacity=32)
    got = deformable_aggregation(
        feats, SHAPES, pts, w2, gather_capacity=32, level_capacity=16
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               atol=2e-5)


def test_dfa_level_capacity_deviation_bounded_and_grads():
    rng = np.random.default_rng(10)
    feats, pts, w = _dfa_inputs(rng)
    full = np.asarray(deformable_aggregation(feats, SHAPES, pts, w))
    got = np.asarray(deformable_aggregation(
        feats, SHAPES, pts, w, gather_capacity=32, level_capacity=16
    ))
    # |delta| <= total dropped weight mass * max|feat| (drop is
    # weight-prioritised, so it's even tighter; use the loose bound)
    bound = np.asarray(w).sum(axis=(2, 3, 4, 5))[..., None] * np.abs(
        np.asarray(feats)).max() + 1e-4
    assert (np.abs(got - full) <= bound).all()

    def f(feats, w):
        out = deformable_aggregation(
            feats, SHAPES, pts, w, gather_capacity=32, level_capacity=16
        )
        return jnp.sum(out**2)

    g1, g2 = jax.grad(f, argnums=(0, 1))(feats, w)
    assert np.isfinite(np.asarray(g1)).all()
    assert np.isfinite(np.asarray(g2)).all()
    assert float(jnp.abs(g2).sum()) > 0
