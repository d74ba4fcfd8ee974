"""Patch-mode MSDA (approximate fast path) vs exact `msda`.

Exact equality is required whenever every sample of a (query, level)
falls inside the patch window and the image interior; the clamped
far-offset case must stay finite and bounded.
"""
import jax
import jax.numpy as jnp
import numpy as np

from simpb_tpu.ops.format import SpatialShapes
from simpb_tpu.ops.sampling import msda, msda_patch

SHAPES = SpatialShapes(shapes=((16, 44), (8, 22)))


def make_inputs(seed, spread, b=2, q=5, heads=4, p=3, c=32):
    rng = np.random.default_rng(seed)
    total = sum(h * w for h, w in SHAPES.shapes)
    value = rng.normal(size=(b, total, c)).astype(np.float32)
    L = len(SHAPES.shapes)
    # cluster all of a query's samples around one interior reference
    ref = rng.uniform(0.3, 0.7, (b, q, 1, 1, 1, 2))
    jitter = rng.uniform(-spread, spread, (b, q, heads, L, p, 2))
    loc = (ref + jitter).astype(np.float32)
    w = rng.uniform(size=(b, q, heads, L, p)).astype(np.float32)
    w /= w.sum((-1, -2), keepdims=True)
    return jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w)


def test_patch_mode_exact_when_samples_fit_window():
    # spread 0.02 of normalised units -> <=0.9 px at the largest level:
    # all samples fit an 8x8 window around the mean
    value, loc, w = make_inputs(0, spread=0.02)
    exact = np.asarray(msda(value, SHAPES, loc, w))
    patch = np.asarray(msda_patch(value, SHAPES, loc, w))
    np.testing.assert_allclose(patch, exact, rtol=1e-5, atol=1e-5)


def test_patch_mode_exact_at_image_borders():
    """Samples hanging off the image edge (partial zero-pad support)
    must match exact msda — the window sits at the border and the
    out-of-image corner drops through the one-hot, exactly like
    grid_sample zero padding."""
    rng = np.random.default_rng(7)
    total = sum(h * w for h, w in SHAPES.shapes)
    b, q, heads, p, c = 2, 6, 4, 3, 32
    L = len(SHAPES.shapes)
    value = jnp.asarray(rng.normal(size=(b, total, c)).astype(np.float32))
    # cluster each query's samples around a point near a border (all
    # four borders exercised), straddling in/out of the image
    centers = np.array(
        [[0.004, 0.5], [0.996, 0.5], [0.5, 0.01], [0.5, 0.99],
         [0.003, 0.02], [0.998, 0.985]]
    )[None, :q, None, None, None, :]
    jitter = rng.uniform(-0.012, 0.012, (b, q, heads, L, p, 2))
    loc = jnp.asarray((centers + jitter).astype(np.float32))
    w = rng.uniform(size=(b, q, heads, L, p)).astype(np.float32)
    w /= w.sum((-1, -2), keepdims=True)
    w = jnp.asarray(w)
    exact = np.asarray(msda(value, SHAPES, loc, w))
    patch = np.asarray(msda_patch(value, SHAPES, loc, w))
    np.testing.assert_allclose(patch, exact, rtol=1e-4, atol=1e-5)


def test_patch_mode_clamps_far_offsets_finite():
    value, loc, w = make_inputs(1, spread=0.6)  # many samples outside
    patch = np.asarray(msda_patch(value, SHAPES, loc, w))
    assert np.isfinite(patch).all()
    # bounded by the value range times total weight
    assert np.abs(patch).max() <= np.abs(np.asarray(value)).max() * 1.01


def test_patch_mode_zeroes_out_of_image_samples():
    value, loc, w = make_inputs(2, spread=0.0)
    # push every sample far outside the image -> output must be ~0
    far = jnp.full_like(loc, 3.0)
    out = np.asarray(msda_patch(value, SHAPES, far, w))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_patch_mode_differentiable():
    value, loc, w = make_inputs(3, spread=0.02)

    def f(v, l, a):
        return msda_patch(v, SHAPES, l, a).sum()

    gv, gl, ga = jax.grad(f, argnums=(0, 1, 2))(value, loc, w)
    for g in (gv, gl, ga):
        assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(gv)).sum() > 0
