"""Backbone stem: the space-to-depth fast path must be EXACTLY the
7x7/s2 convolution (same param, same function — PERF.md lever #4)."""
import jax
import jax.numpy as jnp
import numpy as np

from simpb_tpu.models.backbone import StemConv


def _run(s2d: bool, x, kernel):
    mod = StemConv(features=16, s2d=s2d)
    return mod.apply({"params": {"kernel": kernel}}, x)


def test_s2d_stem_matches_plain_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 3)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(7, 7, 3, 16)).astype(np.float32))
    plain = np.asarray(_run(False, x, kernel))
    fast = np.asarray(_run(True, x, kernel))
    assert plain.shape == fast.shape == (2, 16, 24, 16)
    np.testing.assert_allclose(fast, plain, rtol=1e-5, atol=1e-5)


def test_s2d_stem_falls_back_on_odd_sizes():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 31, 47, 3)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(7, 7, 3, 16)).astype(np.float32))
    plain = np.asarray(_run(False, x, kernel))
    fast = np.asarray(_run(True, x, kernel))
    np.testing.assert_allclose(fast, plain, rtol=1e-5, atol=1e-5)


def test_s2d_stem_gradients_match():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(7, 7, 3, 16)).astype(np.float32))

    g_plain = jax.grad(lambda k: _run(False, x, k).sum())(kernel)
    g_fast = jax.grad(lambda k: _run(True, x, k).sum())(kernel)
    np.testing.assert_allclose(
        np.asarray(g_fast), np.asarray(g_plain), rtol=1e-4, atol=1e-4
    )
