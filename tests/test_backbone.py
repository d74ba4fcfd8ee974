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


def test_maxpool_formulation_matches_reduce_window():
    import flax.linen as nn
    from simpb_tpu.models.backbone import maxpool_3x3_s2

    rng = np.random.default_rng(3)
    for shape in [(2, 32, 48, 8), (1, 15, 21, 4), (3, 2, 2, 5)]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        ref = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )
        got = maxpool_3x3_s2(x)
        assert got.shape == ref.shape, shape
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_maxpool_gradients_match():
    import flax.linen as nn
    from simpb_tpu.models.backbone import maxpool_3x3_s2

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 12, 14, 3)).astype(np.float32))
    g_ref = jax.grad(
        lambda v: nn.max_pool(
            v, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        ).sum()
    )(x)
    g_got = jax.grad(lambda v: maxpool_3x3_s2(v).sum())(x)
    np.testing.assert_allclose(
        np.asarray(g_got), np.asarray(g_ref), rtol=1e-6, atol=1e-6
    )


def test_upsample2x_matches_resize():
    from simpb_tpu.models.backbone import upsample2x_nearest

    rng = np.random.default_rng(5)
    for shape, tgt in [
        ((2, 4, 11, 8), (8, 22)),   # exact-2x broadcast path
        ((1, 5, 7, 4), (9, 13)),    # non-2x fallback path
    ]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        ref = jax.image.resize(
            x, shape[:1] + tgt + shape[3:], method="nearest"
        )
        got = upsample2x_nearest(x, tgt)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_conv1x1_matmul_path_matches_conv():
    """Conv1x1's matmul lowering must be numerically identical (fp32) to
    the conv lowering, with nn.Conv-compatible params (same kernel/bias
    shapes so torch_convert and fuse_bn are unaffected)."""
    import flax.linen as nn
    from simpb_tpu.models.backbone import Conv1x1

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 16)).astype(np.float32))
    as_matmul = Conv1x1(24, use_bias=True, matmul_min_rows=1)
    as_conv = Conv1x1(24, use_bias=True, matmul_min_rows=1 << 40)
    variables = as_matmul.init(jax.random.PRNGKey(0), x)
    k = variables["params"]["kernel"]
    b = variables["params"]["bias"]
    assert k.shape == (1, 1, 16, 24) and b.shape == (24,)
    y_mm = as_matmul.apply(variables, x)
    y_cv = as_conv.apply(variables, x)
    y_ref = nn.Conv(24, (1, 1), use_bias=True).apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(y_mm), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(y_cv), np.asarray(y_ref), rtol=1e-6, atol=1e-6
    )


def test_conv1x1_stride_matches_conv():
    import flax.linen as nn
    from simpb_tpu.models.backbone import Conv1x1

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(1, 9, 11, 8)).astype(np.float32))
    mod = Conv1x1(4, stride=2, matmul_min_rows=1)
    variables = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(variables, x)
    y_ref = nn.Conv(4, (1, 1), strides=(2, 2), use_bias=False).apply(
        variables, x
    )
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )


def test_maxpool_large_shape_branch_matches():
    """The reduce_window branch (taken at r101 stem sizes) must agree
    with nn.max_pool; exercised with the threshold shape exactly."""
    import flax.linen as nn
    from simpb_tpu.models.backbone import maxpool_3x3_s2

    rng = np.random.default_rng(7)
    # past the 256*704 row threshold but cheap: 1 cam, few channels
    x = jnp.asarray(rng.normal(size=(1, 256, 704, 2)).astype(np.float32))
    ref = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    got = maxpool_3x3_s2(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fpn_extra_convs_relu_ordering():
    """mmdet `add_extra_convs='on_output'` + relu_before_extra_convs:
    the FIRST extra conv takes outs[-1] un-activated; relu starts at the
    second extra conv (mmdet fpn.py: range(used_backbone_levels + 1, ...))."""
    from flax.core import unfreeze
    from simpb_tpu.models.backbone import FPN

    rng = np.random.default_rng(0)
    inputs = [
        jnp.asarray(rng.normal(size=(1, s, s, 8)).astype(np.float32))
        for s in (8, 4)
    ]
    fpn = FPN(out_channels=8, num_outs=4)
    variables = fpn.init(jax.random.PRNGKey(0), inputs)
    outs = fpn.apply(variables, inputs)
    assert len(outs) == 4

    p = unfreeze(variables)["params"]

    def conv3x3(x, w, b, stride):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b

    # first extra: conv(outs[1]) with NO relu
    e0 = conv3x3(outs[1], p["fpn_extra_2"]["kernel"],
                 p["fpn_extra_2"]["bias"], 2)
    np.testing.assert_allclose(
        np.asarray(outs[2]), np.asarray(e0), atol=1e-5, rtol=1e-5)
    # second extra: conv(relu(prev))
    e1 = conv3x3(jax.nn.relu(outs[2]), p["fpn_extra_3"]["kernel"],
                 p["fpn_extra_3"]["bias"], 2)
    np.testing.assert_allclose(
        np.asarray(outs[3]), np.asarray(e1), atol=1e-5, rtol=1e-5)
