"""Fused Pallas bottleneck trunk vs the flax module path.

The serving trunk (`backbone.py::fused_resnet_infer` +
`ops/conv_fused.py`) must reproduce `ResNet.apply(..., train=False)`
on the same variable tree. On the CPU mesh the kernel runs in
interpret mode; the same code lowers via Mosaic on TPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpb_tpu.models.backbone import (
    FPN, Bottleneck, ResNet, fused_fpn_infer, fused_resnet_infer,
)
from simpb_tpu.ops.conv_fused import (
    bottleneck_down_fused_infer, bottleneck_fused_infer,
    conv3x3_bias_fused, fold_block_params, fold_downsample_params,
    pick_tile_h,
)

pytestmark = pytest.mark.medium


def _randomize_bn(v, rng):
    """Non-trivial BN stats so the fold is actually exercised."""
    def visit(p, s):
        for key in p:
            if key.startswith("bn") or key.endswith("_bn"):
                p[key]["scale"] = jnp.asarray(
                    rng.uniform(0.8, 1.2, p[key]["scale"].shape), jnp.float32
                )
                p[key]["bias"] = jnp.asarray(
                    rng.normal(size=p[key]["bias"].shape) * 0.1, jnp.float32
                )
                s[key]["mean"] = jnp.asarray(
                    rng.normal(size=s[key]["mean"].shape) * 0.1, jnp.float32
                )
                s[key]["var"] = jnp.asarray(
                    rng.uniform(0.5, 1.5, s[key]["var"].shape), jnp.float32
                )
            elif isinstance(p[key], dict) and key in s:
                visit(p[key], s[key])
    v = jax.tree_util.tree_map(lambda a: a, v)  # shallow copy
    visit(v["params"], v["batch_stats"])
    return v


def test_single_block_matches_module():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 64)), jnp.float32)
    blk = Bottleneck(planes=16, stride=1, downsample=False,
                     dtype=jnp.float32)
    v = _randomize_bn(blk.init(jax.random.PRNGKey(0), x), rng)
    ref = blk.apply(v, x, False)
    got = bottleneck_fused_infer(
        x, fold_block_params(v["params"], v["batch_stats"]),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_single_block_odd_width_and_tile1():
    """W not lane-friendly, H forcing tile_h == 1."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 1, 7, 32)), jnp.float32)
    blk = Bottleneck(planes=8, stride=1, downsample=False,
                     dtype=jnp.float32)
    v = _randomize_bn(blk.init(jax.random.PRNGKey(0), x), rng)
    ref = blk.apply(v, x, False)
    got = bottleneck_fused_infer(
        x, fold_block_params(v["params"], v["batch_stats"]),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_trunk_matches_module_all_stages():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)), jnp.float32)
    trunk = ResNet(depth=50, dtype=jnp.float32)
    v = _randomize_bn(trunk.init(jax.random.PRNGKey(0), x), rng)
    ref = trunk.apply(v, x, train=False)
    got = fused_resnet_infer(v, x, depth=50, dtype=jnp.float32,
                             interpret=True)
    assert len(ref) == len(got) == 4
    for stage, (r, g) in enumerate(zip(ref, got)):
        assert r.shape == g.shape
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=5e-4, rtol=5e-4,
            err_msg=f"stage {stage}",
        )


@pytest.mark.parametrize("stride", [1, 2])
def test_downsample_block_matches_module(stride):
    """Stage-head bottleneck (downsample skip; stride 2 off stage 1)."""
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 64)), jnp.float32)
    blk = Bottleneck(planes=32, stride=stride, downsample=True,
                     dtype=jnp.float32)
    v = _randomize_bn(blk.init(jax.random.PRNGKey(0), x), rng)
    ref = blk.apply(v, x, False)
    got = bottleneck_down_fused_infer(
        x,
        fold_block_params(v["params"], v["batch_stats"]),
        fold_downsample_params(v["params"], v["batch_stats"]),
        stride,
        interpret=True,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_fused_fpn_matches_module():
    rng = np.random.default_rng(4)
    shapes = [(2, 16, 24, 64), (2, 8, 12, 128), (2, 4, 6, 256),
              (2, 2, 3, 512)]
    feats = [jnp.asarray(rng.normal(size=s), jnp.float32) for s in shapes]
    neck = FPN(out_channels=32, num_outs=4, dtype=jnp.float32)
    v = neck.init(jax.random.PRNGKey(0), feats)
    ref = neck.apply(v, feats)
    got = fused_fpn_infer(v, feats, dtype=jnp.float32, interpret=True)
    assert len(ref) == len(got)
    for lvl, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=2e-5, rtol=2e-5,
            err_msg=f"level {lvl}",
        )


def test_maxpool_fused_matches_reference():
    from simpb_tpu.models.backbone import maxpool_3x3_s2
    from simpb_tpu.ops.conv_fused import maxpool_3x3_s2_fused

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 8)), jnp.float32)
    ref = maxpool_3x3_s2(x)
    got = maxpool_3x3_s2_fused(x, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_conv3x3_bias_fused_matches_lax():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 32, 16)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    got = conv3x3_bias_fused(x, k, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_pick_tile_h():
    from simpb_tpu.ops.conv_fused import VMEM_BUDGET

    # grows while the budget allows, always divides height
    assert pick_tile_h(64, row_bytes=1 << 20) == 8  # 8 MB < budget < 16
    assert pick_tile_h(64, 1 << 20, fixed_bytes=6 << 20) == 4
    assert pick_tile_h(1, 100) == 1
    assert pick_tile_h(12, 100) == 4  # power-of-two divisor only
    assert pick_tile_h(64, 100, cap=16) == 16
    th = pick_tile_h(64, 123456, 789)
    assert 64 % th == 0 and th * 123456 + 789 <= VMEM_BUDGET


def test_multi_tile_grid_halo_arithmetic():
    """Force several H tiles per image so the hi>0 halo offsets, the
    Element index maps, and inter-tile halo reads actually execute
    (production shapes use 4+ tiles; the auto tile picker makes the
    small test shapes single-tile)."""
    from simpb_tpu.models.backbone import maxpool_3x3_s2
    from simpb_tpu.ops.conv_fused import maxpool_3x3_s2_fused

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(2, 16, 12, 32)), jnp.float32)

    # stride-1 bottleneck, 4 tiles
    blk = Bottleneck(planes=8, stride=1, downsample=False,
                     dtype=jnp.float32)
    v = _randomize_bn(blk.init(jax.random.PRNGKey(0), x), rng)
    ref = blk.apply(v, x, False)
    got = bottleneck_fused_infer(
        x, fold_block_params(v["params"], v["batch_stats"]),
        tile_h=4, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    # stride-2 stage head, 4 tiles of the 8-row output
    blk2 = Bottleneck(planes=8, stride=2, downsample=True,
                      dtype=jnp.float32)
    v2 = _randomize_bn(blk2.init(jax.random.PRNGKey(1), x), rng)
    ref2 = blk2.apply(v2, x, False)
    got2 = bottleneck_down_fused_infer(
        x, fold_block_params(v2["params"], v2["batch_stats"]),
        fold_downsample_params(v2["params"], v2["batch_stats"]),
        2, tile_h=2, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               atol=2e-5, rtol=2e-5)

    # 3x3 conv, 4 tiles
    k = jnp.asarray(rng.normal(size=(3, 3, 32, 16)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    ref3 = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    got3 = conv3x3_bias_fused(x, k, b, tile_h=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(ref3),
                               atol=2e-5, rtol=2e-5)

    # max-pool, 4 tiles of the 8-row output
    ref4 = maxpool_3x3_s2(x)
    got4 = maxpool_3x3_s2_fused(x, tile_h=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(got4), np.asarray(ref4))


@pytest.mark.parametrize("dt", [jnp.bfloat16])
def test_single_block_bf16(dt):
    """bf16 activations: fused result tracks the module within bf16
    rounding noise."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 8, 16, 64)), dt)
    blk = Bottleneck(planes=16, stride=1, downsample=False, dtype=dt)
    v = _randomize_bn(blk.init(jax.random.PRNGKey(0), x), rng)
    ref = np.asarray(blk.apply(v, x, False), np.float32)
    got = np.asarray(
        bottleneck_fused_infer(
            x, fold_block_params(v["params"], v["batch_stats"]),
            interpret=True,
        ),
        np.float32,
    )
    scale = max(np.abs(ref).max(), 1.0)
    assert np.abs(got - ref).max() / scale < 0.05
