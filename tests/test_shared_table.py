"""Shared pair-table + post-sampling value projection (exact fast path).

The pair-table build is a full column copy; sharing ONE build across
every sampling call of an eval frame must be bit-identical for DFA (the
same op over the same table) and exact for patch-mode MSDA, where the
value projection moves AFTER sampling (legal because sampling is linear
in the value; border samples carry bilinear mass < 1, handled by the
`(wsum - 1) * bias` correction — see ops/sampling.py::msda_patch).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpb_tpu.configs.base import simpb_tiny
from simpb_tpu.ops.format import SpatialShapes
from simpb_tpu.ops.sampling import (
    deformable_aggregation,
    make_pair_table,
    msda,
    msda_patch,
)

pytestmark = pytest.mark.medium

SHAPES = SpatialShapes(((16, 24), (8, 12), (8, 10), (8, 8)))
HW = sum(h * w for h, w in SHAPES.shapes)


def test_dfa_precomputed_table_bitwise():
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.normal(size=(2, 3, HW, 32)).astype(np.float32)
    )
    pts = jnp.asarray(
        rng.uniform(-0.1, 1.1, size=(2, 12, 5, 3, 2)).astype(np.float32)
    )
    w = jnp.asarray(
        rng.uniform(size=(2, 12, 5, 3, 4, 4)).astype(np.float32)
    )
    table = make_pair_table(feats.reshape(-1, 32))
    for cap, sel in [(None, None), (24, None), (None, 2), (24, 2)]:
        a = deformable_aggregation(
            feats, SHAPES, pts, w, gather_capacity=cap, sel_levels=sel
        )
        b = deformable_aggregation(
            feats, SHAPES, pts, w, gather_capacity=cap, sel_levels=sel,
            pair_table=table,
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _msda_inputs(rng, b=3, q=10, heads=4, pts=2, c=32, border=False):
    L = SHAPES.num_levels
    value = rng.normal(size=(b, HW, c)).astype(np.float32)
    if border:
        # samples straddling the image border exercise bilinear mass < 1
        loc = rng.uniform(-0.02, 0.04, size=(b, q, heads, L, pts, 2))
    else:
        center = rng.uniform(0.3, 0.7, size=(b, q, 1, L, 1, 2))
        loc = center + (rng.uniform(size=(b, q, heads, L, pts, 2)) - 0.5) * 0.02
    w = rng.uniform(size=(b, q, heads, L, pts))
    w = w / w.sum(axis=(-2, -1), keepdims=True)
    return (
        jnp.asarray(value),
        jnp.asarray(loc.astype(np.float32)),
        jnp.asarray(w.astype(np.float32)),
    )


@pytest.mark.parametrize("sel", [None, 2])
def test_msda_patch_precomputed_table_bitwise(sel):
    rng = np.random.default_rng(1)
    value, loc, w = _msda_inputs(rng)
    table = make_pair_table(value.reshape(-1, value.shape[-1]))
    a = msda_patch(value, SHAPES, loc, w, sel_levels=sel)
    b = msda_patch(value, SHAPES, loc, w, sel_levels=sel, pair_table=table)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("border", [False, True])
@pytest.mark.parametrize("sel", [None, 2])
def test_post_projection_equals_project_then_sample(border, sel):
    """raw_heads sampling + per-head projection + (wsum-1)*bias must
    reproduce sampling of the projected value exactly."""
    rng = np.random.default_rng(2)
    c = 32
    heads = 4
    value, loc, w = _msda_inputs(rng, heads=heads, c=c, border=border)
    W = jnp.asarray(rng.normal(size=(c, c)).astype(np.float32) * 0.1)
    bvec = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))

    # reference: project the table, then sample
    ref = msda_patch(value @ W + bvec, SHAPES, loc, w, sel_levels=sel)

    # fast path: sample raw, project the Q rows
    sampled, wsum = msda_patch(
        value, SHAPES, loc, w, sel_levels=sel, raw_heads=True
    )
    head_mask = jnp.repeat(jnp.eye(heads), c // heads, axis=1)
    proj = sampled @ W  # [B, Q, H, C]
    out = jnp.einsum("bqhc,hc->bqc", proj, head_mask)
    out = out + jnp.einsum("bqh,hc->bqc", wsum, head_mask) * bvec
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4
    )


def test_msda_exact_precomputed_table_bitwise():
    rng = np.random.default_rng(3)
    value, loc, w = _msda_inputs(rng)
    table = make_pair_table(value.reshape(-1, value.shape[-1]))
    a = msda(value, SHAPES, loc, w)
    b = msda(value, SHAPES, loc, w, pair_table=table)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("border", [False, True])
def test_post_projection_equals_project_then_sample_exact_msda(border):
    """The raw_heads contract on the EXACT msda op: sample raw +
    per-head projection + (wsum-1)*bias == project-then-sample (the
    round-3 lever that lets the parity/guarded configs share one raw
    pair table across all 7 sampling calls of a frame)."""
    rng = np.random.default_rng(4)
    c = 32
    heads = 4
    value, loc, w = _msda_inputs(rng, heads=heads, c=c, border=border)
    W = jnp.asarray(rng.normal(size=(c, c)).astype(np.float32) * 0.1)
    bvec = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))

    ref = msda(value @ W + bvec, SHAPES, loc, w)

    sampled, wsum = msda(value, SHAPES, loc, w, raw_heads=True)
    head_mask = jnp.repeat(jnp.eye(heads), c // heads, axis=1)
    proj = sampled @ W  # [B, Q, H, C]
    out = jnp.einsum("bqhc,hc->bqc", proj, head_mask)
    out = out + jnp.einsum("bqh,hc->bqc", wsum, head_mask) * bvec
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4
    )


@pytest.mark.parametrize("patch", [True, False])
def test_head_share_sampling_table_exact(patch):
    """Eval forward with the shared table on vs off must match (patch
    mode exercises the patch post-projection path; patch=False the
    exact-msda raw_heads path)."""
    from simpb_tpu.models.detector import SimPB

    base = simpb_tiny()
    head_on = dataclasses.replace(
        base.head, msda_patch_mode=patch, share_sampling_table=True
    )
    head_off = dataclasses.replace(
        base.head, msda_patch_mode=patch, share_sampling_table=False
    )
    rng = jax.random.PRNGKey(0)
    cfg_on = dataclasses.replace(base, head=head_on)
    cfg_off = dataclasses.replace(base, head=head_off)
    m_on, m_off = SimPB(cfg_on), SimPB(cfg_off)
    W, H = base.input_size
    img = jax.random.normal(rng, (1, 6, H, W, 3), jnp.float32)
    proj = jnp.tile(jnp.eye(4)[None, None], (1, 6, 1, 1)) * 50.0
    variables = jax.jit(lambda: m_on.init(rng, img, proj, train=False))()
    out_on = jax.jit(lambda v: m_on.apply(v, img, proj, train=False))(
        variables
    )
    out_off = jax.jit(lambda v: m_off.apply(v, img, proj, train=False))(
        variables
    )
    # the projection-order change is mathematically exact but reorders
    # fp accumulation; through the 6-layer recurrent decoder that
    # amplifies to ~1e-3 on isolated elements
    np.testing.assert_allclose(
        np.asarray(out_on["prediction"][-1]),
        np.asarray(out_off["prediction"][-1]),
        atol=3e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_on["classification"][-1]),
        np.asarray(out_off["classification"][-1]),
        atol=3e-3,
    )


def test_train_path_unaffected_by_share_flag():
    """Training never uses the shared table (remat rebuilds per op), so
    the flag must not change training outputs."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_train_step import make_batch, tiny_config

    from simpb_tpu.configs.base import TrainConfig
    from simpb_tpu.models.detector import SimPB
    from simpb_tpu.training.train_step import (
        build_train_step,
        create_train_state,
        init_temporal,
    )

    base = tiny_config()
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    outs = []
    for share in (True, False):
        head = dataclasses.replace(
            base.head, msda_patch_mode=True, share_sampling_table=share
        )
        cfg = dataclasses.replace(base, head=head)
        model = SimPB(cfg)
        variables = jax.jit(
            lambda m=model: m.init(
                {"params": jax.random.PRNGKey(0),
                 "aug": jax.random.PRNGKey(1),
                 "dropout": jax.random.PRNGKey(2),
                 "sampling": jax.random.PRNGKey(3)},
                batch["img"], batch["projection_mat"], train=True,
            )
        )()
        tc = TrainConfig()
        state = create_train_state(model, variables, tc)
        step = jax.jit(build_train_step(model, tc))
        temporal, dn_state = init_temporal(cfg, 1)
        _, _, _, metrics = step(
            state, batch, temporal, dn_state, jax.random.PRNGKey(7)
        )
        outs.append(float(metrics["loss"]))
    assert np.isfinite(outs).all()
    assert outs[0] == outs[1]
