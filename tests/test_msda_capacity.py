"""QueryGroupMSDA valid-slot compaction: exactness on valid slots.

Covers the head's merged-DN call contract (models/head.py): during
training the MSDA call carries k real + kd denoising slots per camera,
and the head widens the configured capacity by kd
(`capacity_override = msda_gather_capacity + kd`) so the compaction
stays exact for the DN branch too. Here we prove the module-level
guarantee that makes that arithmetic sufficient: whenever the
per-camera VALID count fits the capacity, compacted outputs are
numerically identical to uncapped outputs on every valid slot —
including valid slots at tail indices (the DN block sits at indices
k..k+kd-1, which an undersized cap would drop first).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpb_tpu.models.group_attn import QueryGroupMSDA
from simpb_tpu.ops.format import SpatialShapes

SHAPES = SpatialShapes(((16, 24), (8, 12), (8, 10), (8, 8)))
HW = sum(h * w for h, w in SHAPES.shapes)
BS, CAMS, K, C = 1, 2, 16, 32


def _inputs(valid_counts, tail_valid=0):
    """ref_depth > 0 on the first `valid_counts[cam]` slots, plus
    `tail_valid` slots at the very end of each camera block (standing in
    for the DN block, which lives at tail indices in the merged call)."""
    rng = np.random.default_rng(7)
    q = rng.normal(size=(BS, CAMS * K, C)).astype(np.float32)
    qp = rng.normal(size=(BS, CAMS * K, C)).astype(np.float32)
    ref = rng.uniform(0.2, 0.8, size=(BS, CAMS * K, 2)).astype(np.float32)
    depth = np.zeros((BS, CAMS, K, 1), np.float32)
    for cam in range(CAMS):
        depth[:, cam, : valid_counts[cam]] = rng.uniform(
            1.0, 10.0, size=(BS, valid_counts[cam], 1)
        )
        if tail_valid:
            depth[:, cam, K - tail_valid :] = rng.uniform(
                1.0, 10.0, size=(BS, tail_valid, 1)
            )
    value = rng.normal(size=(BS, CAMS, HW, C)).astype(np.float32)
    return (
        jnp.asarray(q),
        jnp.asarray(qp),
        jnp.asarray(ref),
        jnp.asarray(depth.reshape(BS, CAMS * K, 1)),
        jnp.asarray(value),
    )


def _run(patch_mode, capacity_override, inputs):
    mod = QueryGroupMSDA(
        embed_dims=C, num_heads=4, num_levels=4, num_points=2,
        num_cams=CAMS, dropout=0.0, patch_mode=patch_mode,
    )
    q, qp, ref, depth, value = inputs
    variables = mod.init(
        jax.random.PRNGKey(0), q, qp, ref, depth, value, SHAPES
    )
    out = mod.apply(
        variables, q, qp, ref, depth, value, SHAPES,
        capacity_override=capacity_override,
    )
    return np.asarray(out)


@pytest.mark.parametrize("patch_mode", [False, True])
def test_compaction_exact_when_cap_covers_valid(patch_mode):
    inputs = _inputs(valid_counts=[11, 9])
    full = _run(patch_mode, None, inputs)
    capped = _run(patch_mode, 12, inputs)  # 12 >= max valid 11, < K=16
    valid = np.asarray(inputs[3][..., 0] > 0).reshape(BS, CAMS * K)
    np.testing.assert_allclose(
        capped[valid], full[valid], rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("patch_mode", [False, True])
def test_compaction_exact_with_tail_dn_slots(patch_mode):
    # 8 valid real slots + 4 valid tail (DN-style) slots per camera:
    # cap 12 = real cap 8 + kd-widening 4 must cover BOTH blocks
    inputs = _inputs(valid_counts=[8, 6], tail_valid=4)
    full = _run(patch_mode, None, inputs)
    capped = _run(patch_mode, 12, inputs)
    valid = np.asarray(inputs[3][..., 0] > 0).reshape(BS, CAMS * K)
    np.testing.assert_allclose(
        capped[valid], full[valid], rtol=2e-5, atol=2e-5
    )


def test_undersized_cap_would_drop_tail_slots():
    """Sanity of the test itself (and of the bug the kd-widening fixed):
    a cap sized only for the real block must NOT reproduce the uncapped
    output on the tail (DN) slots."""
    inputs = _inputs(valid_counts=[8, 8], tail_valid=4)  # demand 12/cam
    full = _run(False, None, inputs)
    capped = _run(False, 8, inputs)  # covers only the real block
    valid = np.asarray(inputs[3][..., 0] > 0).reshape(BS, CAMS * K)
    assert not np.allclose(capped[valid], full[valid], rtol=2e-5, atol=2e-5)
