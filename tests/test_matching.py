"""On-device Hungarian matcher vs scipy oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment as scipy_lsa

from simpb_tpu.training.matching import (
    batched_assignment,
    linear_sum_assignment,
    masked_assignment,
)


@pytest.mark.parametrize("r,c,seed", [(1, 5, 0), (4, 4, 1), (8, 30, 2),
                                      (32, 900, 3), (16, 16, 4)])
def test_matches_scipy_cost(r, c, seed):
    rng = np.random.default_rng(seed)
    cost = rng.normal(size=(r, c)).astype(np.float32) * 10
    ours = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
    rows, cols = scipy_lsa(cost)
    # optimal assignments may differ; total cost must match exactly
    assert len(set(ours.tolist())) == r  # distinct columns
    np.testing.assert_allclose(
        cost[np.arange(r), ours].sum(), cost[rows, cols].sum(), rtol=1e-5
    )


def test_degenerate_ties():
    cost = np.zeros((3, 5), np.float32)
    ours = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
    assert len(set(ours.tolist())) == 3


def test_masked_rows_do_not_steal_good_columns():
    # 2 valid rows strongly prefer cols 0 and 1; padded row must not
    # take them.
    cost = np.full((3, 4), 5.0, np.float32)
    cost[0, 0] = 0.0
    cost[1, 1] = 0.0
    valid = jnp.asarray([True, True, False])
    ours = np.asarray(masked_assignment(jnp.asarray(cost), valid))
    assert ours[0] == 0 and ours[1] == 1


def test_batched_and_jit():
    rng = np.random.default_rng(5)
    cost = rng.normal(size=(4, 8, 40)).astype(np.float32)
    valid = jnp.ones((4, 8), bool)
    f = jax.jit(lambda c, v: batched_assignment(c, v, 1e6))
    out = np.asarray(f(jnp.asarray(cost), valid))
    for b in range(4):
        rows, cols = scipy_lsa(cost[b])
        np.testing.assert_allclose(
            cost[b][np.arange(8), out[b]].sum(),
            cost[b][rows, cols].sum(),
            rtol=1e-5,
        )
