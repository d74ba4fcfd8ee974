"""Exact linear assignment (Hungarian / LAPJV) on device.

The reference calls scipy `linear_sum_assignment` on CPU for every
(decoder layer x batch sample x camera group), forcing device->host syncs
in the middle of the training step (reference detection3d/target.py:136-144,
detection2d/coster.py:112-176 — flagged as a pathological hot spot in
SURVEY.md §3.1). Here the same exact algorithm — shortest augmenting path
with dual potentials, the classic Jonker-Volgenant scheme — runs in
`lax` loops on the TPU, vmappable over the batch, so target assignment
stays inside the jitted train step.

Costs must be finite. With R rows (GT, padded) and C columns (queries),
R <= C; every row gets a distinct column; complexity O(R^2 * C) with
R ~ 32, C ~ 900.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

INF = jnp.float32(1e30)


def linear_sum_assignment(cost: jnp.ndarray) -> jnp.ndarray:
    """Minimal-cost row->column assignment.

    Args:
      cost: [R, C] float cost matrix, R <= C, finite entries.

    Returns:
      col4row: [R] int32, the column assigned to each row.
    """
    R, C = cost.shape
    assert R <= C, "requires rows <= cols; transpose the cost matrix"
    cost = cost.astype(jnp.float32)

    def assign_row(cur, carry):
        u, v, col4row, row4col = carry

        # --- Dijkstra over columns from row `cur` ---
        spc = jnp.full((C,), INF)  # shortest path costs
        path = jnp.full((C,), -1, jnp.int32)
        sr = jnp.zeros((R,), bool)  # scanned rows
        sc = jnp.zeros((C,), bool)  # scanned cols

        def dij_cond(s):
            sink, *_ = s
            return sink < 0

        def dij_body(s):
            sink, i, min_val, spc, path, sr, sc = s
            sr = sr.at[i].set(True)
            reduced = min_val + cost[i] - u[i] - v
            better = (~sc) & (reduced < spc)
            path = jnp.where(better, i, path)
            spc = jnp.where(better, reduced, spc)
            masked = jnp.where(sc, INF, spc)
            j = jnp.argmin(masked).astype(jnp.int32)
            min_val = masked[j]
            sc = sc.at[j].set(True)
            nxt_row = row4col[j]
            sink = jnp.where(nxt_row < 0, j, -1)
            i = jnp.maximum(nxt_row, 0)
            return sink, i, min_val, spc, path, sr, sc

        sink, _, min_val, spc, path, sr, sc = lax.while_loop(
            dij_cond,
            dij_body,
            (jnp.int32(-1), cur, jnp.float32(0.0), spc, path, sr, sc),
        )

        # --- dual updates (scipy-equivalent) ---
        u = u.at[cur].add(min_val)
        other = sr & (jnp.arange(R) != cur)
        u = jnp.where(
            other, u + min_val - spc[jnp.maximum(col4row, 0)], u
        )
        v = jnp.where(sc, v - (min_val - spc), v)

        # --- augment along the alternating path ---
        def aug_cond(s):
            done, *_ = s
            return ~done

        def aug_body(s):
            done, sink, col4row, row4col = s
            i = path[sink]
            row4col = row4col.at[sink].set(i)
            old = col4row[i]
            col4row = col4row.at[i].set(sink)
            done = i == cur
            sink = jnp.maximum(old, 0)
            return done, sink, col4row, row4col

        _, _, col4row, row4col = lax.while_loop(
            aug_cond, aug_body, (jnp.array(False), sink, col4row, row4col)
        )
        return u, v, col4row, row4col

    u = jnp.zeros((R,), jnp.float32)
    v = jnp.zeros((C,), jnp.float32)
    col4row = jnp.full((R,), -1, jnp.int32)
    row4col = jnp.full((C,), -1, jnp.int32)
    u, v, col4row, row4col = lax.fori_loop(
        0, R, assign_row, (u, v, col4row, row4col)
    )
    return col4row


def masked_assignment(
    cost: jnp.ndarray, row_valid: jnp.ndarray, pad_cost: float = 1e6
) -> jnp.ndarray:
    """Assignment with invalid (padded) rows pushed to a constant cost.

    Invalid rows still receive distinct columns (as in the reference's
    padded Hungarian calls) but their matches carry no loss; callers mask
    with `row_valid`.

    Args:
      cost: [R, C]; row_valid: [R] bool.

    Returns: col4row [R] int32 (meaningful only where row_valid).
    """
    safe = jnp.where(row_valid[:, None], cost, pad_cost)
    safe = jnp.nan_to_num(safe, nan=pad_cost, posinf=pad_cost, neginf=-pad_cost)
    return linear_sum_assignment(safe)


batched_assignment = jax.vmap(masked_assignment, in_axes=(0, 0, None))
