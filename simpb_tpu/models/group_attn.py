"""Per-camera query-group attention (2D branch).

TPU-native equivalents of reference models/group_attn.py:

* `QueryGroupSelfAttention` — the reference builds a block-diagonal
  `-inf` mask over ragged per-camera groups and runs one big MHA
  (group_attn.py:104-133). With static per-camera capacity K the groups
  are constant slices, so we fold cameras into the batch axis and run a
  dense per-camera attention instead — no mask materialisation, and
  invalid (padded) slots are masked as keys. `nan_to_num` on fully
  masked rows (group_attn.py:131) is handled inside `masked_softmax`.

* `QueryGroupMSDA` — the reference loops over camera groups calling the
  mmcv CUDA `MultiScaleDeformableAttnFunction` per camera
  (group_attn.py:222-235). Here cameras fold into the batch axis and a
  single XLA msda contraction covers all groups.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.format import SpatialShapes
from ..ops.sampling import (
    msda,
    msda_clamp_demand,
    msda_hybrid,
    msda_patch,
    msda_window_stats,
)
from .layers import MultiheadAttention


class QueryGroupSelfAttention(nn.Module):
    """Self-attention restricted to each camera's query slots.

    Operates on the decoupled (2x embed) concat of query+pos like the
    reference's graph_model2d path (simpb_head.py:312-321); the caller
    provides already-concatenated queries and the `fc_before2d` value.
    """

    embed_dims: int  # attention width (2x model dim when decoupled)
    num_heads: int = 8
    num_cams: int = 6
    attn_drop: float = 0.1
    proj_drop: float = 0.0
    out_drop: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [bs, cams*K, E]
        value: jnp.ndarray,  # [bs, cams*K, E]
        valid: jnp.ndarray,  # [bs, cams*K] bool
        deterministic: bool = True,
        identity: Optional[jnp.ndarray] = None,  # residual base
    ) -> jnp.ndarray:
        bs, q_total, e = query.shape
        k = q_total // self.num_cams
        fold = lambda x: x.reshape(bs * self.num_cams, k, *x.shape[2:])
        q = fold(query)
        v = fold(value)
        key_mask = fold(valid)
        # mask invalid slots as keys: [B, 1, K] broadcast over query rows
        bias = jnp.where(key_mask[:, None, :], 0.0, -jnp.inf)
        out = MultiheadAttention(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            attn_drop=self.attn_drop,
            dtype=self.dtype,
            name="attn",
        )(q, q, v, attn_mask=bias, deterministic=deterministic)
        if self.out_drop > 0.0:
            out = nn.Dropout(rate=self.out_drop)(
                out, deterministic=deterministic
            )
        out = out.reshape(bs, q_total, e)
        # mmcv MultiheadAttention residual uses the pos-free identity
        # (captured before query_pos is added); callers on the
        # non-decoupled path pass it explicitly
        base = query if identity is None else identity
        return base + out


def msda_offset_bias_init(num_heads: int, num_levels: int, num_points: int):
    """Grid-direction bias init for sampling offsets (mmcv MSDA init)."""
    thetas = np.arange(num_heads, dtype=np.float32) * (
        2.0 * np.pi / num_heads
    )
    grid = np.stack([np.cos(thetas), np.sin(thetas)], axis=-1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(
        grid[:, None, None, :], (1, num_levels, num_points, 1)
    )
    for i in range(num_points):
        grid[:, :, i, :] *= i + 1
    flat = grid.reshape(-1)

    def init(key, shape, dtype=jnp.float32):
        del key
        return jnp.asarray(flat, dtype).reshape(shape)

    return init


class QueryGroupMSDA(nn.Module):
    """Per-camera multi-scale deformable cross-attention for 2D queries.

    Reference group_attn.py:136-256 with `residual_mode='cat'`
    (config:185-192): each camera's query slice attends only to its own
    camera's multi-level features. Sampling locations whose allocated
    reference depth is zero are zeroed (group_attn.py:218-221) — with
    static allocation this covers exactly the padded slots.
    """

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    num_cams: int = 6
    dropout: float = 0.1
    residual_mode: str = "cat"
    dtype: jnp.dtype = jnp.float32
    # approximate fast sampling path (PERF.md lever #1); exact when off
    patch_mode: bool = False
    # per-camera cap on slots actually sampled: only slots with an
    # allocated depth are gathered (padded slots' sampled values are
    # dead downstream — masked as self-attn keys, zero trans_matrix rows
    # in aggregation, zero loss weight — so compacting them away is
    # EXACT whenever the per-camera valid count fits the cap; the
    # reference's ragged layout never materialises them at all,
    # group_attn.py:198-235). None disables compaction.
    gather_capacity: Optional[int] = None
    # per-query top-k level selection (patch mode only; 0/None = all)
    sel_levels: Optional[int] = None
    # window size (H, W) for patch-mode sampling. 8x8 covers any
    # per-(query, level) sample spread <= 7 px exactly; 6x6 measured
    # ~+0.5 ms/frame faster at r50 but clamps reach sooner (PERF.md)
    patch_hw: Tuple[int, int] = (8, 8)
    # hybrid exact mode (ops/sampling.py::msda_hybrid): windowed
    # sampling + an exact correction lane over the window-clamped
    # (query, level) entries — value-exact while the per-camera clamped
    # demand fits `clamp_capacity` (the serving path for checkpoints
    # TRAINED under exact semantics). Overrides patch_mode.
    hybrid_mode: bool = False
    clamp_capacity: int = 128
    # in-graph exactness guard: sow per-frame overflow counters into the
    # "guards" collection (slot-cap overflow; window clamp + dropped
    # level mass in patch mode) so capped/windowed semantics become a
    # CHECKED invariant at eval (VERDICT.md round-2 item 1b)
    guard: bool = False

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [bs, cams*K, C]
        query_pos: jnp.ndarray,  # [bs, cams*K, C]
        reference_points: jnp.ndarray,  # [bs, cams*K, 2] normalised
        ref_depth: jnp.ndarray,  # [bs, cams*K, 1]
        value: jnp.ndarray,  # [bs, cams, ΣHW, C]
        spatial_shapes: SpatialShapes,
        deterministic: bool = True,
        pair_table: Optional[jnp.ndarray] = None,
        capacity_override: Optional[int] = None,
    ) -> jnp.ndarray:
        bs, q_total, c = query.shape
        k = q_total // self.num_cams
        identity = query
        if query_pos is not None:
            query = query + query_pos

        value_proj = nn.Dense(
            self.embed_dims, dtype=self.dtype, name="value_proj"
        )
        # post-projection mode (shared raw pair table, patch OR exact
        # path): sampling is linear in the value, so the value
        # projection is applied to the Q sampled rows instead of the
        # ΣHW table rows — one raw `make_pair_table` then serves every
        # sampling call of the frame (exact; border bias handled via
        # the sampled weight mass, see ops/sampling.py::msda_patch and
        # ops/sampling.py::msda `raw_heads`)
        post_proj = pair_table is not None
        if post_proj:
            v = value.reshape(bs * self.num_cams, -1, self.embed_dims)
        else:
            v = value_proj(value)
            # sample in the incoming feature dtype (bf16 in production);
            # rows stay full-width — the per-head channel split happens
            # inside the msda op after sampling (512-byte rows gather
            # far faster)
            v = v.astype(value.dtype).reshape(
                bs * self.num_cams, -1, self.embed_dims
            )

        offsets = nn.Dense(
            self.num_heads * self.num_levels * self.num_points * 2,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=msda_offset_bias_init(
                self.num_heads, self.num_levels, self.num_points
            ),
            name="sampling_offsets",
        )(query).reshape(
            bs, q_total, self.num_heads, self.num_levels, self.num_points, 2
        )
        attn = nn.Dense(
            self.num_heads * self.num_levels * self.num_points,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(
            bs, q_total, self.num_heads, self.num_levels * self.num_points
        )
        attn = jax.nn.softmax(attn, axis=-1).reshape(
            bs, q_total, self.num_heads, self.num_levels, self.num_points
        )

        # offsets normalised per level by (W, H) (group_attn.py:191-196)
        normalizer = jnp.asarray(
            [(w_, h_) for h_, w_ in spatial_shapes.shapes], dtype=offsets.dtype
        )  # [L, 2]
        loc = (
            reference_points[:, :, None, None, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )
        # zero locations for slots without an allocated depth
        loc = jnp.where(ref_depth[:, :, None, None, None, :] > 0, loc, 0.0)

        cap = (
            capacity_override
            if capacity_override is not None
            else self.gather_capacity
        )
        if self.guard and not self.is_initializing():
            valid_slots = ref_depth[..., 0] > 0  # [bs, q_total]
            counts = valid_slots.reshape(bs * self.num_cams, k).sum(-1)
            cap_eff = cap if cap is not None and cap < k else k
            self.sow(
                "guards", "msda_overflow",
                jnp.maximum(jnp.max(counts) - cap_eff, 0).astype(
                    jnp.float32
                ),
            )
            if self.hybrid_mode:
                # exact-correction demand: per-camera count of clamped
                # (query, level) entries; the hybrid output is
                # value-exact while this fits `clamp_capacity`
                demand = msda_clamp_demand(
                    spatial_shapes,
                    loc.reshape(
                        bs * self.num_cams, k, self.num_heads,
                        self.num_levels, self.num_points, 2,
                    ),
                    self.patch_hw[0], self.patch_hw[1],
                    valid=valid_slots.reshape(bs * self.num_cams, k),
                )
                self.sow(
                    "guards", "msda_clamp_overflow",
                    jnp.maximum(
                        demand.max() - self.clamp_capacity, 0.0
                    ).astype(jnp.float32),
                )
                # raw demand (a capacity-headroom STAT, not a
                # violation: demand <= capacity is the corrected-exact
                # regime — check_guard_violations skips `*_demand`)
                self.sow(
                    "guards", "msda_clamp_demand",
                    demand.max().astype(jnp.float32),
                )
                # per-(batch x camera) demand vector: the distribution
                # evidence behind the day-0 capacity choice
                # (tools/production_demand_study.py histograms it);
                # summarize_guards reduces it to the same max
                self.sow(
                    "guards", "msda_percam_clamp_demand",
                    demand.astype(jnp.float32),
                )
            elif self.patch_mode:
                stats = msda_window_stats(
                    spatial_shapes, loc, attn,
                    self.patch_hw[0], self.patch_hw[1],
                    sel_levels=self.sel_levels, valid=valid_slots,
                )
                self.sow(
                    "guards", "msda_window_clamped",
                    stats["window_clamped"].sum(),
                )
                self.sow(
                    "guards", "msda_window_clamped_mass",
                    stats["window_clamped_mass"].sum(),
                )
                self.sow(
                    "guards", "msda_level_dropped_mass",
                    stats["level_dropped_mass"].max(),
                )

        loc = loc.reshape(
            bs * self.num_cams, k, self.num_heads, self.num_levels,
            self.num_points, 2,
        )
        w = attn.reshape(
            bs * self.num_cams, k, self.num_heads, self.num_levels,
            self.num_points,
        )
        if self.hybrid_mode:
            sample_fn = functools.partial(
                msda_hybrid,
                patch_h=self.patch_hw[0], patch_w=self.patch_hw[1],
                clamp_capacity=self.clamp_capacity,
                pair_table=pair_table, raw_heads=post_proj,
            )
        elif self.patch_mode:
            sample_fn = functools.partial(
                msda_patch, sel_levels=self.sel_levels,
                pair_table=pair_table, raw_heads=post_proj,
                patch_h=self.patch_hw[0], patch_w=self.patch_hw[1],
            )
        else:
            sample_fn = functools.partial(
                msda, pair_table=pair_table, raw_heads=post_proj
            )

        def project(sampled, wsum):
            # per-head projection of the raw sampled values + weight-
            # mass-scaled bias: channel d (owned by head h(d)) becomes
            # (Σw_h x)·W[:, d] + wsum_h·b[d] — exactly sample-after-
            # projection under zero-padding borders
            proj = value_proj(sampled.astype(self.dtype))  # [b,m,H,C]
            head_mask = jnp.repeat(
                jnp.eye(self.num_heads, dtype=jnp.float32),
                self.embed_dims // self.num_heads, axis=1,
            )
            out = jnp.einsum(
                "bmhc,hc->bmc", proj.astype(jnp.float32), head_mask,
                preferred_element_type=jnp.float32,
            )
            bias_vec = value_proj(
                jnp.zeros((1, 1, self.embed_dims), self.dtype)
            )[0, 0].astype(jnp.float32)
            corr = jnp.einsum(
                "bmh,hc->bmc", wsum - 1.0, head_mask,
                preferred_element_type=jnp.float32,
            ) * bias_vec
            return out + corr

        if cap is not None and cap < k:
            # valid-slot compaction: sample only slots with an allocated
            # depth, in slot order; scatter results back on the MXU
            b2 = bs * self.num_cams
            valid = (ref_depth[..., 0] > 0).reshape(b2, k)
            score = valid.astype(jnp.float32) * (2.0 * k) - jnp.arange(
                k, dtype=jnp.float32
            )
            _, sel = jax.lax.top_k(score, cap)  # [b2, cap]
            sel = sel.astype(jnp.int32)
            take = lambda x: jnp.take_along_axis(
                x, sel.reshape(sel.shape + (1,) * (x.ndim - 2)), axis=1
            )
            sel_valid = jnp.take_along_axis(valid, sel, axis=1)
            out_sel = sample_fn(v, spatial_shapes, take(loc), take(w))
            if post_proj:
                out_sel = project(*out_sel)
            onehot = jax.nn.one_hot(
                sel, k, dtype=jnp.float32
            ) * sel_valid[..., None].astype(jnp.float32)
            out = jnp.einsum(
                "bmk,bmc->bkc", onehot, out_sel,
                preferred_element_type=jnp.float32,
            )
        else:
            out = sample_fn(v, spatial_shapes, loc, w)
            if post_proj:
                out = project(*out)
        out = out.reshape(bs, q_total, self.embed_dims)
        out = nn.Dense(self.embed_dims, dtype=self.dtype, name="output_proj")(
            out
        )
        if self.dropout > 0.0:
            out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        if self.residual_mode == "add":
            return out + identity
        return jnp.concatenate([out, identity], axis=-1)
