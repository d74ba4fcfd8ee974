"""XLA-native deformable sampling ops, tuned for the TPU gather engine.

This module is the TPU equivalent of the reference's two CUDA kernels:

* `deformable_aggregation` — the fused multi-camera multi-scale
  bilinear-sample + weighted-sum op
  (reference ops/src/deformable_aggregation_cuda.cu:129-187).
* `msda` — multi-scale deformable attention sampling, used per camera
  group (mmcv `MultiScaleDeformableAttnFunction`, invoked at
  reference models/group_attn.py:229-232).

Sampling semantics replicated exactly from the CUDA kernels:
  * DAF locations are normalised to (0, 1); a sample is dropped entirely
    when either coordinate is <= 0 or >= 1 (cu:169-171);
  * pixel mapping is `loc * size - 0.5` (align_corners=False, cu:180-181);
  * out-of-border bilinear corners contribute zero (cu:35-53); MSDA uses
    plain zero-padding (grid_sample) without the whole-sample drop.

Performance model (measured on v5e): XLA's dynamic-gather costs ~9-35 ns
PER ROW almost independent of row width, so the design minimises gather
rows rather than bytes:

  * **pair tables** — each table row holds two adjacent pixels, so one
    fetch covers both x-corners of a bilinear sample: 2 rows per sample
    instead of 4 (2KB quad rows measured slower — off the fast path);
  * **valid-slot compaction** (DAF) — only the top-`gather_capacity`
    in-range (anchor, point) slots per camera are gathered (the CUDA
    kernel wastes reads on out-of-view samples; typically <35% of slots
    are valid), and results scatter back through a one-hot MXU matmul;
  * **level-fused takes** — all levels' rows go through a single
    `jnp.take` (larger takes amortise per-row overhead);
  * **full-width MSDA rows** — 512-byte rows gather ~2.6x faster per row
    than per-head 64-byte rows; the per-head channel slice is applied
    after sampling with a constant head mask.

Gradients flow through `jax.grad` as scatter-adds, which on TPU are
deterministic (unlike the reference's `atomicAdd` backward,
deformable_aggregation_cuda.cu:190-262).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .format import SpatialShapes


def bilinear_sample(
    feat: jnp.ndarray,
    h: int,
    w: int,
    loc: jnp.ndarray,
    drop_out_of_range: bool = True,
) -> jnp.ndarray:
    """Reference-shape bilinear sampling (one level, 4-corner takes).

    Used as the correctness oracle and by small-scale callers; the fused
    production paths below inline a pair-table variant of this math.

    Args:
      feat: [B, H*W, C]; loc: [B, N, 2] (x, y) in (0, 1).
    Returns: [B, N, C].
    """
    b, hw, c = feat.shape
    wx0, wx1, wy0, wy1, x0, y0, y1 = _corner_weights(
        loc, h, w, feat.dtype, drop_out_of_range
    )
    base = (jnp.arange(b, dtype=jnp.int32) * hw)[:, None]
    xc0 = jnp.clip(x0, 0, w - 1)
    xc1 = jnp.clip(x0 + 1, 0, w - 1)
    yc0 = base + jnp.clip(y0, 0, h - 1) * w
    yc1 = base + jnp.clip(y1, 0, h - 1) * w
    idx = jnp.stack([yc0 + xc0, yc0 + xc1, yc1 + xc0, yc1 + xc1])
    vals = jnp.take(feat.reshape(b * hw, c), idx.reshape(-1), axis=0)
    vals = vals.reshape((4, b) + loc.shape[1:-1] + (c,))
    return (
        wy0[..., None] * (wx0[..., None] * vals[0] + wx1[..., None] * vals[1])
        + wy1[..., None] * (wx0[..., None] * vals[2] + wx1[..., None] * vals[3])
    )


def _corner_weights(loc, h, w, dtype, drop_out_of_range):
    """Shared bilinear corner weights with border masking."""
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    lx = (x - x0f).astype(dtype)
    ly = (y - y0f).astype(dtype)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1
    one = jnp.ones((), dtype)
    wx0 = (one - lx) * ((x0 >= 0) & (x0 < w)).astype(dtype)
    wx1 = lx * ((x1 >= 0) & (x1 < w)).astype(dtype)
    wy0 = (one - ly) * ((y0 >= 0) & (y0 < h)).astype(dtype)
    wy1 = ly * ((y1 >= 0) & (y1 < h)).astype(dtype)
    if drop_out_of_range:
        in_range = (
            (loc[..., 0] > 0.0)
            & (loc[..., 0] < 1.0)
            & (loc[..., 1] > 0.0)
            & (loc[..., 1] < 1.0)
        ).astype(dtype)
        wy0 = wy0 * in_range
        wy1 = wy1 * in_range
    return wx0, wx1, wy0, wy1, x0, y0, y1


def make_pair_table(col_flat: jnp.ndarray) -> jnp.ndarray:
    """[R, C] -> [R, 2C] where row i holds (feat[i], feat[i+1]).

    One fetch then covers both x-corners of a bilinear sample: 2 rows per
    sample instead of 4. (A 4C "quad" table holding the whole 2x2
    neighbourhood was measured SLOWER — 2KB rows fall off the gather fast
    path — so pairs are the sweet spot.) Boundary spills read a
    neighbouring row's first pixel; every such corner carries zero
    bilinear weight, so the garbage never contributes.
    """
    nxt = jnp.roll(col_flat, -1, axis=0)
    pair = jnp.concatenate([col_flat, nxt], axis=-1)
    # force materialisation: without the barrier XLA can sink the concat
    # through the downstream gather, splitting it back into twice as many
    # half-width row fetches (measured ~16% slower on the MSDA path)
    return jax.lax.optimization_barrier(pair)


def _with_pair_table(core, pair_table, col_flat, *args):
    """Run a rematerialised sampling core over the pair table.

    With no precomputed table the build happens INSIDE the checkpoint,
    so the backward pass recomputes it from `col_flat` instead of
    storing the (full-column-copy-sized) table. With a shared table the
    checkpoint treats it as an input — still rematerialising the
    gathered values, which is the expensive part.
    """
    if pair_table is None:
        return jax.checkpoint(
            lambda cf, *a: core(make_pair_table(cf), *a)
        )(col_flat, *args)
    return jax.checkpoint(core)(pair_table, *args)


def _pair_bilinear(
    pair_vals: jnp.ndarray,  # [2, ..., 2C] fetched (y0, y1) pair rows
    aligned: jnp.ndarray,  # [...] bool: x0 == pair start
    wx0, wx1, wy0, wy1,
):
    """Combine pair-table fetches into the bilinear sample.

    Normally the pair covers (x0, x1); at the left border (x0 = -1) it
    covers (x1, x1+1), so the halves swap. Out-of-range corners carry
    zero weight, making the swapped garbage harmless.
    """
    c = pair_vals.shape[-1] // 2
    first = pair_vals[..., :c]
    second = pair_vals[..., c:]
    al = aligned[..., None]
    fx0 = jnp.where(al, first, second)
    fx1 = jnp.where(al, second, first)
    vx = wx0[..., None] * fx0 + wx1[..., None] * fx1
    return wy0[..., None] * vx[0] + wy1[..., None] * vx[1]


def _window_base(px, py, keep, ph, pw, hlim, wlim):
    """Midrange-centred window base for patch-mode sampling.

    Shared by the `msda_patch` cores and `msda_window_stats` so the
    overflow guard mirrors the kernel's window placement exactly. The
    window [base, base+p-1] covers every kept sample whenever the
    spread (max - min) <= p-1 pixels — the tightest guarantee any
    single window gives. Dropped (out-of-image, zero-weight) samples
    are excluded so they don't drag the window; all-dropped queries
    fall back to mid 0 (their output is zero regardless).
    """
    kb = keep > 0.0
    big = jnp.float32(1e9)
    mid_x = 0.5 * (
        jnp.min(jnp.where(kb, px, big), -1)
        + jnp.max(jnp.where(kb, px, -big), -1)
    )
    mid_y = 0.5 * (
        jnp.min(jnp.where(kb, py, big), -1)
        + jnp.max(jnp.where(kb, py, -big), -1)
    )
    base_x = jnp.clip(
        jnp.round(mid_x - (pw - 1) / 2.0).astype(jnp.int32), 0, wlim - pw
    )
    base_y = jnp.clip(
        jnp.round(mid_y - (ph - 1) / 2.0).astype(jnp.int32), 0, hlim - ph
    )
    return base_x, base_y


def shrink_patch(patch_h: int, patch_w: int, h: int, w: int):
    """Per-level window shrink used by `msda_patch`: the window never
    exceeds the level, and its width stays even (pair fetches cover two
    pixels)."""
    ph = min(patch_h, h)
    pw = min(patch_w, w)
    pw = max(2, pw - (pw % 2))
    return ph, pw


def _lost_weights(
    spatial_shapes: SpatialShapes,
    loc: jnp.ndarray,  # [B, Q, L, n, 2] H-major samples
    patch_h: int,
    patch_w: int,
):
    """Per-sample window-clamp analysis shared by the guard and the
    hybrid corrector.

    For every sample, computes the bilinear-weight fraction carried by
    its LOST corners — corners inside the IMAGE (grid_sample would read
    them) but outside the midrange-centred window `msda_patch` actually
    gathers. `lost_w > 0` ⇔ the windowed value deviates from exact
    grid_sample; `lost_w == 0` ⇔ bit-for-the-same-math equal (tested in
    tests/test_guards.py). Mirrors `msda_patch` window placement via
    the shared `_window_base`/`shrink_patch` helpers.

    Returns (lost_w, keep): both [B, Q, L, n] float32, `keep` the
    in-image support mask.
    """
    num_levels = loc.shape[2]
    lost_all, keep_all = [], []
    for lvl in range(num_levels):
        h_, w_ = spatial_shapes.shapes[lvl]
        ph, pw = shrink_patch(patch_h, patch_w, h_, w_)
        l = loc[:, :, lvl]
        px = l[..., 0].astype(jnp.float32) * w_ - 0.5
        py = l[..., 1].astype(jnp.float32) * h_ - 0.5
        keep = (
            (px > -1.0) & (px < w_) & (py > -1.0) & (py < h_)
        ).astype(jnp.float32)
        base_x, base_y = _window_base(px, py, keep, ph, pw, h_, w_)
        x0 = jnp.floor(px).astype(jnp.int32)
        y0 = jnp.floor(py).astype(jnp.int32)
        bx = base_x[..., None]
        by = base_y[..., None]
        fx = px - x0.astype(jnp.float32)
        fy = py - y0.astype(jnp.float32)
        lost_w = jnp.zeros_like(px)
        for cx, wx_ in ((x0, 1.0 - fx), (x0 + 1, fx)):
            in_x = (cx >= 0) & (cx <= w_ - 1)
            out_x = (cx < bx) | (cx > bx + pw - 1)
            for cy, wy_ in ((y0, 1.0 - fy), (y0 + 1, fy)):
                in_y = (cy >= 0) & (cy <= h_ - 1)
                out_y = (cy < by) | (cy > by + ph - 1)
                lost_c = in_x & in_y & (out_x | out_y)
                lost_w = lost_w + lost_c.astype(jnp.float32) * wx_ * wy_
        lost_all.append(lost_w * keep)
        keep_all.append(keep)
    return jnp.stack(lost_all, axis=2), jnp.stack(keep_all, axis=2)


def msda_window_stats(
    spatial_shapes: SpatialShapes,
    sampling_locations: jnp.ndarray,  # [B, Q, H, L, P, 2]
    attention_weights: jnp.ndarray,  # [B, Q, H, L, P]
    patch_h: int,
    patch_w: int,
    sel_levels: Optional[int] = None,
    valid: Optional[jnp.ndarray] = None,  # [B, Q] bool
):
    """In-graph exactness guard for patch-mode MSDA (window + level
    selection). Returns per-batch scalars:

      window_clamped       — number of weight-bearing samples whose 2x2
                             bilinear stencil is NOT fully served by the
                             window (their value deviates from exact
                             grid_sample); 0 ⇒ the window was exact.
      window_clamped_mass  — softmax attention mass on those samples,
                             weighted by the LOST corners' bilinear
                             weight fraction (a lost corner with ~0
                             bilinear weight contributes ~0); together
                             with the feature range this bounds the
                             output deviation. Note the bound is still
                             conservative in one direction: slots
                             already dropped by the gather-capacity
                             overflow counter are counted here too, so
                             the two guards can double-report the same
                             mass.
      level_dropped_mass   — max over queries of the softmax mass on
                             non-selected levels (0 when sel_levels is
                             off); bounds the top-k level-selection
                             deviation the same way.

    Mirrors the window placement of `msda_patch` via the shared
    `_window_base`/`shrink_patch` helpers. A stencil corner that lies
    outside the IMAGE carries zero weight under grid_sample zero
    padding and is therefore not counted (the window serves it exactly
    by omission).
    """
    b, q = sampling_locations.shape[:2]
    heads, num_levels, num_points = sampling_locations.shape[2:5]
    n = heads * num_points
    loc = sampling_locations.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, q, num_levels, n, 2
    )
    attw = attention_weights.transpose(0, 1, 3, 2, 4).reshape(
        b, q, num_levels, n
    ).astype(jnp.float32)
    vmask = (
        jnp.ones((b, q), jnp.float32)
        if valid is None
        else valid.astype(jnp.float32)
    )

    # level selection only engages when the full patch fits every level
    # (msda_patch falls back to the exact all-level loop otherwise —
    # mirror that here so the guard matches what actually ran)
    patch_fits_all = all(
        h_ >= patch_h and w_ >= patch_w and patch_w % 2 == 0
        for h_, w_ in spatial_shapes.shapes
    )
    if sel_levels is not None and sel_levels < num_levels and patch_fits_all:
        mass = attw.sum(-1)  # [B, Q, L]
        _, lsel = jax.lax.top_k(mass, sel_levels)
        sel_mask = jax.nn.one_hot(lsel, num_levels, dtype=jnp.float32).sum(
            2
        )  # [B, Q, L]
        dropped = ((mass * (1.0 - sel_mask)).sum(-1) * vmask).max(-1)
    else:
        sel_mask = jnp.ones((b, q, num_levels), jnp.float32)
        dropped = jnp.zeros((b,), jnp.float32)

    # per-sample lost-corner bilinear-weight fraction: a corner is
    # "lost" when it is inside the IMAGE (grid_sample would read it)
    # but outside the WINDOW. Weighting the clamped mass by the lost
    # fraction tightens the bound vs counting the full attw — a lost
    # corner with ~0 bilinear weight contributes ~0.
    lost_w, _ = _lost_weights(
        spatial_shapes, loc, patch_h, patch_w
    )  # [B, Q, L, n]
    gate = vmask[:, :, None, None] * sel_mask[:, :, :, None]
    inexact = (lost_w > 0).astype(jnp.float32) * gate
    count = inexact.sum((1, 2, 3))
    cmass = (lost_w * gate * attw).sum((1, 2, 3))
    return {
        "window_clamped": count,
        "window_clamped_mass": cmass,
        "level_dropped_mass": dropped,
    }


def deformable_aggregation(
    col_feats: jnp.ndarray,
    spatial_shapes: SpatialShapes,
    points_2d: jnp.ndarray,
    weights: jnp.ndarray,
    gather_capacity: Optional[int] = None,
    sel_levels: Optional[int] = None,
    pair_table: Optional[jnp.ndarray] = None,
    level_capacity: Optional[int] = None,
) -> jnp.ndarray:
    """Fused multi-camera multi-scale deformable aggregation.

    Args:
      col_feats: [bs, cams, ΣHW, C] packed features (bf16 recommended).
      spatial_shapes: static per-level (H, W).
      points_2d: [bs, A, P, cams, 2] normalised sampling locations.
      weights: [bs, A, P, cams, L, G] per-group fusion weights.
      gather_capacity: per-camera cap M on gathered (anchor, point)
        slots; in-range slots are kept in anchor order, overflow beyond M
        is dropped (None disables compaction). 4096 covers typical frames
        with 3x headroom at 900 anchors x 13 points.
      sel_levels: sample only each slot's top-`sel_levels` levels by
        fusion-weight mass (None/num_levels = all levels, exact). The
        dropped levels' contribution is bounded by their weight mass
        times the per-level feature range (tested); intended as a
        TRAIN-NATIVE fast knob like `msda_patch` — the softmax weights
        learn to concentrate on the sampled levels.
      level_capacity: per-(camera, level) budget on gathered slots —
        each level gathers only its top-`level_capacity` slots by that
        level's fusion-weight mass (weight-prioritised, so the dropped
        contribution is the smallest available; exact whenever <=
        level_capacity in-range slots carry nonzero mass at the level).
        Unlike `sel_levels` (a per-slot top-k, measured SLOWER because
        it fuses levels into one locality-poor gather) this keeps the
        per-level take structure and just shortens each take. None
        disables. TRAIN-NATIVE fast knob like the others.
      pair_table: optional precomputed `make_pair_table` of the
        flattened `col_feats` — the table build is a full column copy
        (HBM-bound, resolution-dependent), so callers issuing several
        sampling calls per frame over the same features build it ONCE
        and share it (bit-identical results). When None (training
        path), the table is built inside the rematerialised core so the
        backward pass recomputes it instead of storing it.

    Returns: [bs, A, C] aggregated anchor features in fp32.
    """
    bs, cams, total_hw, c = col_feats.shape
    _, num_anchor, num_pts = points_2d.shape[:3]
    num_levels = spatial_shapes.num_levels
    num_groups = weights.shape[-1]
    group_dims = c // num_groups
    b = bs * cams
    s = num_anchor * num_pts

    loc = points_2d.transpose(0, 3, 1, 2, 4).reshape(b, s, 2)
    # [bs, cams, A*P, L, G]
    w_all = weights.transpose(0, 3, 1, 2, 4, 5).reshape(
        b, s, num_levels, num_groups
    )

    in_range = (
        (loc[..., 0] > 0.0)
        & (loc[..., 0] < 1.0)
        & (loc[..., 1] > 0.0)
        & (loc[..., 1] < 1.0)
    )  # [b, s]

    if gather_capacity is not None and gather_capacity < s:
        m = gather_capacity
        score = in_range.astype(jnp.float32) * (2.0 * s) - jnp.arange(
            s, dtype=jnp.float32
        )
        _, sel = jax.lax.top_k(score, m)  # [b, m] slot indices
        sel = sel.astype(jnp.int32)
        take2 = lambda x: jnp.take_along_axis(
            x, sel.reshape(sel.shape + (1,) * (x.ndim - 2)), axis=1
        )
        loc = take2(loc)
        w_all = take2(w_all)
        sel_valid = jnp.take_along_axis(in_range, sel, axis=1)
        anchor_idx = sel // num_pts  # [b, m]
    else:
        m = s
        sel_valid = in_range
        anchor_idx = jnp.broadcast_to(
            (jnp.arange(s, dtype=jnp.int32) // num_pts)[None], (b, s)
        )

    if (
        level_capacity is not None
        and sel_levels is not None
        and sel_levels < num_levels
    ):
        raise ValueError(
            "level_capacity and sel_levels are alternative DFA row-cut "
            "strategies and do not compose; set only one"
        )

    if level_capacity is not None and level_capacity < m:
        ml = level_capacity

        def sample_core_budget(pair, loc, w_sel, sel_valid, anchor_idx):
            batch_base = (
                jnp.arange(b, dtype=jnp.int32) * total_hw
            )[:, None]
            out = jnp.zeros((b, num_anchor, c), jnp.float32)
            validf = sel_valid.astype(jnp.float32)
            for lvl in range(num_levels):
                h_, w_ = spatial_shapes.shapes[lvl]
                start = spatial_shapes.start_indices[lvl]
                mass = w_sel[:, :, lvl].astype(jnp.float32).sum(-1)
                _, sl = jax.lax.top_k(mass * validf, ml)  # [b, ml]
                sl = sl.astype(jnp.int32)
                take_l = lambda x: jnp.take_along_axis(
                    x, sl.reshape(sl.shape + (1,) * (x.ndim - 2)), axis=1
                )
                loc_l = take_l(loc)
                wx0, wx1, wy0, wy1, x0, y0, y1 = _corner_weights(
                    loc_l, h_, w_, pair.dtype, True
                )
                sx = jnp.clip(x0, 0, w_ - 1)
                row0 = batch_base + start + jnp.clip(y0, 0, h_ - 1) * w_ + sx
                row1 = batch_base + start + jnp.clip(y1, 0, h_ - 1) * w_ + sx
                idx = jnp.stack([row0, row1])
                vals = jnp.take(pair, idx.reshape(-1), axis=0).reshape(
                    2, b, ml, 2 * c
                )
                sampled = _pair_bilinear(
                    vals, x0 == sx, wx0, wx1, wy0, wy1
                )  # [b, ml, C]
                w_l = take_l(w_sel[:, :, lvl])  # [b, ml, G]
                w_exp = jnp.broadcast_to(
                    w_l[..., None], (b, ml, num_groups, group_dims)
                ).reshape(b, ml, c)
                out_l = sampled.astype(jnp.float32) * w_exp.astype(
                    jnp.float32
                )
                onehot_l = jax.nn.one_hot(
                    take_l(anchor_idx), num_anchor, dtype=jnp.float32
                ) * take_l(sel_valid)[..., None].astype(jnp.float32)
                out = out + jnp.einsum(
                    "bma,bmc->bac", onehot_l, out_l,
                    preferred_element_type=jnp.float32,
                )
            return out

        out = _with_pair_table(
            sample_core_budget, pair_table,
            col_feats.reshape(b * total_hw, c),
            loc, w_all, sel_valid, anchor_idx,
        )
        return out.reshape(bs, cams, num_anchor, c).sum(axis=1)

    if sel_levels is not None and sel_levels < num_levels:
        k = sel_levels
        h_vec = jnp.asarray(
            [h_ for h_, _ in spatial_shapes.shapes], jnp.int32
        )
        w_vec = jnp.asarray(
            [w_ for _, w_ in spatial_shapes.shapes], jnp.int32
        )
        start_vec = jnp.asarray(spatial_shapes.start_indices, jnp.int32)

        def sample_core_sel(pair, loc, w_sel):
            mass = w_sel.astype(jnp.float32).sum(-1)  # [b, m, L]
            _, lsel = jax.lax.top_k(mass, k)  # [b, m, k]
            lsel = lsel.astype(jnp.int32)
            hh = jnp.take(h_vec, lsel)  # [b, m, k]
            ww = jnp.take(w_vec, lsel)
            st = jnp.take(start_vec, lsel)
            # level-select the weights via a one-hot contraction —
            # batched take_along_axis is off the gather fast path
            # (measured 20-4000x slower; CLAUDE.md)
            onehot_l = jax.nn.one_hot(lsel, num_levels, dtype=jnp.float32)
            loc_k = jnp.broadcast_to(loc[:, :, None, :], (b, m, k, 2))
            wx0, wx1, wy0, wy1, x0, y0, y1 = _corner_weights(
                loc_k, hh, ww, pair.dtype, True
            )
            sx = jnp.clip(x0, 0, ww - 1)
            batch_base = (
                jnp.arange(b, dtype=jnp.int32) * total_hw
            )[:, None, None]
            row0 = batch_base + st + jnp.clip(y0, 0, hh - 1) * ww + sx
            row1 = batch_base + st + jnp.clip(y1, 0, hh - 1) * ww + sx
            idx = jnp.stack([row0, row1])  # [2, b, m, k]
            vals = jnp.take(pair, idx.reshape(-1), axis=0).reshape(
                2, b, m, k, 2 * c
            )
            sampled = _pair_bilinear(
                vals, x0 == sx, wx0, wx1, wy0, wy1
            )  # [b, m, k, C]
            w_l = jnp.einsum(
                "bmkl,bmlg->bmkg", onehot_l,
                w_sel.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )  # [b, m, k, G]
            w_exp = jnp.broadcast_to(
                w_l[..., None], (b, m, k, num_groups, group_dims)
            ).reshape(b, m, k, c)
            return (
                sampled.astype(jnp.float32) * w_exp.astype(jnp.float32)
            ).sum(2)

        out_c = _with_pair_table(
            sample_core_sel, pair_table,
            col_feats.reshape(b * total_hw, c), loc, w_all,
        )
        onehot = jax.nn.one_hot(
            anchor_idx, num_anchor, dtype=jnp.float32
        ) * sel_valid[..., None].astype(jnp.float32)
        out = jnp.einsum(
            "bma,bmc->bac", onehot, out_c,
            preferred_element_type=jnp.float32,
        )
        return out.reshape(bs, cams, num_anchor, c).sum(axis=1)

    # rematerialised sample core: the fused take's [L, 2, b, m, 2C]
    # gathered values (~200MB at production shapes) are recomputed in the
    # backward pass instead of stored
    def sample_core(pair, loc, w_sel):
        batch_base = (jnp.arange(b, dtype=jnp.int32) * total_hw)[:, None]
        # per-level takes measured slightly faster than one fused take
        # (each level's bilinear combine pipelines with the next gather)
        out_c = jnp.zeros((b, m, c), jnp.float32)
        for lvl in range(num_levels):
            h_, w_ = spatial_shapes.shapes[lvl]
            start = spatial_shapes.start_indices[lvl]
            wx0, wx1, wy0, wy1, x0, y0, y1 = _corner_weights(
                loc, h_, w_, pair.dtype, True
            )
            sx = jnp.clip(x0, 0, w_ - 1)
            row0 = batch_base + start + jnp.clip(y0, 0, h_ - 1) * w_ + sx
            row1 = batch_base + start + jnp.clip(y1, 0, h_ - 1) * w_ + sx
            idx = jnp.stack([row0, row1])
            vals = jnp.take(pair, idx.reshape(-1), axis=0).reshape(
                2, b, m, 2 * c
            )
            sampled = _pair_bilinear(vals, x0 == sx, wx0, wx1, wy0, wy1)
            w_l = w_sel[:, :, lvl].astype(sampled.dtype)  # [b, m, G]
            w_exp = jnp.broadcast_to(
                w_l[..., None], (b, m, num_groups, group_dims)
            ).reshape(b, m, c)
            out_c = out_c + (sampled * w_exp).astype(jnp.float32)
        return out_c

    out_c = _with_pair_table(
        sample_core, pair_table,
        col_feats.reshape(b * total_hw, c), loc, w_all,
    )

    # scatter-add compacted slots back to anchors on the MXU
    onehot = jax.nn.one_hot(
        anchor_idx, num_anchor, dtype=jnp.float32
    ) * sel_valid[..., None].astype(jnp.float32)
    out = jnp.einsum(
        "bma,bmc->bac", onehot, out_c,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(bs, cams, num_anchor, c).sum(axis=1)


def msda(
    value: jnp.ndarray,
    spatial_shapes: SpatialShapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    num_heads: Optional[int] = None,
    pair_table: Optional[jnp.ndarray] = None,
    raw_heads: bool = False,
) -> jnp.ndarray:
    """Multi-scale deformable attention sampling (one camera's values).

    num_heads is validation-only: heads are derived from
    sampling_locations.shape[2]; when given it must agree.

    Args:
      value: [B, ΣHW, C] full-width projected values (the per-head split
        happens after sampling — 512-byte rows gather far faster than
        64-byte per-head rows).
      sampling_locations: [B, Q, heads, L, P, 2] normalised to (0, 1).
      attention_weights: [B, Q, heads, L, P] softmax weights.
      pair_table: optional precomputed `make_pair_table` of the
        flattened value so one table build serves several sampling
        calls per frame (see `msda_patch` — the same sharing hook).
      raw_heads: return `(sampled [B, Q, heads, C], wsum [B, Q, heads])`
        BEFORE per-head channel masking, where `wsum` is each head's
        total effective sampling weight (attention x in-image bilinear
        mass). Sampling is linear in the value, so a caller sampling
        RAW features can apply its value projection to the Q sampled
        rows afterwards: `proj(sampled)` per head + `(wsum - 1) * bias`
        reproduces sample-after-projection exactly (the correction
        covers border samples whose bilinear mass < 1 under the
        grid_sample zero padding). This makes the EXACT sampling path
        shareable through one raw pair table, like the patch path.

    Returns: [B, Q, C] in fp32 (or the raw_heads pair above).
    """
    b, total_hw, c = value.shape
    q = sampling_locations.shape[1]
    heads = sampling_locations.shape[2]
    if num_heads is not None and num_heads != heads:
        raise ValueError(
            f"num_heads={num_heads} disagrees with "
            f"sampling_locations head axis {heads}"
        )
    num_levels, num_points = sampling_locations.shape[3:5]
    head_dim = c // heads

    n = q * heads * num_points
    loc = sampling_locations.transpose(0, 1, 2, 4, 3, 5)  # [B,Q,H,P,L,2]
    loc = loc.reshape(b, n, num_levels, 2)

    # constant per-head channel mask: head h owns channels [h*hd,(h+1)*hd)
    head_mask = jnp.repeat(
        jnp.eye(heads, dtype=jnp.float32), head_dim, axis=1
    )  # [heads, C]

    # rematerialised sample core: gathered values are recomputed in the
    # backward pass rather than stored. Per-level takes measured slightly
    # faster than one level-fused take here (each level's bilinear
    # combine pipelines with the next gather).
    def sample_core(pair, loc, attw):
        batch_base = (jnp.arange(b, dtype=jnp.int32) * total_hw)[:, None]
        acc = jnp.zeros((b, q, heads, c), jnp.float32)
        acc_w = jnp.zeros((b, q, heads), jnp.float32)
        for lvl in range(num_levels):
            h_, w_ = spatial_shapes.shapes[lvl]
            start = spatial_shapes.start_indices[lvl]
            wx0, wx1, wy0, wy1, x0, y0, y1 = _corner_weights(
                loc[:, :, lvl], h_, w_, pair.dtype, False
            )
            sx = jnp.clip(x0, 0, w_ - 1)
            row0 = batch_base + start + jnp.clip(y0, 0, h_ - 1) * w_ + sx
            row1 = batch_base + start + jnp.clip(y1, 0, h_ - 1) * w_ + sx
            idx = jnp.stack([row0, row1])
            vals = jnp.take(pair, idx.reshape(-1), axis=0).reshape(
                2, b, n, 2 * c
            )
            sampled = _pair_bilinear(vals, x0 == sx, wx0, wx1, wy0, wy1)
            sampled = sampled.reshape(b, q, heads, num_points, c)
            w_l = attw[:, :, :, lvl]
            acc = acc + jnp.einsum(
                "bqhpc,bqhp->bqhc", sampled.astype(jnp.float32),
                w_l.astype(jnp.float32),
            )
            if raw_heads:
                # per-sample in-image bilinear mass (1 in the interior,
                # tapering to 0 over the zero-padded border)
                mass = (
                    (wx0 + wx1).astype(jnp.float32)
                    * (wy0 + wy1).astype(jnp.float32)
                ).reshape(b, q, heads, num_points)
                acc_w = acc_w + jnp.einsum(
                    "bqhp,bqhp->bqh", w_l.astype(jnp.float32), mass
                )
        if raw_heads:
            return acc, acc_w
        return jnp.einsum(
            "bqhc,hc->bqc", acc, head_mask,
            preferred_element_type=jnp.float32,
        )

    return _with_pair_table(
        sample_core, pair_table,
        value.reshape(b * total_hw, c), loc, attention_weights,
    )


def msda_patch(
    value: jnp.ndarray,
    spatial_shapes: SpatialShapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    patch_h: int = 8,
    patch_w: int = 8,
    sel_levels: Optional[int] = None,
    pair_table: Optional[jnp.ndarray] = None,
    raw_heads: bool = False,
):
    """Approximate patch-mode MSDA (flag-gated; see PERF.md lever #1).

    All of a query's samples at a level are served from one
    `patch_h x patch_w` pixel window centred on their mean location:
    the window is gathered once (`ph*pw/2` pair rows vs `2*heads*points`
    rows for exact `msda` — a 2x row cut at the default 8x8/8h4p config)
    and the per-sample bilinear interpolation becomes a one-hot
    contraction on the MXU.

    The ONLY deviation from exact `msda` is window clamping: sample
    coordinates are clamped into the window (offsets learned to reach
    further than ~patch/2 pixels from the query's sample midrange are
    foreshortened). Border semantics are exact: windows may hang off the
    image edge (fetched rows are index-clamped, their weights carry the
    same per-corner zero-padding masks as `msda`), so any sample that
    fits the window — inside or partially outside the image — produces
    the exact grid_sample value (tested).

    Same signature/return as `msda`. Two sharing hooks (both exact):
    `pair_table` — a precomputed `make_pair_table(value_flat)` so one
    table build serves several sampling calls per frame; `raw_heads` —
    return `(sampled [B, Q, heads, C], wsum [B, Q, heads])` BEFORE the
    per-head channel masking, where `wsum` is each head's total
    effective sampling weight (attention x in-image bilinear mass).
    Because sampling is linear in the value, a caller can then apply
    its value projection to the Q sampled rows instead of the ΣHW table
    rows: `proj(sampled)` per head + `(wsum - 1) * bias` correction
    reproduces sample-after-projection exactly (the correction accounts
    for border samples whose bilinear mass < 1 under zero padding).
    """
    b, total_hw, c = value.shape
    q = sampling_locations.shape[1]
    heads, num_levels, num_points = sampling_locations.shape[2:5]
    head_dim = c // heads
    n = heads * num_points  # samples per (query, level)

    # [B,Q,H,L,P,2] -> [B,Q,L,n(H-major),2]
    loc = sampling_locations.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, q, num_levels, n, 2
    )
    attw = attention_weights.transpose(0, 1, 3, 2, 4).reshape(
        b, q, num_levels, n
    )
    head_mask = jnp.repeat(
        jnp.eye(heads, dtype=jnp.float32), head_dim, axis=1
    )  # [heads, C]

    # top-k level selection: each query gathers windows only at its
    # `sel_levels` highest-weight levels (same train-native posture as
    # the window clamp; dropped-level contribution is bounded by the
    # dropped softmax mass — tested). Requires the full patch to fit
    # every level so the window geometry is level-uniform; smaller
    # pyramids fall back to the exact all-level loop below.
    patch_fits_all = all(
        h_ >= patch_h and w_ >= patch_w and patch_w % 2 == 0
        for h_, w_ in spatial_shapes.shapes
    )
    if (
        sel_levels is not None
        and sel_levels < num_levels
        and patch_fits_all
    ):
        return _msda_patch_sel(
            value, spatial_shapes, loc, attw, head_mask,
            patch_h, patch_w, sel_levels, pair_table, raw_heads,
        )

    def sample_core(pair, loc, attw):
        batch_base = (jnp.arange(b, dtype=jnp.int32) * total_hw)[:, None]
        acc = jnp.zeros((b, q, heads, c), jnp.float32)
        acc_w = jnp.zeros((b, q, heads), jnp.float32)
        for lvl in range(num_levels):
            h_, w_ = spatial_shapes.shapes[lvl]
            start = spatial_shapes.start_indices[lvl]
            # shrink the window on levels smaller than the patch (pair
            # fetches cover 2 pixels, so the window width stays even)
            ph, pw = shrink_patch(patch_h, patch_w, h_, w_)
            l = loc[:, :, lvl]  # [B,Q,n,2]
            px = l[..., 0] * w_ - 0.5
            py = l[..., 1] * h_ - 0.5
            # samples with any in-image bilinear support (grid_sample
            # zero-padding keeps partial contributions out to 1 px)
            keep = (
                (px > -1.0) & (px < w_) & (py > -1.0) & (py < h_)
            ).astype(jnp.float32)
            # midrange-centred window (shared with the overflow guard —
            # see `_window_base`)
            base_x, base_y = _window_base(
                px, py, keep, ph, pw, h_, w_
            )  # [B,Q]
            # taper-clamp the UNCLAMPED sample into [base-1, base+p]:
            # corners are then computed at their true positions (exact
            # border semantics — corners outside the window or the image
            # simply get a zero one-hot below), while samples reaching
            # beyond the window fade out smoothly instead of being
            # dragged to the window edge with full weight
            ax = jnp.clip(
                px,
                base_x[..., None] - 1 + 1e-4,
                base_x[..., None] + pw - 1e-4,
            )
            ay = jnp.clip(
                py,
                base_y[..., None] - 1 + 1e-4,
                base_y[..., None] + ph - 1e-4,
            )
            x0 = jnp.floor(ax).astype(jnp.int32)
            y0 = jnp.floor(ay).astype(jnp.int32)
            lx = (ax - x0).astype(jnp.float32)
            ly = (ay - y0).astype(jnp.float32)
            # window-relative corner indices in [-1, p]; one_hot yields
            # zero weight outside [0, p-1], which simultaneously encodes
            # the image border (windows are in-image) and the window edge
            i0x = x0 - base_x[..., None]
            i0y = y0 - base_y[..., None]
            # patch rows: [B,Q,ph,pw/2] pair fetches cover ph*pw pixels
            dy = jnp.arange(ph, dtype=jnp.int32)
            dxp = jnp.arange(pw // 2, dtype=jnp.int32) * 2
            rows = (
                batch_base[:, :, None, None]
                + start
                + (base_y[:, :, None, None] + dy[None, None, :, None]) * w_
                + base_x[:, :, None, None]
                + dxp[None, None, None, :]
            )
            patch = jnp.take(pair, rows.reshape(-1), axis=0).reshape(
                b, q, ph * pw, c
            )
            # separable one-hot bilinear weights over the window
            whx = (1.0 - lx)[..., None] * jax.nn.one_hot(
                i0x, pw, dtype=jnp.float32
            ) + lx[..., None] * jax.nn.one_hot(
                i0x + 1, pw, dtype=jnp.float32
            )
            why = (1.0 - ly)[..., None] * jax.nn.one_hot(
                i0y, ph, dtype=jnp.float32
            ) + ly[..., None] * jax.nn.one_hot(
                i0y + 1, ph, dtype=jnp.float32
            )
            a = attw[:, :, lvl].astype(jnp.float32) * keep  # [B,Q,n]
            wpix = jnp.einsum("bqnh,bqnw->bqnhw", why, whx).reshape(
                b, q, n, ph * pw
            ) * a[..., None]
            # fold points per head, then contract window pixels on the MXU
            wpix = wpix.reshape(b, q, heads, num_points, ph * pw).sum(3)
            weighted = jnp.einsum(
                "bqhe,bqec->bqhc", wpix, patch.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            acc = acc + weighted
            acc_w = acc_w + wpix.sum(-1)
        if raw_heads:
            return acc, acc_w
        return jnp.einsum(
            "bqhc,hc->bqc", acc, head_mask,
            preferred_element_type=jnp.float32,
        )

    return _with_pair_table(
        sample_core, pair_table, value.reshape(b * total_hw, c), loc, attw
    )


def _msda_patch_sel(
    value: jnp.ndarray,  # [B, ΣHW, C]
    spatial_shapes: SpatialShapes,
    loc: jnp.ndarray,  # [B, Q, L, n, 2] (H-major samples)
    attw: jnp.ndarray,  # [B, Q, L, n]
    head_mask: jnp.ndarray,  # [heads, C]
    patch_h: int,
    patch_w: int,
    sel_levels: int,
    pair_table: Optional[jnp.ndarray] = None,
    raw_heads: bool = False,
):
    """`msda_patch` with per-query top-k level selection.

    Identical window math to the static per-level loop in `msda_patch`,
    but the level axis is data-dependent: each query gathers one
    `patch_h x patch_w` window at each of its `sel_levels`
    highest-attention-mass levels, with the per-level constants
    (start offset, W, H) fetched from tiny constant vectors. Gather rows
    drop by the factor `sel_levels / num_levels`.
    """
    b, total_hw, c = value.shape
    q, num_levels, n = loc.shape[1:4]
    heads = head_mask.shape[0]
    num_points = n // heads
    k = sel_levels
    ph, pw = patch_h, patch_w

    h_vec = jnp.asarray([h_ for h_, _ in spatial_shapes.shapes], jnp.int32)
    w_vec = jnp.asarray([w_ for _, w_ in spatial_shapes.shapes], jnp.int32)
    start_vec = jnp.asarray(spatial_shapes.start_indices, jnp.int32)

    def sample_core(pair, loc, attw):
        mass = attw.astype(jnp.float32).sum(-1)  # [B, Q, L]
        _, lsel = jax.lax.top_k(mass, k)  # [B, Q, k]
        lsel = lsel.astype(jnp.int32)
        # one-hot contraction instead of batched take_along_axis (the
        # latter is off the gather fast path — CLAUDE.md)
        onehot_l = jax.nn.one_hot(lsel, num_levels, dtype=jnp.float32)
        loc_s = jnp.einsum(
            "bqkl,bqlnx->bqknx", onehot_l, loc.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )  # [B, Q, k, n, 2]
        a_s = jnp.einsum(
            "bqkl,bqln->bqkn", onehot_l, attw.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        hh = jnp.take(h_vec, lsel)  # [B, Q, k]
        ww = jnp.take(w_vec, lsel)
        st = jnp.take(start_vec, lsel)
        wwf = ww.astype(jnp.float32)[..., None]
        hhf = hh.astype(jnp.float32)[..., None]

        px = loc_s[..., 0].astype(jnp.float32) * wwf - 0.5  # [B,Q,k,n]
        py = loc_s[..., 1].astype(jnp.float32) * hhf - 0.5
        keep = (
            (px > -1.0) & (px < wwf) & (py > -1.0) & (py < hhf)
        ).astype(jnp.float32)
        # midrange-centred window (shared with the overflow guard)
        base_x, base_y = _window_base(px, py, keep, ph, pw, hh, ww)
        ax = jnp.clip(
            px, base_x[..., None] - 1 + 1e-4, base_x[..., None] + pw - 1e-4
        )
        ay = jnp.clip(
            py, base_y[..., None] - 1 + 1e-4, base_y[..., None] + ph - 1e-4
        )
        x0 = jnp.floor(ax).astype(jnp.int32)
        y0 = jnp.floor(ay).astype(jnp.int32)
        lx = (ax - x0).astype(jnp.float32)
        ly = (ay - y0).astype(jnp.float32)
        i0x = x0 - base_x[..., None]
        i0y = y0 - base_y[..., None]

        batch_base = (
            jnp.arange(b, dtype=jnp.int32) * total_hw
        )[:, None, None, None, None]
        dy = jnp.arange(ph, dtype=jnp.int32)[:, None]
        dxp = jnp.arange(pw // 2, dtype=jnp.int32)[None, :] * 2
        rows = (
            batch_base
            + st[..., None, None]
            + (base_y[..., None, None] + dy) * ww[..., None, None]
            + base_x[..., None, None]
            + dxp
        )  # [B, Q, k, ph, pw/2]
        patch = jnp.take(pair, rows.reshape(-1), axis=0).reshape(
            b, q, k, ph * pw, c
        )

        whx = (1.0 - lx)[..., None] * jax.nn.one_hot(
            i0x, pw, dtype=jnp.float32
        ) + lx[..., None] * jax.nn.one_hot(i0x + 1, pw, dtype=jnp.float32)
        why = (1.0 - ly)[..., None] * jax.nn.one_hot(
            i0y, ph, dtype=jnp.float32
        ) + ly[..., None] * jax.nn.one_hot(i0y + 1, ph, dtype=jnp.float32)
        a = a_s.astype(jnp.float32) * keep  # [B, Q, k, n]
        wpix = jnp.einsum("bqknh,bqknw->bqknhw", why, whx).reshape(
            b, q, k, n, ph * pw
        ) * a[..., None]
        wpix = wpix.reshape(b, q, k, heads, num_points, ph * pw).sum(4)
        weighted = jnp.einsum(
            "bqkhe,bqkec->bqhc", wpix, patch.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        if raw_heads:
            return weighted, wpix.sum((-1,)).sum(2)
        return jnp.einsum(
            "bqhc,hc->bqc", weighted, head_mask,
            preferred_element_type=jnp.float32,
        )

    return _with_pair_table(
        sample_core, pair_table, value.reshape(b * total_hw, c), loc, attw
    )


def msda_clamp_demand(
    spatial_shapes: SpatialShapes,
    sampling_locations: jnp.ndarray,  # [B, Q, H, L, P, 2]
    patch_h: int,
    patch_w: int,
    valid: Optional[jnp.ndarray] = None,  # [B, Q] bool
) -> jnp.ndarray:
    """Per-batch count of (query, level) entries the hybrid path must
    correct: entries with at least one window-clamped sample. This is
    the demand the `clamp_capacity` of `msda_hybrid` must cover for the
    hybrid output to equal exact `msda` (up to fp reassociation);
    `max(demand - capacity, 0)` is the guard counter."""
    b, q = sampling_locations.shape[:2]
    heads, num_levels, num_points = sampling_locations.shape[2:5]
    loc = sampling_locations.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, q, num_levels, heads * num_points, 2
    )
    lost_w, _ = _lost_weights(spatial_shapes, loc, patch_h, patch_w)
    clamped_ql = (lost_w > 0).any(-1)  # [B, Q, L]
    if valid is not None:
        clamped_ql = clamped_ql & valid[:, :, None]
    return clamped_ql.sum((1, 2)).astype(jnp.float32)


def msda_hybrid(
    value: jnp.ndarray,
    spatial_shapes: SpatialShapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    patch_h: int = 8,
    patch_w: int = 8,
    clamp_capacity: int = 128,
    pair_table: Optional[jnp.ndarray] = None,
    raw_heads: bool = False,
):
    """Windowed MSDA with an exact correction lane: value-exact MSDA at
    near-patch cost.

    The serving problem this solves (PERF.md round-3): checkpoints
    TRAINED under exact semantics (the converted-torch-checkpoint
    scenario, reference ops/src/deformable_aggregation_cuda.cu:129-187 +
    mmcv MSDA) lose ~0.094 mAP under the windowed fast path, but the
    fully exact path pays 2x the gather rows. Observation: for a
    trained model most (query, level) sample clusters FIT the 8x8
    window (the offsets are learned attention patterns, not uniform
    scatter); only a minority clamp. So:

      1. run the windowed pass (`msda_patch`) with the clamped
         (query, level) entries' attention weights zeroed;
      2. re-sample ONLY those entries through the exact row-pair path
         (a static `clamp_capacity` per batch-camera, top-priority by
         lost attention mass) and scatter-add their exact
         contributions back on the MXU.

    While the per-camera clamped-entry demand fits `clamp_capacity`,
    the result equals exact `msda` up to fp reassociation (the
    uncorrected entries' windows serve every stencil corner, which is
    the tested `lost_w == 0 ⇒ patch == exact` invariant; the corrected
    entries are literally exact row-pair samples). Demand overflow is
    measurable in-graph via `msda_clamp_demand` — the guarded config
    surfaces `max(demand - capacity, 0)` per frame, so serving a
    converted checkpoint carries a per-frame exactness certificate
    instead of an accuracy hope.

    Cost model: windowed pass rows (32 pair rows per (q, l)) + 2 rows
    per corrected sample (`clamp_capacity * heads * points * 2`),
    vs 2 rows per sample for every (q, l) in exact `msda`.

    Same signature/sharing hooks as `msda`/`msda_patch`. NOTE: with
    `pair_table=None` the table is built twice (once per lane inside
    each lane's remat) — serving runs share one table via
    `share_sampling_table`, so this only costs in no-table training
    use, where `msda_patch`/`msda` are the intended ops anyway.
    """
    b, total_hw, c = value.shape
    q = sampling_locations.shape[1]
    heads, num_levels, num_points = sampling_locations.shape[2:5]
    n = heads * num_points
    head_dim = c // heads
    k_cap = min(clamp_capacity, q * num_levels)

    loc = sampling_locations.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, q, num_levels, n, 2
    )
    attw = attention_weights.transpose(0, 1, 3, 2, 4).reshape(
        b, q, num_levels, n
    )

    # ---- selection: which (q, l) entries need exact correction ----
    lost_w, _ = _lost_weights(spatial_shapes, loc, patch_h, patch_w)
    lost_flag = (lost_w > 0).astype(jnp.float32)  # [B, Q, L, n]
    # priority = lost attention mass (the entries whose windowed value
    # deviates the most); any positive mass marks a clamped entry
    prio = (lost_flag * attw.astype(jnp.float32)).sum(-1).reshape(
        b, q * num_levels
    )
    # strictly-positive floor for clamped entries with ~0 attention
    # mass so capacity still covers them ahead of unclamped entries
    clamped = lost_flag.any(-1).reshape(b, q * num_levels)
    prio = jnp.where(clamped, prio + 1e-6, 0.0)
    _, sel = jax.lax.top_k(prio, k_cap)  # [B, k_cap]
    sel = sel.astype(jnp.int32)
    sel_gate = (jnp.take_along_axis(prio, sel, axis=1) > 0.0).astype(
        jnp.float32
    )  # [B, k_cap]
    # [B, Q*L] mask of corrected entries (gated: capacity padding when
    # fewer than k_cap entries clamp selects dead entries — masked out)
    sel_mask = (
        jax.nn.one_hot(sel, q * num_levels, dtype=jnp.float32)
        * sel_gate[..., None]
    ).sum(1)
    corr_mask = sel_mask.reshape(b, q, num_levels)

    # ---- windowed lane with corrected entries zeroed ----
    attw_win = attention_weights * (
        1.0 - corr_mask[:, :, None, :, None]
    ).astype(attention_weights.dtype)
    win = msda_patch(
        value, spatial_shapes, sampling_locations, attw_win,
        patch_h=patch_h, patch_w=patch_w, sel_levels=None,
        pair_table=pair_table, raw_heads=raw_heads,
    )

    # ---- exact lane over the selected entries ----
    h_vec = jnp.asarray([h_ for h_, _ in spatial_shapes.shapes], jnp.int32)
    w_vec = jnp.asarray([w_ for _, w_ in spatial_shapes.shapes], jnp.int32)
    start_vec = jnp.asarray(spatial_shapes.start_indices, jnp.int32)
    l_idx = sel % num_levels  # [B, K]
    q_idx = sel // num_levels

    # flat single-take gathers of the selected entries' samples (the
    # only gather form on the fast path — CLAUDE.md)
    ql = q * num_levels
    loc_flat = loc.reshape(b * ql, n * 2)
    attw_flat = attw.reshape(b * ql, n)
    rowsel = (jnp.arange(b, dtype=jnp.int32) * ql)[:, None] + sel
    loc_k = jnp.take(loc_flat, rowsel.reshape(-1), axis=0).reshape(
        b, k_cap, n, 2
    )
    attw_k = jnp.take(attw_flat, rowsel.reshape(-1), axis=0).reshape(
        b, k_cap, n
    ).astype(jnp.float32) * sel_gate[..., None]

    hh = jnp.take(h_vec, l_idx)[..., None]  # [B, K, 1]
    ww = jnp.take(w_vec, l_idx)[..., None]
    st = jnp.take(start_vec, l_idx)[..., None]

    def exact_core(pair, loc_k, attw_k):
        wx0, wx1, wy0, wy1, x0, y0, y1 = _corner_weights(
            loc_k, hh, ww, pair.dtype, False
        )
        sx = jnp.clip(x0, 0, ww - 1)
        batch_base = (
            jnp.arange(b, dtype=jnp.int32) * total_hw
        )[:, None, None]
        row0 = batch_base + st + jnp.clip(y0, 0, hh - 1) * ww + sx
        row1 = batch_base + st + jnp.clip(y1, 0, hh - 1) * ww + sx
        idx = jnp.stack([row0, row1])  # [2, B, K, n]
        vals = jnp.take(pair, idx.reshape(-1), axis=0).reshape(
            2, b, k_cap, n, 2 * c
        )
        sampled = _pair_bilinear(
            vals, x0 == sx, wx0, wx1, wy0, wy1
        )  # [B, K, n, C]
        sampled = sampled.reshape(b, k_cap, heads, num_points, c)
        w_hp = attw_k.reshape(b, k_cap, heads, num_points)
        contrib = jnp.einsum(
            "bkhpc,bkhp->bkhc", sampled.astype(jnp.float32), w_hp
        )
        mass = (
            (wx0 + wx1).astype(jnp.float32)
            * (wy0 + wy1).astype(jnp.float32)
        ).reshape(b, k_cap, heads, num_points)
        wsum = jnp.einsum("bkhp,bkhp->bkh", w_hp, mass)
        return contrib, wsum

    contrib, wsum_k = _with_pair_table(
        exact_core, pair_table,
        value.reshape(b * total_hw, c), loc_k, attw_k,
    )
    # scatter the K corrections back to their queries on the MXU
    onehot_q = jax.nn.one_hot(q_idx, q, dtype=jnp.float32) * sel_gate[
        ..., None
    ]  # [B, K, Q]
    corr = jnp.einsum(
        "bkq,bkhc->bqhc", onehot_q, contrib,
        preferred_element_type=jnp.float32,
    )
    corr_w = jnp.einsum(
        "bkq,bkh->bqh", onehot_q, wsum_k,
        preferred_element_type=jnp.float32,
    )

    if raw_heads:
        return win[0] + corr, win[1] + corr_w
    head_mask = jnp.repeat(
        jnp.eye(heads, dtype=jnp.float32), head_dim, axis=1
    )
    return win + jnp.einsum(
        "bqhc,hc->bqc", corr, head_mask,
        preferred_element_type=jnp.float32,
    )
