"""Static-shape dynamic query allocation (3D -> per-camera 2D dispatch).

TPU-first redesign of the reference `DynamicQueryAllocation`
(models/allocation.py:10-159). The reference builds a *ragged* per-camera
2D query list whose length `num_anchor2d` varies per batch — the central
XLA obstacle (SURVEY.md §7). Here every camera owns a fixed capacity of
`K` query slots with a validity mask:

* query group g is the constant slice `[g*K, (g+1)*K)`;
* `trans_matrix` / `center_matrix` keep their reference meaning
  (2D-query -> 3D-query incidence, allocation.py:127-142) but are now
  fixed-shape `[bs, cams*K, A]` one-hots built from a gather index, so
  the dispatch (`matmul(trans_matrix, instance_feature)`,
  simpb_head.py:438) and the aggregation divisors ride the MXU;
* the reference's train-time random corner subsampling to
  `limit_corners_num` (allocation.py:146-159) becomes a mask-aware
  random ranking with on-device RNG;
* padded slots carry zero trans rows, zero anchors and zero ref-depth, so
  they contribute nothing downstream (mirroring the reference's
  batch-max padding rows, allocation.py:110-125).

Projection and validity semantics replicate allocation.py:27-87 exactly:
center validity = projected center strictly inside the image; corner
validity = any corner with positive depth inside the image; fallback 2D
reference point = center of the border-clamped corner bbox.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core import box3d


class Allocation(NamedTuple):
    """Fixed-shape allocation result; Q = cams * K."""

    anchor2d: jnp.ndarray  # [bs, Q, 2] normalised reference points
    ref_depth: jnp.ndarray  # [bs, Q, 1] |center depth|, 0 for invalid slots
    valid: jnp.ndarray  # [bs, Q] bool
    center_flag: jnp.ndarray  # [bs, Q] bool (slot is a center-valid query)
    parent_idx: jnp.ndarray  # [bs, Q] int32 index into the 3D anchors
    trans_matrix: jnp.ndarray  # [bs, Q, A] float one-hot incidence
    center_matrix: jnp.ndarray  # [bs, Q, A] float one-hot (center-valid only)

    @property
    def num_queries(self) -> int:
        return self.anchor2d.shape[1]


def allocate_queries(
    anchor3d: jnp.ndarray,  # [bs, A, 11]
    projection_mat: jnp.ndarray,  # [bs, cams, 4, 4]
    image_wh: tuple[int, int],
    capacity: int,
    limit_corners: int = 100,
    limit_anchor_size: tuple = (35.0, 35.0, 10.0),
    rng: Optional[jax.Array] = None,
    visibility: Optional[jnp.ndarray] = None,  # [bs, A, cams] bool
) -> Allocation:
    """Project anchors into cameras and allocate per-camera query slots.

    Args:
      rng: when given (training), corner-only queries are randomly ranked
        and capped at `limit_corners` per camera (reference
        allocation.py:85-87, 146-159); when None (eval), corner validity
        is kept inclusively and slots are filled in anchor order.
      visibility: when given (denoising path), slot validity comes from
        this GT-derived camera-visibility mask instead of the geometric
        corner test, and center validity additionally requires it
        (reference Denoise2D.get_dn_project, detection2d/denoise.py:72-95).
    """
    bs, num_anchor = anchor3d.shape[:2]
    num_cams = projection_mat.shape[1]
    img_w, img_h = image_wh

    # ---- corner + center projection (allocation.py:43-65) ----
    corners = box3d.box_corners(anchor3d, size_clip=limit_anchor_size)
    pts = jnp.concatenate(
        [corners, anchor3d[..., None, :3]], axis=-2
    )  # [bs, A, 9, 3]
    hom = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    # [bs, cams, A, 9, 4]
    proj = jnp.einsum(
        "bnij,bapj->bnapi", projection_mat, hom,
        precision=jax.lax.Precision.HIGHEST,
    )
    depth = proj[..., 2]
    xy = proj[..., :2] / jnp.maximum(depth[..., None], 1e-5)

    center_xy = xy[..., 8, :]  # [bs, cams, A, 2]
    center_depth = depth[..., 8]
    corner_xy = xy[..., :8, :]
    corner_depth = depth[..., :8]

    center_valid = (
        (center_xy[..., 0] > 0)
        & (center_xy[..., 0] < img_w)
        & (center_xy[..., 1] > 0)
        & (center_xy[..., 1] < img_h)
    )  # [bs, cams, A]
    if visibility is not None:
        center_valid = center_valid & visibility.transpose(0, 2, 1)
    corner_in = (
        (corner_xy[..., 0] > 0)
        & (corner_xy[..., 0] < img_w)
        & (corner_xy[..., 1] > 0)
        & (corner_xy[..., 1] < img_h)
        & (corner_depth > 0)
    )
    corner_valid = jnp.any(corner_in, axis=-1)  # [bs, cams, A]

    # fallback reference point: clamped corner-bbox center (allocation.py:76-83)
    x_min = jnp.clip(corner_xy[..., 0].min(-1), 0, img_w)
    x_max = jnp.clip(corner_xy[..., 0].max(-1), 0, img_w)
    y_min = jnp.clip(corner_xy[..., 1].min(-1), 0, img_h)
    y_max = jnp.clip(corner_xy[..., 1].max(-1), 0, img_h)
    fallback = jnp.stack(
        [(x_min + x_max) / 2, (y_min + y_max) / 2], axis=-1
    )
    ref_xy = jnp.where(center_valid[..., None], center_xy, fallback)

    # ---- validity / ranking (allocation.py:85-100, 146-159) ----
    if visibility is not None:
        valid = visibility.transpose(0, 2, 1)
    elif rng is not None:
        corner_only = corner_valid & ~center_valid
        r = jax.random.uniform(rng, corner_only.shape)
        # rank corner-only slots per (b, cam); keep `limit_corners` of them
        order = jnp.argsort(
            jnp.where(corner_only, r, -1.0), axis=-1, descending=True
        )
        rank = jnp.argsort(order, axis=-1)
        corner_keep = corner_only & (rank < limit_corners)
        valid = center_valid | corner_keep
    else:
        valid = center_valid | corner_valid

    # ---- static top-K slot assignment per camera ----
    # score keeps anchor order among valid entries (stable fill), invalid last
    idx = jnp.arange(num_anchor, dtype=jnp.int32)
    score = valid.astype(jnp.float32) * (2.0 * num_anchor) - idx
    _, sel = jax.lax.top_k(score, capacity)  # [bs, cams, K] anchor indices
    sel = sel.astype(jnp.int32)

    take = lambda x: jnp.take_along_axis(x, sel, axis=-1)
    slot_valid = take(valid)
    slot_center = take(center_valid) & slot_valid
    slot_xy = jnp.take_along_axis(ref_xy, sel[..., None], axis=-2)
    slot_depth = jnp.abs(take(center_depth))

    wh = jnp.asarray([img_w, img_h], dtype=slot_xy.dtype)
    anchor2d = jnp.where(slot_valid[..., None], slot_xy / wh, 0.0)
    ref_depth = jnp.where(slot_valid, slot_depth, 0.0)[..., None]

    q = num_cams * capacity
    flat = lambda x: x.reshape(bs, q, *x.shape[3:])
    parent_idx = flat(sel)
    valid_f = flat(slot_valid)
    center_f = flat(slot_center)

    onehot = jax.nn.one_hot(parent_idx, num_anchor, dtype=jnp.float32)
    trans_matrix = onehot * valid_f[..., None]
    center_matrix = onehot * center_f[..., None]

    return Allocation(
        anchor2d=flat(anchor2d),
        ref_depth=flat(ref_depth),
        valid=valid_f,
        center_flag=center_f,
        parent_idx=parent_idx,
        trans_matrix=trans_matrix,
        center_matrix=center_matrix,
    )


def dispatch_to_2d(alloc: Allocation, instance_feature: jnp.ndarray):
    """3D instance features -> 2D query slots.

    Equivalent of `matmul(ref_trans_matrix, instance_feature)`
    (simpb_head.py:438), done as a gather + mask.
    """
    gathered = jnp.take_along_axis(
        instance_feature,
        alloc.parent_idx[..., None],
        axis=1,
    )
    return gathered * alloc.valid[..., None].astype(gathered.dtype)
