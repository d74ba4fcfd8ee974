"""Per-camera 2D target assignment (on-device).

TPU-native rebuild of reference detection2d/coster.py
(`SparseBox2DCoster`): per-(sample, camera-group) focal + L1 + GIoU
matching costs -> exact Hungarian -> scattered per-slot targets. The
reference loops cameras and batch on host with scipy
(coster.py:29-176); here camera groups are static slot blocks and the
assignment is batched on device.

2D ground truth arrives padded per camera: boxes [bs, cams, G2, 4] in
pixel xyxy of the network input, labels / alphas / valid similarly.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .losses import (
    bbox_cxcywh_to_xyxy,
    bbox_xyxy_to_cxcywh,
    focal_match_cost,
    giou,
)
from .matching import batched_assignment


class Target2DConfig(NamedTuple):
    cls_weight: float = 2.0
    reg_weight: float = 5.0
    iou_weight: float = 2.0
    eps: float = 1e-12
    alpha: float = 0.25
    gamma: float = 2.0


def sample_targets2d(
    cls_pred: jnp.ndarray,  # [bs, cams*K, C] logits
    box_pred: jnp.ndarray,  # [bs, cams*K, 4] normalised cxcywh
    slot_valid: jnp.ndarray,  # [bs, cams*K] allocation validity
    gt_boxes: jnp.ndarray,  # [bs, cams, G2, 4] pixel xyxy
    gt_labels: jnp.ndarray,  # [bs, cams, G2]
    gt_alphas: jnp.ndarray,  # [bs, cams, G2] observation angle
    gt_valid: jnp.ndarray,  # [bs, cams, G2] bool
    image_wh: Tuple[int, int],
    cfg: Target2DConfig = Target2DConfig(),
):
    """Returns per-slot targets, all [bs, cams*K, ...]:
    (cls_target int (-1 = unmatched), box_target pixel xyxy,
    alpha_target (sin, cos), reg_weights [.., 4]).
    """
    bs, q, num_cls = cls_pred.shape
    cams, g2 = gt_boxes.shape[1:3]
    k = q // cams
    img_w, img_h = image_wh
    factor = jnp.asarray([img_w, img_h, img_w, img_h], jnp.float32)

    # fold cameras into batch: [bs*cams, K, ...] vs [bs*cams, G2, ...]
    cls_p = cls_pred.reshape(bs * cams, k, num_cls)
    box_p = box_pred.reshape(bs * cams, k, 4)
    valid_p = slot_valid.reshape(bs * cams, k)
    gt_b = gt_boxes.reshape(bs * cams, g2, 4)
    gt_l = gt_labels.reshape(bs * cams, g2)
    gt_a = gt_alphas.reshape(bs * cams, g2)
    gt_v = gt_valid.reshape(bs * cams, g2)

    # --- costs (coster.py:179-226, mmdet match-cost formulas) ---
    cls_cost = focal_match_cost(
        cls_p, gt_l, cfg.alpha, cfg.gamma, cfg.eps, cfg.cls_weight
    )

    gt_cxcywh = bbox_xyxy_to_cxcywh(gt_b) / factor
    reg_cost = (
        jnp.abs(box_p[:, :, None] - gt_cxcywh[:, None]).sum(-1)
        * cfg.reg_weight
    )
    pred_xyxy = bbox_cxcywh_to_xyxy(box_p) * factor
    iou_cost = (
        -giou(pred_xyxy[:, :, None], gt_b[:, None]) * cfg.iou_weight
    )

    cost = cls_cost + reg_cost + iou_cost  # [B, K, G2]
    # padded prediction slots get the per-matrix max (coster.py:53-54)
    cmax = jnp.max(jnp.where(gt_v[:, None], cost, -jnp.inf), axis=(1, 2))
    cmax = jnp.nan_to_num(cmax, neginf=0.0)
    cost = jnp.where(valid_p[:, :, None], cost, cmax[:, None, None])
    cost = jnp.nan_to_num(cost, nan=1e8, posinf=1e8, neginf=1e8)

    col = batched_assignment(jnp.swapaxes(cost, 1, 2), gt_v, 1e6)  # [B, G2]

    rows = jnp.arange(bs * cams)[:, None]
    safe_col = jnp.where(gt_v, col, k)
    cls_t = jnp.full((bs * cams, k), -1, jnp.int32)
    cls_t = cls_t.at[rows, safe_col].set(gt_l.astype(jnp.int32), mode="drop")
    box_t = jnp.zeros((bs * cams, k, 4), jnp.float32)
    box_t = box_t.at[rows, safe_col].set(gt_b, mode="drop")
    alpha_sc = jnp.stack([jnp.sin(gt_a), jnp.cos(gt_a)], axis=-1)
    alpha_t = jnp.zeros((bs * cams, k, 2), jnp.float32)
    alpha_t = alpha_t.at[rows, safe_col].set(alpha_sc, mode="drop")
    w_t = jnp.zeros((bs * cams, k, 4), jnp.float32)
    w_t = w_t.at[rows, safe_col].set(
        jnp.ones((bs * cams, g2, 4), jnp.float32), mode="drop"
    )

    unfold = lambda x: x.reshape((bs, q) + x.shape[2:])
    return unfold(cls_t), unfold(box_t), unfold(alpha_t), unfold(w_t)


def trans_cost3d(
    cost2d: jnp.ndarray,  # [bs, cams, K, G2] per-camera 2D cost maps
    slot_valid: jnp.ndarray,  # [bs, cams*K] allocation validity
    gt_valid: jnp.ndarray,  # [bs, cams, G2]
    gt_2d_3d_map: jnp.ndarray,  # [bs, cams, G2] 3D-GT index per 2D GT
    trans_matrix: jnp.ndarray,  # [bs, cams*K, A3] 2D->3D incidence
    num_gt3d: int,
) -> jnp.ndarray:
    """Fold the 2D matching costs into the 3D cost map
    (reference detection2d/coster.py:63-109 `trans_cost` — built but
    never invoked by the released head; provided for surface parity).

    Averages each 3D GT's 2D-target costs (via the `gt_2d_3d_map`
    one-hot) and each 3D query's 2D-query costs (via `trans_matrix`ᵀ),
    with the reference's fill conventions: slots outside their camera
    block / invalid entries take the per-sample max cost, and all-zero
    rows/columns of the folded map are reset to its max. Returns
    [bs, A3, num_gt3d], addable to the 3D assignment cost.
    """
    bs, cams, k, g2 = cost2d.shape
    q2 = cams * k
    a3 = trans_matrix.shape[-1]

    valid_q = slot_valid.reshape(bs, cams, k)
    pairs = (
        valid_q[..., None] & gt_valid[:, :, None, :]
    )  # [bs, cams, K, G2]
    big = jnp.max(
        jnp.where(pairs, cost2d, -jnp.inf), axis=(1, 2, 3)
    )  # per-sample max over valid in-camera entries (coster.py:88-90)
    big = jnp.nan_to_num(big, neginf=0.0)
    filled = jnp.where(pairs, cost2d, big[:, None, None, None])

    # block-diagonal extension [bs, Q2, cams*G2]: a query's costs
    # against other cameras' targets take the max fill
    ext = jnp.full((bs, cams, k, cams, g2), 0.0, cost2d.dtype)
    ext = ext + big[:, None, None, None, None]
    cam_eye = jnp.eye(cams, dtype=bool)[None, :, None, :, None]
    ext = jnp.where(
        cam_eye, filled[:, :, :, None, :], ext
    ).reshape(bs, q2, cams * g2)

    # 2D target -> 3D GT one-hot (coster.py:93-95)
    map_oh = jax.nn.one_hot(
        jnp.clip(gt_2d_3d_map, 0, num_gt3d - 1), num_gt3d,
        dtype=cost2d.dtype,
    ) * gt_valid[..., None].astype(cost2d.dtype)
    map_oh = map_oh.reshape(bs, cams * g2, num_gt3d)

    floor = 1e-5  # reference clamps at 1e-5 (coster.py:98-99)
    per_gt3d = jnp.einsum("bqt,btg->bqg", ext, map_oh) / jnp.clip(
        map_oh.sum(1), floor
    )[:, None]
    tm_t = jnp.swapaxes(trans_matrix.astype(cost2d.dtype), 1, 2)
    folded = jnp.einsum("baq,bqg->bag", tm_t, per_gt3d) / jnp.clip(
        tm_t.sum(-1), floor
    )[..., None]

    # zero rows/cols (no 2D evidence) -> max (coster.py:102-105)
    mask = (folded.sum(1) == 0)[:, None, :] | (
        folded.sum(2) == 0
    )[:, :, None]
    fmax = jnp.max(folded, axis=(1, 2), keepdims=True)
    return jnp.where(mask, fmax, folded)
