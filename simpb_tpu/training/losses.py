"""Detection losses (mmdet-equivalent formulas, masked static shapes).

Replaces the reference's mmdet-registry losses (FocalLoss, L1Loss,
GIoULoss, CrossEntropyLoss(sigmoid), GaussianFocalLoss) and the composite
`SparseBox3DLoss` (reference detection3d/losses.py:11-69). All functions
take explicit element weights / masks and an `avg_factor`, mirroring
mmdet's reduction contract, and operate on fixed-shape tensors.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..core.box3d import CNS, COS_YAW, SIN_YAW, X, Y, YNS, Z


def sigmoid_focal_loss(
    logits: jnp.ndarray,  # [N, C]
    labels: jnp.ndarray,  # [N] int, label == C means background
    weight: Optional[jnp.ndarray] = None,  # [N]
    avg_factor: Optional[jnp.ndarray] = None,
    alpha: float = 0.25,
    gamma: float = 2.0,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    num_cls = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_cls, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    ce = -(
        onehot * jax.nn.log_sigmoid(logits)
        + (1 - onehot) * jax.nn.log_sigmoid(-logits)
    )
    pt = (1 - p) * onehot + p * (1 - onehot)
    focal = (alpha * onehot + (1 - alpha) * (1 - onehot)) * pt**gamma
    loss = ce * focal
    if weight is not None:
        loss = loss * weight[..., None]
    loss = loss.sum()
    if avg_factor is not None:
        loss = loss / jnp.maximum(avg_factor, 1.0)
    return loss * loss_weight


def focal_match_cost(
    cls_pred: jnp.ndarray,  # [B, N, C] logits
    gt_labels: jnp.ndarray,  # [B, G] int (any value where invalid)
    alpha: float,
    gamma: float,
    eps: float,
    weight: float,
) -> jnp.ndarray:
    """Focal classification MATCHING cost [B, N, G] (mmdet
    FocalLossCost semantics, reference detection3d/target.py:158-180 ==
    detection2d/coster.py:179-205 — one implementation for both)."""
    p = jax.nn.sigmoid(cls_pred)
    neg = -jnp.log(1 - p + eps) * (1 - alpha) * p**gamma
    pos = -jnp.log(p + eps) * alpha * (1 - p) ** gamma
    diff = pos - neg  # [B, N, C]
    labels = jnp.clip(gt_labels, 0, cls_pred.shape[-1] - 1)
    return (
        jnp.take_along_axis(
            diff, labels[:, None, :].repeat(diff.shape[1], 1), axis=2
        )
        * weight
    )


def l1_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    avg_factor: Optional[jnp.ndarray] = None,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    loss = jnp.abs(pred - target)
    if weight is not None:
        loss = loss * weight
    loss = loss.sum()
    if avg_factor is not None:
        loss = loss / jnp.maximum(avg_factor, 1.0)
    return loss * loss_weight


def bce_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    avg_factor: Optional[jnp.ndarray] = None,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """Binary cross entropy with logits (mmdet CrossEntropyLoss sigmoid)."""
    loss = -(
        target * jax.nn.log_sigmoid(logits)
        + (1 - target) * jax.nn.log_sigmoid(-logits)
    )
    if weight is not None:
        loss = loss * weight
    loss = loss.sum()
    if avg_factor is not None:
        loss = loss / jnp.maximum(avg_factor, 1.0)
    return loss * loss_weight


def gaussian_focal_loss(
    pred: jnp.ndarray,  # probabilities (already sigmoided)
    target: jnp.ndarray,  # gaussian heatmap; ==1 marks positives
    weight: Optional[jnp.ndarray] = None,
    avg_factor: Optional[jnp.ndarray] = None,
    alpha: float = 2.0,
    gamma: float = 4.0,
    loss_weight: float = 1.0,
    eps: float = 1e-12,
) -> jnp.ndarray:
    pos = (target == 1.0).astype(pred.dtype)
    neg = 1.0 - pos
    pos_loss = -jnp.log(pred + eps) * (1 - pred) ** alpha * pos
    neg_loss = (
        -jnp.log(1 - pred + eps) * pred**alpha * (1 - target) ** gamma * neg
    )
    loss = pos_loss + neg_loss
    if weight is not None:
        loss = loss * weight
    loss = loss.sum()
    if avg_factor is not None:
        loss = loss / jnp.maximum(avg_factor, 1.0)
    return loss * loss_weight


def bbox_cxcywh_to_xyxy(box: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(box, 4, axis=-1)
    return jnp.concatenate(
        [cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1
    )


def bbox_xyxy_to_cxcywh(box: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(box, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1
    )


def giou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise-free GIoU of aligned xyxy boxes [..., 4] -> [...]."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = jnp.maximum(boxes1[..., 2] - boxes1[..., 0], 0.0) * jnp.maximum(
        boxes1[..., 3] - boxes1[..., 1], 0.0
    )
    a2 = jnp.maximum(boxes2[..., 2] - boxes2[..., 0], 0.0) * jnp.maximum(
        boxes2[..., 3] - boxes2[..., 1], 0.0
    )
    union = a1 + a2 - inter
    iou = inter / jnp.maximum(union, 1e-6)
    lt_c = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_c = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh_c = jnp.maximum(rb_c - lt_c, 0.0)
    area_c = wh_c[..., 0] * wh_c[..., 1]
    return iou - (area_c - union) / jnp.maximum(area_c, 1e-6)


def giou_loss(
    pred_xyxy: jnp.ndarray,
    target_xyxy: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,  # [N] or [N,4]
    avg_factor: Optional[jnp.ndarray] = None,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    loss = 1.0 - giou(pred_xyxy, target_xyxy)
    if weight is not None:
        if weight.ndim == loss.ndim + 1:
            weight = weight.mean(-1)
        loss = loss * weight
    loss = loss.sum()
    if avg_factor is not None:
        loss = loss / jnp.maximum(avg_factor, 1.0)
    return loss * loss_weight


def sparse_box3d_loss(
    box: jnp.ndarray,  # [N, 10] predictions (anchor parameterisation)
    box_target: jnp.ndarray,  # [N, 10]
    weight: jnp.ndarray,  # [N, 10] combined reg weights (0 masks out)
    avg_factor: jnp.ndarray,
    quality: Optional[jnp.ndarray] = None,  # [N, 2]
    cls_target: Optional[jnp.ndarray] = None,  # [N]
    quality_mask: Optional[jnp.ndarray] = None,  # [N] bool
    box_loss_weight: float = 0.25,
    cls_allow_reverse: tuple = (5,),  # barrier (config:307)
    suffix: str = "",
) -> Dict[str, jnp.ndarray]:
    """Composite 3D loss (reference detection3d/losses.py:32-69):

    L1 box loss + centerness BCE (target exp(-||Δxyz||)) + yawness
    GaussianFocal (target = sign of yaw cosine similarity), with
    yaw-reversal allowance for direction-symmetric classes.
    """
    yaw_pred = box[..., (SIN_YAW, COS_YAW)]
    yaw_tgt = box_target[..., (SIN_YAW, COS_YAW)]
    cos_sim = (yaw_pred * yaw_tgt).sum(-1) / jnp.maximum(
        jnp.linalg.norm(yaw_pred, axis=-1) * jnp.linalg.norm(yaw_tgt, axis=-1),
        1e-8,
    )
    if cls_allow_reverse and cls_target is not None:
        reverse = (cos_sim < 0) & jnp.isin(
            cls_target, jnp.asarray(cls_allow_reverse)
        )
        yaw_tgt = jnp.where(reverse[..., None], -yaw_tgt, yaw_tgt)
        # slice/concat instead of .at[..., idx].set — fused gather+scatter
        # of the same tensor miscompiles on the TPU stack
        box_target = jnp.concatenate(
            [
                box_target[..., :SIN_YAW],
                yaw_tgt,
                box_target[..., COS_YAW + 1 :],
            ],
            axis=-1,
        )
        cos_sim = jnp.where(reverse, -cos_sim, cos_sim)

    out = {
        f"loss_box{suffix}": l1_loss(
            box, box_target, weight=weight, avg_factor=avg_factor,
            loss_weight=box_loss_weight,
        )
    }
    if quality is not None:
        qm = (
            quality_mask.astype(box.dtype)
            if quality_mask is not None
            else None
        )
        cns = quality[..., CNS]
        yns = jax.nn.sigmoid(quality[..., YNS])
        cns_target = jnp.exp(
            -jnp.linalg.norm(
                box_target[..., (X, Y, Z)] - box[..., (X, Y, Z)], axis=-1
            )
        )
        out[f"loss_cns{suffix}"] = bce_loss(
            cns, cns_target, weight=qm, avg_factor=avg_factor
        )
        yns_target = (cos_sim > 0).astype(box.dtype)
        out[f"loss_yns{suffix}"] = gaussian_focal_loss(
            yns, yns_target, weight=qm, avg_factor=avg_factor
        )
    return out
