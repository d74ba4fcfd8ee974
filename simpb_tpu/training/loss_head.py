"""Full training-loss assembly for the SimPB head.

TPU-native rebuild of `SimPBHead.loss` and its pieces
(reference models/simpb_head.py:749-1086): per-decoder-layer 3D Hungarian
losses (`get_loss3d`, :888-939), per-camera 2D losses
(`get_cost2d`/`get_loss2d`, :776-886) and 3D+2D denoising losses
(`get_dn_loss`, :941-1086). Everything is masked fixed-shape arithmetic
on device; loss keys match the reference's per-layer naming so training
logs are comparable.

Distributed normalisation note: the reference averages positive counts
across GPUs via `reduce_mean` (simpb_head.py:835, 904). Under a global
pjit step the mathematically equivalent form is a global sum of per-item
losses divided by the global positive count; the DN normaliser, which the
reference deliberately leaves per-rank (:771-772), is treated globally
here as well (distribution-level parity).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..configs.base import TrainConfig
from . import losses as L
from .targets2d import Target2DConfig, sample_targets2d
from .targets3d import DnBundle, TargetConfig, sample_targets3d


def loss3d(
    outputs: Dict,
    gt_boxes: jnp.ndarray,  # [bs, G, 9]
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    tc: TrainConfig,
    target_cfg: TargetConfig,
    cls_threshold_to_reg: float = 0.05,
) -> Dict[str, jnp.ndarray]:
    """get_loss3d (simpb_head.py:888-939)."""
    out = {}
    reg_weights = jnp.asarray(tc.reg_weights, jnp.float32)
    d = len(tc.reg_weights)
    for idx, (cls, reg, qt) in enumerate(
        zip(outputs["classification"], outputs["prediction"], outputs["quality"])
    ):
        reg = reg[..., :d]
        cls_t, box_t, w = sample_targets3d(
            cls, reg, gt_boxes, gt_labels, gt_valid, target_cfg
        )
        mask = ~jnp.all(box_t == 0, axis=-1)
        num_pos = jnp.maximum(mask.sum().astype(jnp.float32), 1.0)
        if cls_threshold_to_reg > 0:
            mask = mask & (
                jax.nn.sigmoid(cls.max(-1)) > cls_threshold_to_reg
            )

        cls_loss = L.sigmoid_focal_loss(
            cls.reshape(-1, cls.shape[-1]),
            cls_t.reshape(-1),
            avg_factor=num_pos,
            loss_weight=tc.cls_weight,
        )
        m = mask[..., None].astype(jnp.float32)
        w_full = w * reg_weights * m
        box_t = jnp.nan_to_num(box_t)
        reg_out = L.sparse_box3d_loss(
            reg.reshape(-1, d),
            box_t.reshape(-1, d),
            weight=w_full.reshape(-1, d),
            avg_factor=num_pos,
            quality=qt.reshape(-1, 2) if qt is not None else None,
            cls_target=cls_t.reshape(-1),
            quality_mask=mask.reshape(-1),
            box_loss_weight=tc.box_weight,
            suffix=f"3d_{idx}",
        )
        out[f"loss_cls3d_{idx}"] = cls_loss
        out.update(reg_out)
    return out


def loss2d(
    outputs: Dict,
    gt_boxes2d: jnp.ndarray,  # [bs, cams, G2, 4]
    gt_labels2d: jnp.ndarray,
    gt_alphas2d: jnp.ndarray,
    gt_valid2d: jnp.ndarray,
    image_wh: Tuple[int, int],
    tc: TrainConfig,
    t2_cfg: Target2DConfig = Target2DConfig(),
) -> Dict[str, jnp.ndarray]:
    """get_cost2d + get_loss2d (simpb_head.py:776-886)."""
    out = {}
    img_w, img_h = image_wh
    factor = jnp.asarray([img_w, img_h, img_w, img_h], jnp.float32)
    for idx, (cls, reg, alpha, alloc) in enumerate(
        zip(
            outputs["classification2d"],
            outputs["prediction2d"],
            outputs["prediction_alpha2d"],
            outputs["allocations"],
        )
    ):
        cls_t, box_t, alpha_t, w = sample_targets2d(
            cls, reg, alloc.valid, gt_boxes2d, gt_labels2d, gt_alphas2d,
            gt_valid2d, image_wh, t2_cfg,
        )
        mask = ~jnp.all(box_t == 0, axis=-1)
        mask = mask & alloc.valid  # qg_mask (simpb_head.py:829-833)
        num_pos = jnp.maximum(mask.sum().astype(jnp.float32), 1.0)

        cls_loss = L.sigmoid_focal_loss(
            cls.reshape(-1, cls.shape[-1]),
            cls_t.reshape(-1),
            avg_factor=num_pos,
            loss_weight=tc.cls_weight2d,
        )
        m = mask[..., None].astype(jnp.float32)
        wm = w * m
        iou_loss = L.giou_loss(
            L.bbox_cxcywh_to_xyxy(reg) * factor,
            box_t,
            weight=wm,
            avg_factor=num_pos,
            loss_weight=tc.iou_weight2d,
        )
        box_loss = L.l1_loss(
            reg,
            L.bbox_xyxy_to_cxcywh(box_t) / factor,
            weight=wm,
            avg_factor=num_pos,
            loss_weight=tc.bbox_weight2d,
        )
        alpha_loss = L.l1_loss(
            alpha,
            alpha_t,
            weight=wm[..., :2],
            avg_factor=num_pos,
            loss_weight=tc.alpha_weight2d,
        )
        out[f"loss_cls2d_{idx}"] = cls_loss
        out[f"loss_iou2d_{idx}"] = iou_loss
        out[f"loss_box2d_{idx}"] = box_loss
        out[f"loss_alpha2d_{idx}"] = alpha_loss
    return out


def _prepare_dn(bundle: DnBundle, d: int):
    """prepare_for_dn_loss (simpb_head.py:764-774), masked fixed-shape."""
    valid = bundle.valid_mask  # [bs, num_dn]
    pos = valid & (bundle.cls_target >= 0)
    num_dn_pos = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
    return valid, pos, num_dn_pos


def dn_loss(
    outputs: Dict,
    tc: TrainConfig,
    num_single_frame_decoder: int = 1,
    image_wh: Tuple[int, int] = (704, 256),
) -> Dict[str, jnp.ndarray]:
    """get_dn_loss (simpb_head.py:941-1086), 3D + 2D branches."""
    out = {}
    if "dn_prediction" not in outputs:
        return out
    d = len(tc.reg_weights)
    reg_weights = jnp.asarray(tc.reg_weights, jnp.float32)

    first = outputs["dn_bundle_first"]
    temp = outputs["dn_bundle_temp"]
    for idx, (cls, reg) in enumerate(
        zip(outputs["dn_classification"], outputs["dn_prediction"])
    ):
        bundle = temp if idx >= num_single_frame_decoder else first
        valid, pos, num_dn_pos = _prepare_dn(bundle, d)
        cls_loss = L.sigmoid_focal_loss(
            cls.reshape(-1, cls.shape[-1]),
            jnp.where(valid, bundle.cls_target, -1).reshape(-1),
            weight=valid.reshape(-1).astype(jnp.float32),
            avg_factor=num_dn_pos,
            loss_weight=tc.cls_weight,
        )
        w = pos[..., None].astype(jnp.float32) * reg_weights
        reg_out = L.sparse_box3d_loss(
            reg[..., :d].reshape(-1, d),
            bundle.box_target[..., :d].reshape(-1, d),
            weight=w.reshape(-1, d),
            avg_factor=num_dn_pos,
            quality=None,
            cls_target=jnp.where(pos, bundle.cls_target, -1).reshape(-1),
            box_loss_weight=tc.box_weight,
            suffix=f"3d_dn_{idx}",
        )
        out[f"loss_cls3d_dn_{idx}"] = cls_loss
        out.update(reg_out)

    # ---- 2D DN (simpb_head.py:979-1056) ----
    if "dn_prediction2d" in outputs and outputs["dn_slot_targets"]:
        img_w, img_h = image_wh
        factor = jnp.asarray([img_w, img_h, img_w, img_h], jnp.float32)
        for idx, (cls_p, box_p, alpha_p, tgt) in enumerate(
            zip(
                outputs["dn_classification2d"],
                outputs["dn_prediction2d"],
                outputs["dn_prediction_alpha2d"],
                outputs["dn_slot_targets"],
            )
        ):
            valid = tgt["valid"]
            num_pos = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
            # reference calls loss_cls2d without avg_factor here
            # (simpb_head.py:1004) => mmdet mean reduction over the
            # boolean-selected [N_valid, C] elements
            num_cls = cls_p.shape[-1]
            cls_loss = L.sigmoid_focal_loss(
                cls_p.reshape(-1, num_cls),
                jnp.where(valid, tgt["cls"], -1).reshape(-1),
                weight=valid.reshape(-1).astype(jnp.float32),
                avg_factor=num_pos * num_cls,
                loss_weight=tc.cls_weight2d,
            )
            pos = valid & (tgt["cls"] >= 0)
            wm = pos[..., None].astype(jnp.float32)
            iou_loss = L.giou_loss(
                L.bbox_cxcywh_to_xyxy(box_p) * factor,
                tgt["box"],
                weight=wm.repeat(4, -1),
                avg_factor=num_pos,
                loss_weight=tc.iou_weight2d,
            )
            box_loss = L.l1_loss(
                box_p,
                L.bbox_xyxy_to_cxcywh(tgt["box"]) / factor,
                weight=wm,
                avg_factor=num_pos,
                loss_weight=tc.bbox_weight2d,
            )
            alpha_sc = jnp.stack(
                [jnp.sin(tgt["alpha"]), jnp.cos(tgt["alpha"])], axis=-1
            )
            alpha_loss = L.l1_loss(
                alpha_p,
                alpha_sc,
                weight=wm.repeat(2, -1)[..., :2],
                avg_factor=num_pos,
                loss_weight=tc.alpha_weight2d,
            )
            out[f"loss_cls2d_dn_{idx}"] = cls_loss
            out[f"loss_iou2d_dn_{idx}"] = iou_loss
            out[f"loss_box2d_dn_{idx}"] = box_loss
            out[f"loss_alpha2d_dn_{idx}"] = alpha_loss
    return out


def total_loss(
    outputs: Dict,
    batch: Dict,
    tc: TrainConfig,
    target_cfg: TargetConfig = TargetConfig(),
    image_wh: Tuple[int, int] = (704, 256),
    num_single_frame_decoder: int = 1,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Assemble the full loss dict and its scalar sum
    (reference SimPBHead.loss, simpb_head.py:749-762 + dense depth,
    simpb.py:100-108)."""
    loss_dict = {}
    loss_dict.update(
        loss3d(
            outputs,
            batch["gt_boxes3d"],
            batch["gt_labels3d"],
            batch["gt_valid3d"],
            tc,
            target_cfg,
        )
    )
    if "prediction2d" in outputs and outputs["prediction2d"]:
        loss_dict.update(
            loss2d(
                outputs,
                batch["gt_boxes2d"],
                batch["gt_labels2d"],
                batch["gt_alphas2d"],
                batch["gt_valid2d"],
                image_wh,
                tc,
            )
        )
    loss_dict.update(
        dn_loss(outputs, tc, num_single_frame_decoder, image_wh)
    )
    if "depth_preds" in outputs and "gt_depth" in batch:
        from ..models.backbone import dense_depth_loss

        loss_dict["loss_dense_depth"] = dense_depth_loss(
            outputs["depth_preds"], batch["gt_depth"]
        )
    total = sum(loss_dict.values())
    return total, loss_dict
