"""Host-side result post-processing: ragged 2D association + submission.

Completes the fixed-shape device decode (simpb_tpu/models/decoder3d.py)
with the ragged parts of the reference `SparseBox3DDecoder.decode_with2d`
(detection3d/decoder.py:124-252): selecting the 2D boxes associated to
kept 3D queries through the allocation incidence, remapping per-camera
query groups, un-augmenting 2D boxes to original image coordinates, and
the nuScenes submission formatting with attribute heuristics
(nuscenes_dataset.py:504-586).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..configs.base import CLASS_NAMES

DEFAULT_ATTRIBUTES = {
    "car": "vehicle.parked",
    "truck": "vehicle.parked",
    "construction_vehicle": "vehicle.parked",
    "bus": "vehicle.parked",
    "trailer": "vehicle.parked",
    "barrier": "",
    "motorcycle": "cycle.without_rider",
    "bicycle": "cycle.without_rider",
    "pedestrian": "pedestrian.standing",
    "traffic_cone": "",
}


def attribute_for(class_name: str, velocity: np.ndarray) -> str:
    """Velocity-based attribute heuristic (reference
    nuscenes_dataset.py:553-576)."""
    speed = float(np.linalg.norm(velocity[:2]))
    if speed > 0.2:
        if class_name in (
            "car", "construction_vehicle", "bus", "truck", "trailer",
        ):
            return "vehicle.moving"
        if class_name in ("bicycle", "motorcycle"):
            return "cycle.with_rider"
    return DEFAULT_ATTRIBUTES.get(class_name, "")


def unaugment_boxes2d(boxes_cxcywh: np.ndarray, aug_config: Dict) -> np.ndarray:
    """Normalised cxcywh (network space) -> original-image xyxy pixels
    (reference decode_box2d, decoder.py:36-51)."""
    crop = aug_config["crop"]
    scale = aug_config["resize"]
    cw = crop[2] - crop[0]
    ch = crop[3] - crop[1]
    cx, cy, w, h = np.split(boxes_cxcywh, 4, axis=-1)
    xyxy = np.concatenate(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )
    xyxy[:, 0::2] = np.clip(xyxy[:, 0::2] * cw, 0, cw)
    xyxy[:, 1::2] = np.clip(xyxy[:, 1::2] * ch, 0, ch)
    xyxy[:, 1::2] += crop[1]
    return xyxy / scale


def associate_2d(
    dec3d: Dict[str, np.ndarray],
    cls2d: np.ndarray,  # [Q2, C] logits
    box2d: np.ndarray,  # [Q2, 4] normalised cxcywh
    parent_idx: np.ndarray,  # [Q2]
    slot_valid: np.ndarray,  # [Q2]
    capacity: int,
    aug_config: Dict,
    sample_idx: int = 0,
) -> Dict:
    """Select 2D boxes whose 3D parent survived the top-k decode; returns
    ragged per-sample arrays (decoder.py:183-243 semantics)."""
    kept3d = set(np.asarray(dec3d["anchor_idx"][sample_idx]).tolist())
    sel = np.where(
        slot_valid & np.isin(parent_idx, list(kept3d))
    )[0]
    scores = 1 / (1 + np.exp(-cls2d[sel]))
    labels = scores.argmax(-1)
    return {
        "boxes_2d": unaugment_boxes2d(box2d[sel], aug_config),
        "scores_2d": scores.max(-1),
        "labels_2d": labels,
        "camidx_2d": sel // capacity,
        "parent_3d": parent_idx[sel],
    }


# classes excluded from the nuScenes tracking benchmark; the reference
# skips them when formatting a tracking submission
# (nuscenes_dataset.py:524-529)
NON_TRACKING_CLASSES = ("barrier", "traffic_cone", "construction_vehicle")


def format_nuscenes_submission(
    results: List[Dict],
    sample_tokens: List[str],
    tracking: bool = False,
    tracking_threshold: float = 0.2,
) -> Dict:
    """Fixed-shape decode outputs -> nuScenes submission dict
    (reference _format_bbox, nuscenes_dataset.py:504-586). `results` are
    per-sample dicts from decode_boxes3d (numpy), boxes in the lidar
    frame already converted to global by the caller if needed.

    With `tracking=True`, emits the tracking-challenge schema instead
    (tracking_name/score/id; no detection keys), applying the
    reference's score threshold (0.2, nuscenes_dataset.py:90, 510-512)
    and skipping the non-tracking classes (:524-529). `instance_ids`
    must be present in each result."""
    annos = {}
    for res, token in zip(results, sample_tokens):
        boxes = np.asarray(res["boxes_3d"])
        scores = np.asarray(res["scores_3d"])
        labels = np.asarray(res["labels_3d"])
        valid = np.asarray(res.get("valid", np.ones(len(boxes), bool)))
        sample_annos = []
        for i in np.where(valid)[0]:
            name = CLASS_NAMES[int(labels[i])]
            box = boxes[i]
            yaw = box[6]
            # pure-Python floats: np.float32 scalars are not JSON
            # serializable (np.float64 is, which hid this until decode
            # outputs went float32)
            quat = [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]
            anno = {
                "sample_token": token,
                "translation": box[:3].tolist(),
                "size": box[3:6].tolist(),
                "rotation": quat,
                "velocity": box[7:9].tolist(),
            }
            if tracking:
                if name in NON_TRACKING_CLASSES:
                    continue
                if float(scores[i]) < tracking_threshold:
                    continue
                anno["tracking_id"] = str(int(res["instance_ids"][i]))
                anno["tracking_name"] = name
                anno["tracking_score"] = float(scores[i])
            else:
                anno["detection_name"] = name
                anno["detection_score"] = float(scores[i])
                anno["attribute_name"] = attribute_for(name, box[7:9])
            sample_annos.append(anno)
        annos[token] = sample_annos
    return {
        "meta": {
            "use_camera": True,
            "use_lidar": False,
            "use_radar": False,
            "use_map": False,
            "use_external": False,
        },
        "results": annos,
    }


def boxes_lidar_to_global(
    boxes: np.ndarray, lidar2global: np.ndarray
) -> np.ndarray:
    """Decoded boxes [N, 10] from the lidar frame to global
    (reference lidar_nusc_box_to_global, nuscenes_dataset.py:858-899)."""
    out = boxes.copy()
    r = lidar2global[:3, :3]
    out[:, :3] = boxes[:, :3] @ r.T + lidar2global[:3, 3]
    yaw_global = np.arctan2(r[1, 0], r[0, 0])
    out[:, 6] = boxes[:, 6] + yaw_global
    vel = np.concatenate(
        [boxes[:, 7:9], np.zeros((len(boxes), 1))], axis=-1
    )
    out[:, 7:9] = (vel @ r.T)[:, :2]
    return out
