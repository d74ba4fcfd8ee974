"""Host postprocess + visualisation units."""
import json

import numpy as np
import pytest

from simpb_tpu.data.postprocess import (
    attribute_for,
    boxes_lidar_to_global,
    format_nuscenes_submission,
    unaugment_boxes2d,
)
from simpb_tpu.data.visualize import box3d_corners, render_frame


def test_unaugment_boxes2d_roundtrip():
    aug = {"crop": (10, 20, 110, 70), "resize": 0.5, "final_dim": (50, 100)}
    # a box at normalised center (0.5, 0.5) with size (0.2, 0.4)
    boxes = np.array([[0.5, 0.5, 0.2, 0.4]], np.float32)
    out = unaugment_boxes2d(boxes, aug)
    # crop size (100, 50); center -> (50, 25); size (20, 20)
    # -> xyxy (40, 15, 60, 35); +crop_y on y; /resize
    np.testing.assert_allclose(
        out[0], [40 / 0.5, (15 + 20) / 0.5, 60 / 0.5, (35 + 20) / 0.5],
        atol=1e-4,
    )


def test_boxes_lidar_to_global_rotation():
    boxes = np.zeros((1, 10), np.float32)
    boxes[0, :3] = [1, 0, 0]
    boxes[0, 7:9] = [1, 0]
    T = np.eye(4)
    th = np.pi / 2
    T[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    T[:3, 3] = [10, 0, 0]
    out = boxes_lidar_to_global(boxes, T)
    np.testing.assert_allclose(out[0, :3], [10, 1, 0], atol=1e-5)
    np.testing.assert_allclose(out[0, 7:9], [0, 1], atol=1e-5)
    np.testing.assert_allclose(out[0, 6], np.pi / 2, atol=1e-5)


def test_attributes():
    assert attribute_for("car", np.array([3.0, 0.0])) == "vehicle.moving"
    assert attribute_for("car", np.array([0.0, 0.0])) == "vehicle.parked"
    assert attribute_for("bicycle", np.array([2.0, 0.0])) == "cycle.with_rider"
    assert attribute_for("traffic_cone", np.array([0.0, 0.0])) == ""


def test_submission_format():
    res = {
        "boxes_3d": np.array(
            [[1, 2, 0.5, 2, 4, 1.5, 0.3, 1.0, 0.0, 0.0]], np.float32
        ),
        "scores_3d": np.array([0.9]),
        "labels_3d": np.array([0]),
        "valid": np.array([True]),
        "instance_ids": np.array([7]),
    }
    sub = format_nuscenes_submission([res], ["tok0"])
    assert sub["meta"]["use_camera"]
    # the submission must be strict JSON even from float32 decode
    # outputs (np.float32 scalars are not JSON serializable)
    json.dumps(sub)
    anno = sub["results"]["tok0"][0]
    assert anno["detection_name"] == "car"
    assert anno["attribute_name"] == "vehicle.moving"
    assert "tracking_id" not in anno
    np.testing.assert_allclose(anno["translation"], [1, 2, 0.5])

    # tracking mode: tracking-challenge schema only (reference
    # nuscenes_dataset.py:558-571), score threshold + class skip
    sub_t = format_nuscenes_submission([res], ["tok0"], tracking=True)
    anno_t = sub_t["results"]["tok0"][0]
    assert anno_t["tracking_id"] == "7"
    assert anno_t["tracking_name"] == "car"
    assert "detection_name" not in anno_t

    low = dict(res, scores_3d=np.array([0.1]))
    assert not format_nuscenes_submission(
        [low], ["tok0"], tracking=True
    )["results"]["tok0"]
    barrier = dict(res, labels_3d=np.array(
        [__import__("simpb_tpu.configs.base", fromlist=["CLASS_NAMES"])
         .CLASS_NAMES.index("barrier")]
    ))
    assert not format_nuscenes_submission(
        [barrier], ["tok0"], tracking=True
    )["results"]["tok0"]


def test_render_frame_shapes():
    cv2 = pytest.importorskip("cv2")
    imgs = [np.zeros((64, 128, 3), np.float32) for _ in range(6)]
    l2i = [np.eye(4) for _ in range(6)]
    res = {
        "boxes_3d": np.array(
            [[5, 0, 0, 2, 2, 2, 0.0, 0, 0, 0]], np.float32
        ),
        "scores_3d": np.array([0.9]),
        "labels_3d": np.array([0]),
    }
    frame = render_frame(imgs, res, l2i)
    assert frame.shape[0] == 128  # two rows of cameras
    assert frame.shape[1] == 3 * 128 + 128  # mosaic + BEV
    corners = box3d_corners(res["boxes_3d"])
    assert corners.shape == (1, 8, 3)
