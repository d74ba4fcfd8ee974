#!/usr/bin/env python
"""Offline nuScenes -> simpb info-pkl converter.

Equivalent of reference tools/data_converter/nuscenes_converter.py
(:44-767): walks the nuScenes DB, writes
`simpb_nuscenes_infos_{train,val,test}.pkl` with per-sample poses, 6-cam
calibrations, sweeps, 3D GT (+velocity, instance ids) and per-camera 2D
GT obtained by reprojecting 3D box corners and clipping the convex hull
against the image canvas. The pkl format is framework-neutral and
identical to the reference's, so existing converted datasets work as-is.

Requires the `nuscenes-devkit` (only for this offline step; the training
runtime has no devkit dependency). The convex-hull clip uses a
numpy Sutherland-Hodgman implementation instead of shapely.

Usage:
  python tools/nuscenes_converter.py --data-root data/nuscenes \
      --version v1.0-trainval --out-dir data/nuscenes
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CAM_TYPES = (
    "CAM_FRONT",
    "CAM_FRONT_RIGHT",
    "CAM_FRONT_LEFT",
    "CAM_BACK",
    "CAM_BACK_LEFT",
    "CAM_BACK_RIGHT",
)

NAME_MAP = {
    "movable_object.barrier": "barrier",
    "vehicle.bicycle": "bicycle",
    "vehicle.bus.bendy": "bus",
    "vehicle.bus.rigid": "bus",
    "vehicle.car": "car",
    "vehicle.construction": "construction_vehicle",
    "vehicle.motorcycle": "motorcycle",
    "human.pedestrian.adult": "pedestrian",
    "human.pedestrian.child": "pedestrian",
    "human.pedestrian.construction_worker": "pedestrian",
    "human.pedestrian.police_officer": "pedestrian",
    "movable_object.trafficcone": "traffic_cone",
    "vehicle.trailer": "trailer",
    "vehicle.truck": "truck",
}

CLASSES = (
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
)


def clip_polygon(points: np.ndarray, w: float, h: float):
    """Sutherland-Hodgman clip of a convex polygon against [0,w]x[0,h]."""
    def clip_edge(poly, inside, intersect):
        out = []
        n = len(poly)
        for i in range(n):
            cur, nxt = poly[i], poly[(i + 1) % n]
            if inside(cur):
                out.append(cur)
                if not inside(nxt):
                    out.append(intersect(cur, nxt))
            elif inside(nxt):
                out.append(intersect(cur, nxt))
        return out

    def ix(p, q, axis, val):
        t = (val - p[axis]) / (q[axis] - p[axis])
        return p + t * (q - p)

    poly = list(points)
    for axis, val, sign in (
        (0, 0.0, 1), (0, w, -1), (1, 0.0, 1), (1, h, -1),
    ):
        if not poly:
            return None
        poly = clip_edge(
            poly,
            lambda p: sign * (p[axis] - val) >= 0,
            lambda p, q: ix(p, q, axis, val),
        )
    if len(poly) < 3:
        return None
    return np.asarray(poly)


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; points [N, 2] -> hull vertices CCW."""
    pts = points[np.lexsort((points[:, 1], points[:, 0]))]

    def half(pts):
        out = []
        for p in pts:
            while (
                len(out) >= 2
                and np.cross(out[-1] - out[-2], p - out[-2]) <= 0
            ):
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


def box_corners_3d(center, wlh, rot):
    w, l, h = wlh
    x = np.array([1, 1, 1, 1, -1, -1, -1, -1]) * l / 2
    y = np.array([1, -1, -1, 1, 1, -1, -1, 1]) * w / 2
    z = np.array([1, 1, -1, -1, 1, 1, -1, -1]) * h / 2
    corners = np.stack([x, y, z])
    return rot @ corners + center[:, None]


def get_2d_boxes(nusc, sample, cam_token):
    """Reproject every visible annotation's corners into one camera;
    returns (boxes xyxy, labels, centers, depths, ann tokens)."""
    from nuscenes.utils.geometry_utils import view_points
    from pyquaternion import Quaternion

    sd = nusc.get("sample_data", cam_token)
    cs = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
    pose = nusc.get("ego_pose", sd["ego_pose_token"])
    K = np.array(cs["camera_intrinsic"])
    w_img, h_img = sd["width"], sd["height"]

    boxes, labels, centers, depths, tokens = [], [], [], [], []
    for ann_token in sample["anns"]:
        ann = nusc.get("sample_annotation", ann_token)
        if ann["category_name"] not in NAME_MAP:
            continue
        box = nusc.get_box(ann_token)
        # global -> ego -> camera
        box.translate(-np.array(pose["translation"]))
        box.rotate(Quaternion(pose["rotation"]).inverse)
        box.translate(-np.array(cs["translation"]))
        box.rotate(Quaternion(cs["rotation"]).inverse)
        corners = box.corners()
        in_front = corners[2] > 0.1
        if not in_front.any():
            continue
        pts = view_points(corners[:, in_front], K, normalize=True)[:2].T
        hull = convex_hull(pts) if len(pts) >= 3 else None
        if hull is None:
            continue
        clipped = clip_polygon(hull, w_img, h_img)
        if clipped is None:
            continue
        x1, y1 = clipped.min(0)
        x2, y2 = clipped.max(0)
        center3d = box.center
        if center3d[2] <= 0.1:
            continue
        c2d = (K @ center3d) / center3d[2]
        boxes.append([x1, y1, x2, y2])
        labels.append(CLASSES.index(NAME_MAP[ann["category_name"]]))
        centers.append(c2d[:2])
        depths.append(center3d[2])
        tokens.append(ann_token)
    return (
        np.asarray(boxes, np.float32).reshape(-1, 4),
        np.asarray(labels, np.int64),
        np.asarray(centers, np.float32).reshape(-1, 2),
        np.asarray(depths, np.float32),
        tokens,
    )


def convert(data_root, version, out_dir, max_sweeps=10):
    from nuscenes import NuScenes
    from nuscenes.utils import splits
    from pyquaternion import Quaternion

    nusc = NuScenes(version=version, dataroot=data_root, verbose=True)
    if "trainval" in version:
        train_scenes = set(splits.train)
        val_scenes = set(splits.val)
    elif "mini" in version:
        train_scenes = set(splits.mini_train)
        val_scenes = set(splits.mini_val)
    else:
        train_scenes, val_scenes = set(), set()

    train_infos, val_infos, test_infos = [], [], []
    instance_id_map = {}

    for sample in nusc.sample:
        scene = nusc.get("scene", sample["scene_token"])["name"]
        lidar_sd = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
        cs = nusc.get(
            "calibrated_sensor", lidar_sd["calibrated_sensor_token"]
        )
        pose = nusc.get("ego_pose", lidar_sd["ego_pose_token"])

        info = dict(
            token=sample["token"],
            timestamp=sample["timestamp"],
            lidar_path=nusc.get_sample_data_path(
                sample["data"]["LIDAR_TOP"]
            ),
            sweeps=[],
            lidar2ego_translation=cs["translation"],
            lidar2ego_rotation=cs["rotation"],
            ego2global_translation=pose["translation"],
            ego2global_rotation=pose["rotation"],
            cams={},
        )
        # sweeps (prev lidar frames)
        sd = lidar_sd
        for _ in range(max_sweeps):
            if sd["prev"] == "":
                break
            sd = nusc.get("sample_data", sd["prev"])
            info["sweeps"].append(
                {"data_path": nusc.get_sample_data_path(sd["token"])}
            )

        for cam in CAM_TYPES:
            cam_sd = nusc.get("sample_data", sample["data"][cam])
            ccs = nusc.get(
                "calibrated_sensor", cam_sd["calibrated_sensor_token"]
            )
            # sensor -> lidar transform
            l2e_r = Quaternion(cs["rotation"]).rotation_matrix
            l2e_t = np.array(cs["translation"])
            c2e_r = Quaternion(ccs["rotation"]).rotation_matrix
            c2e_t = np.array(ccs["translation"])
            s2l_r = l2e_r.T @ c2e_r
            s2l_t = l2e_r.T @ (c2e_t - l2e_t)
            info["cams"][cam] = dict(
                data_path=nusc.get_sample_data_path(cam_sd["token"]),
                sensor2lidar_rotation=s2l_r,
                sensor2lidar_translation=s2l_t,
                cam_intrinsic=np.array(ccs["camera_intrinsic"]),
            )

        # 3D annotations in the lidar frame
        if version != "v1.0-test":

            boxes = nusc.get_boxes(sample["data"]["LIDAR_TOP"])
            l2g_r = (
                Quaternion(pose["rotation"]).rotation_matrix
                @ Quaternion(cs["rotation"]).rotation_matrix
            )
            l2g_t = (
                Quaternion(pose["rotation"]).rotation_matrix
                @ np.array(cs["translation"])
                + np.array(pose["translation"])
            )
            gt_boxes, names, vels, n_pts, valid, iids, ann_tokens = (
                [], [], [], [], [], [], []
            )
            for box, ann_token in zip(boxes, sample["anns"]):
                ann = nusc.get("sample_annotation", ann_token)
                # global -> lidar
                center = l2g_r.T @ (np.array(box.center) - l2g_t)
                yaw_g = box.orientation.yaw_pitch_roll[0]
                yaw = yaw_g - np.arctan2(l2g_r[1, 0], l2g_r[0, 0])
                vel_g = nusc.box_velocity(ann_token)[:2]
                vel = (l2g_r.T[:2, :2] @ np.nan_to_num(vel_g))
                gt_boxes.append(
                    np.concatenate(
                        [center, box.wlh[[0, 1, 2]], [yaw]]
                    )
                )
                names.append(
                    NAME_MAP.get(ann["category_name"], ann["category_name"])
                )
                vels.append(vel)
                n_pts.append(ann["num_lidar_pts"])
                valid.append(
                    ann["num_lidar_pts"] + ann["num_radar_pts"] > 0
                )
                inst = ann["instance_token"]
                iids.append(
                    instance_id_map.setdefault(inst, len(instance_id_map))
                )
                ann_tokens.append(ann_token)
            info.update(
                gt_boxes=np.asarray(gt_boxes, np.float64).reshape(-1, 7),
                gt_names=np.asarray(names),
                gt_velocity=np.asarray(vels, np.float64).reshape(-1, 2),
                num_lidar_pts=np.asarray(n_pts),
                valid_flag=np.asarray(valid, bool),
                instance_inds=np.asarray(iids, np.int64),
            )

            # per-camera 2D GT + 2D->3D map via ann tokens
            b2, l2, c2, d2, m2 = [], [], [], [], []
            tok_to_idx = {t: i for i, t in enumerate(ann_tokens)}
            for cam in CAM_TYPES:
                bb, ll, cc, dd, toks = get_2d_boxes(
                    nusc, sample, sample["data"][cam]
                )
                b2.append(bb)
                l2.append(ll)
                c2.append(cc)
                d2.append(dd)
                m2.append(
                    np.asarray(
                        [tok_to_idx.get(t, -1) for t in toks], np.int64
                    )
                )
            info.update(
                bboxes2d=b2, labels2d=l2, centers2d=c2, depths=d2,
                gt_2d_3d_map=m2,
            )

        if version == "v1.0-test":
            test_infos.append(info)
        elif scene in val_scenes:
            val_infos.append(info)
        else:
            train_infos.append(info)

    os.makedirs(out_dir, exist_ok=True)
    meta = {"version": version}
    for split, infos in (
        ("train", train_infos), ("val", val_infos), ("test", test_infos),
    ):
        if not infos:
            continue
        path = os.path.join(out_dir, f"simpb_nuscenes_infos_{split}.pkl")
        with open(path, "wb") as f:
            pickle.dump({"infos": infos, "metadata": meta}, f)
        print(f"wrote {path}: {len(infos)} samples")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--max-sweeps", type=int, default=10)
    args = p.parse_args()
    convert(args.data_root, args.version, args.out_dir, args.max_sweeps)
