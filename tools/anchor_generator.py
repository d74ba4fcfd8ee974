#!/usr/bin/env python
"""K-means anchor generation.

Equivalent of reference tools/anchor_generator.py:8-46: k-means over GT
centers within 55 m -> [N, 11] anchor array (log-mean sizes, cos_yaw=1,
zero velocity), saved as .npy for the instance bank.

Usage:
  python tools/anchor_generator.py --ann-file infos_train.pkl \
      --output nuscenes_kmeans900.npy [--num-anchor 900]
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann-file", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--num-anchor", type=int, default=900)
    p.add_argument("--max-distance", type=float, default=55.0)
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args()

    with open(args.ann_file, "rb") as f:
        data = pickle.load(f)

    centers, sizes = [], []
    for info in data["infos"]:
        boxes = np.asarray(info["gt_boxes"])
        if len(boxes) == 0:
            continue
        mask = np.linalg.norm(boxes[:, :2], axis=-1) <= args.max_distance
        centers.append(boxes[mask, :3])
        sizes.append(boxes[mask, 3:6])
    centers = np.concatenate(centers)
    sizes = np.concatenate(sizes)

    from sklearn.cluster import KMeans

    km = KMeans(n_clusters=args.num_anchor, verbose=args.verbose).fit(
        centers
    )
    anchors = np.zeros((args.num_anchor, 11), np.float32)
    anchors[:, :3] = km.cluster_centers_
    anchors[:, 3:6] = np.log(sizes.mean(axis=0))
    anchors[:, 7] = 1.0  # COS_YAW
    np.save(args.output, anchors)
    print(f"saved {args.output}: {anchors.shape}")


if __name__ == "__main__":
    main()
