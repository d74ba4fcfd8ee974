#!/usr/bin/env python
"""Evaluation CLI: streaming inference over the val set + nuScenes metrics.

Equivalent of the reference `tools/test.py` + `custom_multi_gpu_test`
(reference tools/test.py:127-317, apis/test.py:49-171): shards the val
set at sequence boundaries (each shard streams whole scenes so the
instance bank carries state), runs the jitted streaming step per frame,
decodes fixed-shape detections, and computes mAP/NDS with the native
metric implementation (simpb_tpu/data/nuscenes_eval.py).

Usage:
  python tools/test.py --ann-file data/nuscenes/simpb_nuscenes_infos_val.pkl \
      --checkpoint work_dirs/simpb_r50/ckpt_1000 [--out results.json]
"""
import argparse
import dataclasses
import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# the axon sitecustomize pre-registers the TPU backend regardless of the
# JAX_PLATFORMS env var; honour the env explicitly
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--ann-file", required=True)
    p.add_argument("--data-root", default="")
    p.add_argument("--config", default="r50",
                   choices=["r50", "r101", "tiny"])
    p.add_argument("--src-h", type=int, default=900)
    p.add_argument("--src-w", type=int, default=1600)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--torch-checkpoint", default=None)
    p.add_argument("--out", default=None, help="submission json path")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--tracking", action="store_true")
    p.add_argument("--show-dir", default=None,
                   help="render detections on images + BEV (reference"
                        " --show_only) and write a video here")
    p.add_argument("--show-threshold", type=float, default=0.3)
    p.add_argument("--msda-patch", action="store_true",
                   help="approximate patch-mode 2D cross-attn sampling "
                        "(~1.4x faster, PERF.md lever #1)")
    return p.parse_args()


def main():
    args = parse_args()
    from simpb_tpu.configs.base import (
        simpb_r101_1408x512,
        simpb_r50_704x256,
        simpb_tiny,
    )
    from simpb_tpu.data.dataset import NuScenesDataset
    from simpb_tpu.data.nuscenes_eval import evaluate_detections
    from simpb_tpu.data.postprocess import (
        boxes_lidar_to_global,
        format_nuscenes_submission,
    )
    from simpb_tpu.data.sampler import sequence_eval_shards
    from simpb_tpu.models.decoder3d import decode_boxes3d
    from simpb_tpu.models.detector import SimPB
    

    cfg = {"r50": simpb_r50_704x256, "r101": simpb_r101_1408x512,
           "tiny": simpb_tiny}[args.config]()
    cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    if args.msda_patch:
        cfg = dataclasses.replace(
            cfg, head=dataclasses.replace(cfg.head, msda_patch_mode=True)
        )
    fw, fh = cfg.input_size
    aug_conf = {
        "resize_lim": (0.40, 0.47),
        "final_dim": (fh, fw),
        "bot_pct_lim": (0.0, 0.0),
        "rot_lim": (0, 0),
        "H": args.src_h,
        "W": args.src_w,
        "rand_flip": False,
        "rot3d_range": [0, 0],
    }
    dataset = NuScenesDataset(
        args.ann_file, data_root=args.data_root, test_mode=True,
        data_aug_conf=aug_conf, sequences_split_num=1,
    )

    model = SimPB(cfg)
    img0 = jnp.zeros((1, 6, fh, fw, 3), jnp.float32)
    proj0 = jnp.tile(jnp.eye(4)[None, None], (1, 6, 1, 1))
    variables = jax.jit(
        lambda: model.init(
            {
                "params": jax.random.PRNGKey(0),
                "aug": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2),
                "sampling": jax.random.PRNGKey(3),
            },
            img0, proj0, train=False,
        )
    )()
    variables = jax.tree.map(np.asarray, variables)
    if args.torch_checkpoint:
        from simpb_tpu.utils.torch_convert import (
            load_torch_checkpoint, merge_params,
        )

        p, s = load_torch_checkpoint(args.torch_checkpoint, cfg)
        variables["params"] = merge_params(variables["params"], p)
        variables["batch_stats"] = merge_params(
            variables.get("batch_stats", {}), s
        )
    elif args.checkpoint:
        import orbax.checkpoint as ocp

        loaded = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(args.checkpoint)
        )
        variables["params"] = loaded["params"]
        variables["batch_stats"] = loaded["batch_stats"]

    @jax.jit
    def cold_step(variables, img, proj):
        out = model.apply(variables, img, proj, train=False)
        return _select(out)

    @jax.jit
    def stream_step(variables, img, proj, state, dt, t2c):
        out = model.apply(
            variables, img, proj, temporal=state, time_interval=dt,
            temp2cur=t2c, train=False,
        )
        return _select(out)

    def _select(out):
        dec = decode_boxes3d(
            out["classification"][-1],
            out["prediction"][-1],
            instance_id=out.get("instance_id"),
            quality=out["quality"][-1],
            num_output=cfg.head.num_output,
            score_threshold=cfg.head.score_threshold,
        )
        return dec, out["temporal_state"]

    shard = sequence_eval_shards(dataset, 1)[0]
    if args.max_frames:
        shard = shard[: args.max_frames]

    preds, gts, tokens = [], [], []
    vis_frames = []
    state = None
    prev_ts = None
    prev_t_global = None
    for n, idx in enumerate(shard):
        sample = dataset.get_sample(idx, with_points=False)
        img = jnp.asarray(sample["img"][None])
        proj = jnp.asarray(sample["projection_mat"][None])
        ts = sample["timestamp"]
        t_global = sample["lidar2global"]
        if state is None:
            dec, state = cold_step(variables, img, proj)
        else:
            dt = jnp.asarray([ts - prev_ts], jnp.float32)
            t2c = jnp.asarray(
                (np.linalg.inv(t_global) @ prev_t_global)[None], jnp.float32
            )
            dec, state = stream_step(variables, img, proj, state, dt, t2c)
        prev_ts, prev_t_global = ts, t_global

        dec = {k: np.asarray(v)[0] for k, v in dec.items()}
        boxes_g = boxes_lidar_to_global(dec["boxes_3d"], t_global)
        valid = dec["valid"]
        preds.append(
            {
                "boxes": boxes_g[valid],
                "scores": dec["scores_3d"][valid],
                "labels": dec["labels_3d"][valid],
            }
        )
        info = dataset.data_infos[idx]
        tokens.append(info["token"])
        gt = dataset.get_annotations(idx)
        gboxes = gt.get("gt_bboxes_3d", np.zeros((0, 9), np.float32))
        if len(gboxes):
            g10 = np.zeros((len(gboxes), 10), np.float32)
            g10[:, : gboxes.shape[1]] = gboxes
            g10 = boxes_lidar_to_global(g10, t_global)
        else:
            g10 = np.zeros((0, 10), np.float32)
        gts.append({"boxes": g10, "labels": gt["gt_labels_3d"]})

        if args.show_dir:
            from simpb_tpu.data.transforms import IMG_MEAN, IMG_STD
            from simpb_tpu.data.visualize import render_frame, write_video

            raw = sample["img"] * IMG_STD + IMG_MEAN
            frame = render_frame(
                list(raw),
                {
                    "boxes_3d": dec["boxes_3d"],
                    "scores_3d": dec["scores_3d"],
                    "labels_3d": dec["labels_3d"],
                },
                list(sample["projection_mat"]),
                score_threshold=args.show_threshold,
            )
            vis_frames.append(frame[..., ::-1])  # RGB -> BGR for cv2

        if (n + 1) % 100 == 0:
            print(f"{n + 1}/{len(shard)} frames", flush=True)

    if args.show_dir and vis_frames:
        from simpb_tpu.data.visualize import write_video

        os.makedirs(args.show_dir, exist_ok=True)
        write_video(
            vis_frames, os.path.join(args.show_dir, "detections.mp4")
        )
        print(f"wrote {len(vis_frames)}-frame video to {args.show_dir}")

    metrics = evaluate_detections(preds, gts)
    # NaN marks classes absent from the eval split; emit null so the
    # output stays strict JSON
    print(json.dumps(
        {k: (None if math.isnan(v) else round(v, 4))
         for k, v in metrics.items()},
        indent=1,
    ))

    if args.out:
        sub = format_nuscenes_submission(
            [
                {
                    "boxes_3d": p["boxes"],
                    "scores_3d": p["scores"],
                    "labels_3d": p["labels"],
                }
                for p in preds
            ],
            tokens,
            tracking=args.tracking,
        )
        with open(args.out, "w") as f:
            json.dump(sub, f)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
