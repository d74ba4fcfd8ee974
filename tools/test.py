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


def enforce_guards(metrics) -> int:
    """Exit code for sampling-exactness guard violations (0 = ok).

    Guarded configs promise provable exactness (configs/base.py::
    simpb_r50_704x256_guarded): a nonzero `guard_*` maximum means a
    frame exceeded a static cap and its outputs deviated from the exact
    semantics — fail loudly (exit 3) instead of silently reporting
    metrics the contract says should not be trusted.
    """
    from simpb_tpu.utils.guards import check_guard_violations

    violated = check_guard_violations(metrics)
    if not violated:
        return 0
    print(
        "WARNING: sampling-exactness guard violated: "
        + ", ".join(f"{k}={float(metrics[k]):g}" for k in violated)
        + " — outputs deviated from exact semantics; raise the "
        "capacity caps or use the exact config",
        file=sys.stderr,
    )
    return 3


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--ann-file", required=True)
    p.add_argument("--data-root", default="")
    p.add_argument("--config", default="r50",
                   choices=["r50", "r50-fast", "r50-guarded",
                            "r50-fast-guarded", "r50-hybrid", "r101",
                            "r101-fast", "tiny"])
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
    p.add_argument("--cam-shards", type=int, default=1,
                   help="shard the CAMERA axis of the single stream "
                        "over this many local chips (must divide 6): "
                        "latency scaling for high-res configs (the "
                        "SURVEY §5 plan; no reference equivalent). "
                        "Overrides the per-device sequence sharding.")
    p.add_argument("--msda-patch", action="store_true",
                   help="approximate patch-mode 2D cross-attn sampling "
                        "(~1.4x faster, PERF.md lever #1)")
    p.add_argument("--fused-trunk", action="store_true",
                   help="fused Pallas bottleneck trunk (inference-only, "
                        "BN-folded numerics; ops/conv_fused.py)")
    p.add_argument("--draft-decode", action="store_true",
                   help="DCT-domain scaled JPEG decode (libjpeg n/8): "
                        "~2x cheaper host decode at nuScenes scales; "
                        "slightly different downscale filter chain, so "
                        "checkpoint-parity evals leave it off")
    p.add_argument("--head-bf16", action="store_true",
                   help="run the decoder head in bfloat16 like bench.py "
                        "(~1.2x end-to-end; default keeps the head fp32, "
                        "matching the reference's fp32-head policy for "
                        "checkpoint-parity evals)")
    p.add_argument("--gather-dir", default=None,
                   help="shared dir for the multi-process disk-gather "
                        "eval (reference custom_multi_gpu_test tmpdir, "
                        "apis/test.py:122-167); required when "
                        "jax.process_count() > 1")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize before device "
                        "use (the reference's dist launcher equivalent)")
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    if args.multihost:
        from simpb_tpu.parallel.mesh import initialize_multihost

        initialize_multihost(
            args.coordinator, args.num_processes, args.process_id
        )
    from simpb_tpu.configs.base import (
        simpb_r101_1408x512,
        simpb_r50_704x256,
        simpb_r50_704x256_fast,
        simpb_r50_704x256_guarded,
        simpb_r50_704x256_fast_guarded,
        simpb_r50_704x256_hybrid,
        simpb_r101_1408x512_fast,
        simpb_tiny,
    )
    from simpb_tpu.data.dataset import NuScenesDataset
    from simpb_tpu.data.postprocess import format_nuscenes_submission
    from simpb_tpu.models.detector import SimPB
    from simpb_tpu.training.evaluate import streaming_eval

    cfg = {"r50": simpb_r50_704x256, "r50-fast": simpb_r50_704x256_fast,
           "r50-guarded": simpb_r50_704x256_guarded,
           "r50-fast-guarded": simpb_r50_704x256_fast_guarded,
           "r50-hybrid": simpb_r50_704x256_hybrid,
           "r101": simpb_r101_1408x512,
           "r101-fast": simpb_r101_1408x512_fast,
           "tiny": simpb_tiny}[args.config]()
    cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    if args.head_bf16:
        cfg = dataclasses.replace(cfg, head_dtype="bfloat16")
    if args.msda_patch:
        cfg = dataclasses.replace(
            cfg, head=dataclasses.replace(cfg.head, msda_patch_mode=True)
        )
    if args.fused_trunk:
        cfg = dataclasses.replace(cfg, backbone_fused_infer=True)
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
        draft_decode=args.draft_decode,
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

    if args.cam_shards < 1:
        raise SystemExit(f"--cam-shards must be >= 1, got {args.cam_shards}")
    if jax.process_count() > 1:
        from simpb_tpu.training.evaluate import distributed_streaming_eval

        if args.cam_shards > 1:
            raise SystemExit(
                "--cam-shards applies to single-process eval only; a "
                "multi-process launch already assigns one sequence "
                "shard per process (drop --cam-shards or run one "
                "process)"
            )
        if not args.gather_dir:
            raise SystemExit(
                "--gather-dir (a shared filesystem path) is required "
                "for multi-process eval"
            )
        result = distributed_streaming_eval(
            model,
            cfg,
            variables,
            dataset,
            args.gather_dir,
            max_frames=args.max_frames,
            progress=True,
            tracking=args.tracking,
        )
        if result is None:
            return  # non-zero rank: shard written, rank 0 reports
        metrics, preds, tokens = result
    elif args.cam_shards > 1:
        # camera-axis sharding: ONE stream, its six cameras split over
        # local chips — per-frame latency scaling (cold-frame outputs
        # equal to the unsharded stream within cross-camera reduction-
        # order noise; see training/evaluate.py::streaming_eval)
        metrics, preds, tokens = streaming_eval(
            model,
            cfg,
            variables,
            dataset,
            max_frames=args.max_frames,
            show_dir=args.show_dir,
            show_threshold=args.show_threshold,
            progress=True,
            tracking=args.tracking,
            cam_shards=args.cam_shards,
        )
    elif jax.local_device_count() > 1 and not args.show_dir:
        # single process, several chips: stream one sequence shard per
        # device over a 1-D data mesh (JAX-native replacement for the
        # reference's 8-process dist_test.sh; ~1/N wall time)
        from simpb_tpu.training.evaluate import multidevice_streaming_eval

        metrics, preds, tokens = multidevice_streaming_eval(
            model,
            cfg,
            variables,
            dataset,
            max_frames=args.max_frames,
            progress=True,
            tracking=args.tracking,
        )
    else:
        metrics, preds, tokens = streaming_eval(
            model,
            cfg,
            variables,
            dataset,
            max_frames=args.max_frames,
            show_dir=args.show_dir,
            show_threshold=args.show_threshold,
            progress=True,
            tracking=args.tracking,
        )
    # NaN marks classes absent from the eval split; emit null so the
    # output stays strict JSON
    print(json.dumps(
        {k: (None if math.isnan(v) else round(v, 4))
         for k, v in metrics.items()},
        indent=1,
    ))

    rc = enforce_guards(metrics)
    if rc:
        sys.exit(rc)

    if args.out:
        sub = format_nuscenes_submission(
            [
                {
                    "boxes_3d": p["boxes"],
                    "scores_3d": p["scores"],
                    "labels_3d": p["labels"],
                    **(
                        {"instance_ids": p["track_ids"]}
                        if "track_ids" in p
                        else {}
                    ),
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
