#!/usr/bin/env python
"""Fold backbone Conv+BN for inference (reference tools/fuse_conv_bn.py).

Usage:
  python tools/fuse_conv_bn.py --checkpoint work_dirs/.../ckpt_1000 \
      --out work_dirs/.../ckpt_1000_fused
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True, help="orbax checkpoint dir")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import orbax.checkpoint as ocp

    from simpb_tpu.utils.fuse_bn import fuse_backbone_bn

    ckptr = ocp.PyTreeCheckpointer()
    loaded = ckptr.restore(os.path.abspath(args.checkpoint))
    params, stats = fuse_backbone_bn(
        loaded["params"], loaded["batch_stats"]
    )
    ckptr.save(
        os.path.abspath(args.out),
        {"params": params, "batch_stats": stats,
         "step": loaded.get("step", 0)},
        force=True,
    )
    print(f"fused checkpoint written to {args.out}")


if __name__ == "__main__":
    main()
