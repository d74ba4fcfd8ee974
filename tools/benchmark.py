#!/usr/bin/env python
"""Inference throughput benchmark CLI (reference tools/benchmark.py
parity — the reference measures fps + peak CUDA memory over repeated
single-sample forwards, tools/benchmark.py:100-113; here the streaming
window runs on-device, see simpb_tpu/utils/benchmark.py).

Usage:
  python tools/benchmark.py [--config r50|r50-fast|r101|tiny]
      [--exact | --patch] [--dfa-cap N] [--msda-cap N]
      [--batch-size N] [--frames N] [--fp32]
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="r50-fast",
                   choices=["r50", "r50-fast", "r50-guarded",
                            "r50-fast-guarded", "r50-hybrid", "r101",
                            "r101-fast", "tiny"])
    p.add_argument("--clamp-cap", type=int, default=None,
                   help="override msda_clamp_capacity (the hybrid "
                        "exact-correction-lane capacity; measured "
                        "sweep in PERF.md: 128 -> 48.7 fps, 256 -> "
                        "47.4, 832 = full correction -> 32.6)")
    p.add_argument("--exact", action="store_true",
                   help="force exact MSDA sampling (windowed off)")
    p.add_argument("--patch", action="store_true",
                   help="force windowed (patch-mode) MSDA sampling")
    p.add_argument("--dfa-cap", type=int, default=None,
                   help="override dfa_gather_capacity (0 = uncapped)")
    p.add_argument("--msda-sel", type=int, default=None,
                   help="override msda_sel_levels (0 = all levels)")
    p.add_argument("--msda-cap", type=int, default=None,
                   help="override msda_gather_capacity (0 = uncapped)")
    p.add_argument("--msda-window", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="override msda_patch_hw (windowed-MSDA window)")
    p.add_argument("--batch-size", type=int, default=1,
                   help="concurrent temporal streams per chip")
    p.add_argument("--frames", type=int, default=64,
                   help="frames per stream in the timed window")
    p.add_argument("--fp32", action="store_true",
                   help="disable the bf16 trunk/head (default bf16)")
    p.add_argument("--guard", action="store_true",
                   help="force guard_sampling on (in-graph exactness "
                        "counters, charged against the number)")
    p.add_argument("--no-remat", action="store_true",
                   help="backbone_remat=False (serving A/B: remat is a "
                        "training memory lever; at inference it should "
                        "be free, measure to confirm)")
    p.add_argument("--stem-s2d", action="store_true",
                   help="space-to-depth stem (measured off at 704x256; "
                        "PERF.md flags it as possibly relevant at "
                        "1408x512)")
    return p.parse_args()


def main():
    args = parse_args()
    from simpb_tpu.configs.base import (
        simpb_r50_704x256,
        simpb_r50_704x256_fast,
        simpb_r50_704x256_guarded,
        simpb_r50_704x256_fast_guarded,
        simpb_r50_704x256_hybrid,
        simpb_r101_1408x512,
        simpb_r101_1408x512_fast,
        simpb_tiny,
    )
    from simpb_tpu.utils.benchmark import run_benchmark

    cfg = {
        "r50": simpb_r50_704x256,
        "r50-fast": simpb_r50_704x256_fast,
        "r50-guarded": simpb_r50_704x256_guarded,
        "r50-fast-guarded": simpb_r50_704x256_fast_guarded,
        "r50-hybrid": simpb_r50_704x256_hybrid,
        "r101": simpb_r101_1408x512,
        "r101-fast": simpb_r101_1408x512_fast,
        "tiny": simpb_tiny,
    }[args.config]()
    if args.no_remat:
        cfg = dataclasses.replace(cfg, backbone_remat=False)
    if args.stem_s2d:
        cfg = dataclasses.replace(cfg, stem_s2d=True)
    if not args.fp32:
        cfg = dataclasses.replace(
            cfg, compute_dtype="bfloat16", head_dtype="bfloat16"
        )
    head = cfg.head
    if args.exact:
        head = dataclasses.replace(head, msda_patch_mode=False)
    if args.patch:
        head = dataclasses.replace(head, msda_patch_mode=True)
    if args.dfa_cap is not None:
        head = dataclasses.replace(
            head, dfa_gather_capacity=args.dfa_cap or None
        )
    if args.msda_cap is not None:
        head = dataclasses.replace(
            head, msda_gather_capacity=args.msda_cap or None
        )
    if args.msda_sel is not None:
        head = dataclasses.replace(head, msda_sel_levels=args.msda_sel)
    if args.msda_window is not None:
        head = dataclasses.replace(
            head, msda_patch_hw=tuple(args.msda_window)
        )
    if args.clamp_cap is not None:
        head = dataclasses.replace(
            head, msda_clamp_capacity=args.clamp_cap
        )
    if args.guard:
        head = dataclasses.replace(head, guard_sampling=True)
    cfg = dataclasses.replace(cfg, head=head)

    fps, stats = run_benchmark(
        cfg, window=args.frames, batch_size=args.batch_size,
        return_stats=True,
    )
    peak = stats["peak_hbm_bytes"]
    print(
        json.dumps(
            {
                "config": args.config,
                "msda_patch_mode": cfg.head.msda_patch_mode,
                "msda_hybrid_mode": cfg.head.msda_hybrid_mode,
                "msda_clamp_capacity": cfg.head.msda_clamp_capacity,
                "dfa_gather_capacity": cfg.head.dfa_gather_capacity,
                "msda_gather_capacity": cfg.head.msda_gather_capacity,
                "msda_sel_levels": cfg.head.msda_sel_levels,
                "msda_patch_hw": list(cfg.head.msda_patch_hw),
                "batch_size": args.batch_size,
                "six_cam_fps_per_chip": round(fps, 2),
                "peak_hbm_gib": (
                    round(peak / 2**30, 3) if peak is not None else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
