"""Component bisection of the flagship bench via op stubbing.

Re-runs `run_benchmark` with hot ops monkeypatched to cheap zero
producers, so each stub's fps delta isolates that component's cost
(timing-bisection is the reliable method through the axon tunnel —
CLAUDE.md; jax.profiler traces can hang).

Usage: python tools/bisect_bench.py [--config r50-fast] [--frames 128]
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="r50-fast",
                   choices=["r50", "r50-fast", "r101", "r101-fast"])
    p.add_argument("--frames", type=int, default=128)
    p.add_argument("--stubs", nargs="*", default=None,
                   help="subset of stubs to run (default: all)")
    return p.parse_args()


def main():
    args = parse_args()
    import jax.numpy as jnp

    from simpb_tpu.configs.base import (
        simpb_r50_704x256,
        simpb_r50_704x256_fast,
        simpb_r101_1408x512,
        simpb_r101_1408x512_fast,
    )
    from simpb_tpu.utils.benchmark import run_benchmark
    from simpb_tpu import ops
    from simpb_tpu.ops import sampling as S
    from simpb_tpu.models import group_attn, dfa as dfa_mod

    cfg = {
        "r50": simpb_r50_704x256,
        "r50-fast": simpb_r50_704x256_fast,
        "r101": simpb_r101_1408x512,
        "r101-fast": simpb_r101_1408x512_fast,
    }[args.config]()
    cfg = dataclasses.replace(
        cfg, compute_dtype="bfloat16", head_dtype="bfloat16"
    )

    orig = {
        "msda": S.msda,
        "msda_patch": S.msda_patch,
        "dfa": S.deformable_aggregation,
    }

    def zero_msda(value, spatial_shapes, loc, w, **kw):
        b, q = loc.shape[0], loc.shape[1]
        return jnp.zeros((b, q, value.shape[-1]), jnp.float32)

    def zero_msda_patch(value, spatial_shapes, loc, w, sel_levels=None,
                        pair_table=None, raw_heads=False, **kw):
        b, q, h = loc.shape[0], loc.shape[1], loc.shape[2]
        if raw_heads:
            return (
                jnp.zeros((b, q, h, value.shape[-1]), jnp.float32),
                jnp.ones((b, q, h), jnp.float32),
            )
        return jnp.zeros((b, q, value.shape[-1]), jnp.float32)

    def zero_dfa(feats, spatial_shapes, pts, w, **kw):
        b, a = pts.shape[0], pts.shape[1]
        return jnp.zeros((b, a, feats.shape[-1]), jnp.float32)

    def apply_stub(names):
        # patch every import site (modules bind the symbols at import)
        S.msda = orig["msda"]
        S.msda_patch = orig["msda_patch"]
        S.deformable_aggregation = orig["dfa"]
        group_attn.msda = orig["msda"]
        group_attn.msda_patch = orig["msda_patch"]
        dfa_mod.deformable_aggregation = orig["dfa"]
        if "msda" in names:
            S.msda = zero_msda
            S.msda_patch = zero_msda_patch
            group_attn.msda = zero_msda
            group_attn.msda_patch = zero_msda_patch
        if "dfa" in names:
            S.deformable_aggregation = zero_dfa
            dfa_mod.deformable_aggregation = zero_dfa

    runs = [
        ("full", []),
        ("no_msda", ["msda"]),
        ("no_dfa", ["dfa"]),
        ("no_msda_dfa", ["msda", "dfa"]),
    ]
    if args.stubs is not None:
        runs = [r for r in runs if r[0] in ("full", *args.stubs)]

    results = {}
    for name, stubs in runs:
        apply_stub(stubs)
        fps = run_benchmark(cfg, window=args.frames, batch_size=1)
        results[name] = fps
        ms = 1000.0 / fps
        print(f"{name:14s} {fps:6.2f} fps  {ms:6.2f} ms/frame", flush=True)
    apply_stub([])

    if "full" in results:
        base_ms = 1000.0 / results["full"]
        for name, fps in results.items():
            if name == "full":
                continue
            print(
                f"{name:14s} component cost ~ "
                f"{base_ms - 1000.0 / fps:5.2f} ms/frame"
            )


if __name__ == "__main__":
    main()
