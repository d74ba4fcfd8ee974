"""Benchmark: 6-camera streaming inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: >= 50 six-camera frames/sec/chip on TPU v5e
(BASELINE.md; the reference publishes no fps number — its
tools/benchmark.py is a measurement harness, mirrored here by
tools/benchmark.py + simpb_tpu/utils/benchmark.py).

Default configuration: `simpb_r50_704x256_fast` — the flagship serving
config (windowed 2D cross-attn + evidence-backed gather capacities; the
semantics of each knob are documented in configs/base.py and PERF.md,
and bounded by tests/test_msda_patch*.py + tools/capacity_study.py).
`SIMPB_EXACT=1` benches the exact-sampling parity config instead.
"""
import dataclasses
import json
import os

from simpb_tpu.configs.base import (
    simpb_r50_704x256,
    simpb_r50_704x256_fast,
    simpb_r50_704x256_guarded,
)
from simpb_tpu.utils.benchmark import run_benchmark

BASELINE_FPS = 50.0


def main():
    if os.environ.get("SIMPB_GUARDED"):
        # exact semantics + evidence-backed caps + in-graph overflow
        # counters (checked exactness); the counters run in-graph and
        # are charged against the number (utils/benchmark.py)
        base = simpb_r50_704x256_guarded()
    elif os.environ.get("SIMPB_FAST_GUARDED"):
        from simpb_tpu.configs.base import simpb_r50_704x256_fast_guarded

        base = simpb_r50_704x256_fast_guarded()
    elif os.environ.get("SIMPB_HYBRID"):
        # value-exact serving path for exact-trained checkpoints
        # (windowed sampling + exact correction lane; configs/base.py)
        from simpb_tpu.configs.base import simpb_r50_704x256_hybrid

        base = simpb_r50_704x256_hybrid()
    elif os.environ.get("SIMPB_EXACT"):
        base = simpb_r50_704x256()
    else:
        base = simpb_r50_704x256_fast()
    cfg = dataclasses.replace(
        base, compute_dtype="bfloat16", head_dtype="bfloat16"
    )
    head = cfg.head
    if os.environ.get("SIMPB_MSDA_PATCH"):
        head = dataclasses.replace(head, msda_patch_mode=True)
    if os.environ.get("SIMPB_DFA_CAP"):
        head = dataclasses.replace(
            head, dfa_gather_capacity=int(os.environ["SIMPB_DFA_CAP"])
        )
    if os.environ.get("SIMPB_MSDA_CAP"):
        head = dataclasses.replace(
            head, msda_gather_capacity=int(os.environ["SIMPB_MSDA_CAP"])
        )
    if os.environ.get("SIMPB_CLAMP_CAP"):
        head = dataclasses.replace(
            head, msda_clamp_capacity=int(os.environ["SIMPB_CLAMP_CAP"])
        )
    cfg = dataclasses.replace(cfg, head=head)
    if os.environ.get("SIMPB_FUSED_TRUNK"):
        cfg = dataclasses.replace(
            cfg,
            backbone_fused_infer=os.environ["SIMPB_FUSED_TRUNK"] == "1",
        )

    # peak HBM alongside fps (reference tools/benchmark.py:100-113
    # reports both); from the compiled executable's XLA memory
    # analysis, null when the backend exposes no memory stats
    fps, stats = run_benchmark(
        cfg, window=128, batch_size=1, return_stats=True
    )
    peak = stats["peak_hbm_bytes"]
    print(
        json.dumps(
            {
                "metric": "6cam_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "peak_hbm_gib": (
                    round(peak / 2**30, 3) if peak is not None else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
