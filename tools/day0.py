#!/usr/bin/env python
"""Day-0 converted-checkpoint serving decision — executable recipe.

VERDICT.md round-4 item 7: docs/serving.md's decision recipe (convert
-> measure demand -> pick hybrid/guarded/fine-tune -> serve) was prose;
this makes it ONE command. Given a released torch checkpoint and a val
pkl (reference tools/test.py:236-271 load-checkpoint flow):

  1. **convert** the `.pth` through `torch_to_flax` (exact key/
     transpose inversion, tested bitwise in tests/test_cli_day0.py);
  2. **measure** a short guarded streaming pass under the hybrid
     config with a generous correction-lane capacity: the surfaced
     `guard_msda_clamp_demand` maximum is the per-camera count of
     (query, level) entries whose learned offsets leave the 8x8
     window — the ONE number the serving choice turns on
     (tools/production_demand_study.py measured its distribution on a
     converged exact-trained checkpoint at production geometry);
  3. **decide** (PERF.md cap sweep: hybrid cap 128 -> 48.7 fps,
     256 -> 47.4, 832 full-correction -> 32.6 vs guarded-exact 38.8):
       demand + margin <= --hybrid-max-capacity  -> `r50-hybrid` at a
         right-sized capacity (value-exact, counters certify);
       else -> `r50-guarded` (exact ops, provable exactness, ~39 fps);
       --finetune additionally runs the measured full-speed path:
         a short fast-semantics fine-tune (250 steps recovers the
         window deviation — studies/finetune_recovery.json +
         studies/production_demand.json held-out curve) and emits the
         `r50-fast-guarded` serving command for the tuned checkpoint;
  4. **emit** `day0_decision.json` (demand evidence + chosen config +
     capacity + the exact serving command) and optionally a
     confirmation eval under the chosen config.

Usage:
  python tools/day0.py --ann-file val.pkl --torch-checkpoint simpb_r50.pth \
      [--config r50] [--demand-frames 50] [--out-dir work_dirs/day0] \
      [--finetune --train-ann-file train.pkl]
"""
import argparse
import dataclasses
import json
import math
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--ann-file", required=True, help="val pkl")
    p.add_argument("--torch-checkpoint", required=True)
    p.add_argument("--data-root", default="")
    p.add_argument("--config", default="r50",
                   choices=["r50", "r101", "tiny"],
                   help="model family; the decision picks the serving "
                        "variant (hybrid/guarded/fast) within it")
    p.add_argument("--src-h", type=int, default=900)
    p.add_argument("--src-w", type=int, default=1600)
    p.add_argument("--out-dir", default="work_dirs/day0")
    p.add_argument("--demand-frames", type=int, default=50,
                   help="frames in the demand-measurement pass")
    p.add_argument("--measure-capacity", type=int, default=None,
                   help="correction-lane capacity during measurement "
                        "(default: every (slot, level) entry, so the "
                        "demand stat has zero overflow)")
    p.add_argument("--hybrid-max-capacity", type=int, default=512,
                   help="largest right-sized capacity still served as "
                        "hybrid; above it the correction lane's cost "
                        "approaches full exact resampling and "
                        "guarded-exact wins (PERF.md cap sweep: 832 "
                        "benches 32.6 fps < guarded 38.8)")
    p.add_argument("--capacity-margin", type=float, default=1.25,
                   help="headroom multiplier on the measured demand "
                        "max before rounding up to a multiple of 32")
    p.add_argument("--confirm-frames", type=int, default=0,
                   help="also run a confirmation eval of this many "
                        "frames under the CHOSEN config (metrics + "
                        "guard certificate)")
    p.add_argument("--finetune", action="store_true",
                   help="run the full-speed path: short fast-semantics "
                        "fine-tune (tools/train.py --load-from) and "
                        "emit the fast-guarded serving command")
    p.add_argument("--train-ann-file", default=None,
                   help="train pkl for --finetune")
    p.add_argument("--finetune-steps", type=int, default=250)
    return p.parse_args()


def main():
    args = parse_args()
    from simpb_tpu.configs.base import (
        simpb_r101_1408x512,
        simpb_r50_704x256,
        simpb_r50_704x256_hybrid,
        simpb_tiny,
    )
    from simpb_tpu.data.dataset import NuScenesDataset
    from simpb_tpu.models.detector import SimPB
    from simpb_tpu.training.evaluate import streaming_eval
    from simpb_tpu.utils.torch_convert import (
        load_torch_checkpoint, merge_params,
    )

    base_by_family = {
        "r50": simpb_r50_704x256,
        "r101": simpb_r101_1408x512,
        "tiny": simpb_tiny,
    }
    base = base_by_family[args.config]()
    total_entries = base.head.allocation_capacity * base.head.num_levels
    measure_cap = args.measure_capacity or total_entries

    # measurement config: hybrid semantics (value-exact), guards on,
    # capacity covering every entry -> `guard_msda_clamp_demand` is the
    # true demand with zero overflow. DFA caps at the guarded maxima.
    hybrid = simpb_r50_704x256_hybrid()
    head = dataclasses.replace(
        base.head,
        msda_gather_capacity=hybrid.head.msda_gather_capacity,
        msda_hybrid_mode=True,
        msda_clamp_capacity=measure_cap,
        dfa_gather_capacity=hybrid.head.dfa_gather_capacity,
        guard_sampling=True,
    )
    cfg = dataclasses.replace(
        base, head=head, compute_dtype="bfloat16"
    )

    fw, fh = cfg.input_size
    aug_conf = {
        "resize_lim": (0.40, 0.47), "final_dim": (fh, fw),
        "bot_pct_lim": (0.0, 0.0), "rot_lim": (0, 0),
        "H": args.src_h, "W": args.src_w,
        "rand_flip": False, "rot3d_range": [0, 0],
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
            {"params": jax.random.PRNGKey(0),
             "aug": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2),
             "sampling": jax.random.PRNGKey(3)},
            img0, proj0, train=False,
        )
    )()
    variables = jax.tree.map(np.asarray, variables)
    p_, s_ = load_torch_checkpoint(args.torch_checkpoint, cfg)
    variables["params"] = merge_params(variables["params"], p_)
    variables["batch_stats"] = merge_params(
        variables.get("batch_stats", {}), s_
    )
    print(f"[day0] converted {args.torch_checkpoint}", flush=True)

    # ---- demand measurement pass ----
    metrics, _, _ = streaming_eval(
        model, cfg, variables, dataset,
        max_frames=args.demand_frames, progress=True,
    )
    demand = metrics.get("guard_msda_clamp_demand", float("nan"))
    overflow = metrics.get("guard_msda_clamp_overflow", float("nan"))
    dfa_overflow = metrics.get("guard_dfa_overflow", float("nan"))
    print(
        f"[day0] demand pass ({args.demand_frames} frames): "
        f"msda_clamp_demand max {demand:.0f} / {total_entries} "
        f"entries per camera; clamp_overflow {overflow:.0f}; "
        f"dfa_overflow {dfa_overflow:.0f}", flush=True,
    )

    # ---- decision ----
    if math.isnan(demand):
        raise SystemExit("demand counter missing from the eval metrics")
    sized = int(min(
        total_entries,
        32 * math.ceil(demand * args.capacity_margin / 32) or 32,
    ))
    if not math.isnan(overflow) and overflow > 0:
        # measurement capacity was itself exceeded (only possible with
        # an explicit small --measure-capacity): demand is a lower
        # bound; fall through to guarded
        sized = total_entries + 1
    if sized <= args.hybrid_max_capacity:
        chosen = f"{args.config}-hybrid"
        capacity = sized
        serve_cmd = (
            f"python tools/test.py --config {chosen} "
            f"--torch-checkpoint {args.torch_checkpoint} "
            f"--ann-file {args.ann_file}"
        )
        rationale = (
            f"demand max {demand:.0f} x margin {args.capacity_margin} "
            f"rounds to capacity {capacity} <= "
            f"{args.hybrid_max_capacity}: the correction lane is "
            "cheap here — value-exact serving at near-fast speed "
            "(PERF.md hybrid cap sweep)"
        )
    else:
        chosen = f"{args.config}-guarded"
        capacity = None
        serve_cmd = (
            f"python tools/test.py --config {chosen} "
            f"--torch-checkpoint {args.torch_checkpoint} "
            f"--ann-file {args.ann_file}"
        )
        rationale = (
            f"demand max {demand:.0f} needs capacity {sized} > "
            f"{args.hybrid_max_capacity}: the correction lane would "
            "approach full exact resampling (832-cap benches below "
            "guarded-exact, PERF.md) — serve the provably exact "
            "guarded config"
        )
    print(f"[day0] decision: {chosen} — {rationale}", flush=True)

    decision = {
        "torch_checkpoint": args.torch_checkpoint,
        "demand_frames": args.demand_frames,
        "guard_msda_clamp_demand_max": demand,
        "guard_msda_clamp_overflow": overflow,
        "guard_dfa_overflow": dfa_overflow,
        "total_entries_per_camera": total_entries,
        "chosen_config": chosen,
        "msda_clamp_capacity": capacity,
        "rationale": rationale,
        "serve_command": serve_cmd,
        "measurement_metrics": {
            k: (None if isinstance(v, float) and math.isnan(v)
                else round(float(v), 4))
            for k, v in metrics.items()
        },
    }

    # ---- optional full-speed path: brief fast-semantics fine-tune ----
    if args.finetune:
        if not args.train_ann_file:
            raise SystemExit("--finetune requires --train-ann-file")
        ft_dir = os.path.join(args.out_dir, "finetune")
        cmd = [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "train.py"),
            "--ann-file", args.train_ann_file,
            "--data-root", args.data_root,
            "--config",
            "tiny" if args.config == "tiny" else f"{args.config}-fast",
            "--load-from", args.torch_checkpoint,
            "--max-iters", str(args.finetune_steps),
            "--ckpt-interval", str(args.finetune_steps),
            "--work-dir", ft_dir,
            "--src-h", str(args.src_h), "--src-w", str(args.src_w),
        ]
        print(f"[day0] fine-tune: {' '.join(cmd)}", flush=True)
        subprocess.run(cmd, check=True)
        tuned = os.path.join(ft_dir, f"ckpt_{args.finetune_steps}")
        decision["finetuned_checkpoint"] = tuned
        decision["finetuned_serve_command"] = (
            f"python tools/test.py --config {args.config}-fast-guarded "
            f"--checkpoint {tuned} --ann-file {args.ann_file}"
        )
        print(
            f"[day0] fine-tuned checkpoint: {tuned} — serve with "
            f"{decision['finetuned_serve_command']}", flush=True,
        )

    # ---- optional confirmation eval under the chosen config ----
    if args.confirm_frames:
        head_c = dataclasses.replace(
            head,
            msda_hybrid_mode=chosen.endswith("hybrid"),
            msda_clamp_capacity=capacity or measure_cap,
        )
        cfg_c = dataclasses.replace(cfg, head=head_c)
        model_c = SimPB(cfg_c)
        confirm, _, _ = streaming_eval(
            model_c, cfg_c, variables, dataset,
            max_frames=args.confirm_frames, progress=True,
        )
        decision["confirmation_metrics"] = {
            k: (None if isinstance(v, float) and math.isnan(v)
                else round(float(v), 4))
            for k, v in confirm.items()
        }

    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, "day0_decision.json")
    with open(out, "w") as f:
        json.dump(decision, f, indent=1)
        f.write("\n")
    print(json.dumps(
        {k: v for k, v in decision.items()
         if k != "measurement_metrics"}, indent=1,
    ))
    print(f"[day0] wrote {out}")


if __name__ == "__main__":
    main()
