"""Converted-checkpoint serving: fine-tune recovery + hybrid-path eval.

VERDICT.md round-3 item 3: the converged cross-semantics study
(`studies/cross_semantics_8k_lr2e4.json`) showed an EXACT-trained
checkpoint loses 0.094 mAP when served under the fast window — so the
76 fps tier was off-limits for converted reference checkpoints. This
study measures the two recovery paths on the SAME trained checkpoint
(`studies/ckpt_xsem_lr2e4/arm_exact.pkl`, medium capacity, painted
scenes):

  1. **Hybrid serving (no retraining)** — evaluate the exact-trained
     weights under `msda_hybrid` (windowed sampling + exact correction
     lane, ops/sampling.py): expected ≈ exact accuracy, and the sown
     `guard_msda_clamp_demand` measures how many (query, level)
     entries per camera actually need the correction lane (the
     capacity evidence for `simpb_r50_704x256_hybrid`).
  2. **Short fast-semantics fine-tune** — continue training the exact
     checkpoint under the fast config for small budgets and report the
     eval-under-fast recovery curve (does a brief fine-tune make the
     full-speed windowed path accuracy-neutral?).

Usage (on-chip, ~15 min):
  python tools/finetune_recovery_study.py \
      --ckpt studies/ckpt_xsem_lr2e4/arm_exact.pkl \
      --json studies/finetune_recovery.json
"""
import argparse
import dataclasses
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def build_cfg(args, sem: str):
    from simpb_tpu.configs.base import simpb_tiny

    base = simpb_tiny()
    head = dataclasses.replace(
        base.head,
        embed_dims=args.embed,
        num_groups=max(4, args.embed // 32),
        num_anchor=args.anchors,
        num_temp_instances=args.anchors // 2,
        allocation_capacity=args.alloc_capacity,
        dn_allocation_capacity=args.alloc_capacity,
        num_output=min(300, args.anchors),
        msda_patch_mode=(sem == "fast"),
        msda_patch_hw=tuple(args.patch_hw),
        msda_sel_levels=2 if sem == "fast" else 0,
        msda_hybrid_mode=(sem == "hybrid"),
        msda_clamp_capacity=args.clamp_capacity,
        guard_sampling=(sem == "hybrid"),
    )
    return dataclasses.replace(
        base, input_size=tuple(args.wh), head=head
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="studies/ckpt_xsem_lr2e4/arm_exact.pkl")
    p.add_argument("--budgets", type=int, nargs="+",
                   default=[250, 500, 1000, 2000])
    p.add_argument("--ft-lr", type=float, default=5e-5)
    p.add_argument("--scenes", type=int, default=8)
    p.add_argument("--val-scenes", type=int, default=8)
    p.add_argument("--boxes", type=int, default=5)
    p.add_argument("--wh", type=int, nargs=2, default=[256, 128])
    p.add_argument("--embed", type=int, default=128)
    p.add_argument("--anchors", type=int, default=128)
    p.add_argument("--alloc-capacity", type=int, default=16)
    p.add_argument("--patch-hw", type=int, nargs=2, default=[6, 6])
    p.add_argument("--clamp-capacity", type=int, default=64,
                   help="hybrid correction-lane capacity; 64 covers "
                        "every (slot, level) entry at alloc 16 x 4 "
                        "levels, so the demand stat measures the "
                        "realistic need")
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--json", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from overfit_study import make_scene, scene_to_batch

    from simpb_tpu.configs.base import TrainConfig
    from simpb_tpu.data.nuscenes_eval import evaluate_detections
    from simpb_tpu.models.decoder3d import decode_boxes3d
    from simpb_tpu.models.detector import SimPB
    from simpb_tpu.training.train_step import (
        build_train_step, create_train_state, init_temporal)
    from simpb_tpu.utils.guards import merge_guard_maxima, summarize_guards
    from simpb_tpu.utils.synthetic import synthetic_rig

    img_wh = tuple(args.wh)
    g_slots = max(8, args.boxes)
    cams = 6
    proj_np = synthetic_rig(1, image_wh=img_wh)[0]
    proj = jnp.asarray(proj_np[None])
    fx = float(proj_np[0, 0, 0])
    static = {
        "projection_mat": proj,
        "temp2cur": jnp.eye(4)[None],
        "focal": jnp.full((1, cams), fx),
    }

    def build_batch(scene):
        b = scene_to_batch(scene, g_slots, g_slots, cams, jnp)
        b["img"] = jnp.asarray(scene["img"][None])
        b["time_interval"] = jnp.full((1,), 5.0)
        b.update(static)
        return b

    train_scenes = [
        make_scene(100 + i, args.boxes, img_wh, proj_np)
        for i in range(args.scenes)
    ]
    val_scenes = [
        make_scene(10_000 + i, args.boxes, img_wh, proj_np)
        for i in range(args.val_scenes)
    ]
    train_batches = [build_batch(s) for s in train_scenes]
    val_batches = [build_batch(s) for s in val_scenes]

    with open(args.ckpt, "rb") as f:
        payload = pickle.load(f)
    variables0 = payload["variables"]
    print(f"loaded {args.ckpt} (sem={payload.get('sem')})", flush=True)

    def evaluate(eval_sem, variables, scenes, batches):
        cfg = build_cfg(args, eval_sem)
        model = SimPB(cfg)
        temporal0, _ = init_temporal(cfg, 1)
        guarded = cfg.head.guard_sampling

        def run(v, img, temporal, dt):
            if guarded:
                out, mut = model.apply(
                    v, img, proj, temporal=temporal, time_interval=dt,
                    temp2cur=static["temp2cur"], train=False,
                    mutable=["guards"],
                )
                return out, summarize_guards(mut["guards"])
            out = model.apply(
                v, img, proj, temporal=temporal, time_interval=dt,
                temp2cur=static["temp2cur"], train=False,
            )
            return out, {}

        apply = jax.jit(run)
        preds, gts = [], []
        guard_max = {}
        temporal = temporal0
        for s, b in zip(scenes, batches):
            out, gsum = apply(variables, b["img"], temporal,
                              b["time_interval"])
            temporal = out["temporal_state"]
            guard_max = merge_guard_maxima(
                guard_max, {k: float(v) for k, v in gsum.items()}
            )
            det = decode_boxes3d(
                out["classification"][-1], out["prediction"][-1],
                quality=(out["quality"][-1] if out.get("quality")
                         else None),
                num_output=cfg.head.num_output,
            )
            preds.append({
                "boxes": np.asarray(det["boxes_3d"][0], np.float64),
                "scores": np.asarray(det["scores_3d"][0], np.float64),
                "labels": np.asarray(det["labels_3d"][0]),
            })
            gts.append({
                "boxes": s["boxes"].astype(np.float64),
                "labels": s["labels"],
            })
        m = evaluate_detections(preds, gts)
        m.update({f"guard_{k}": v for k, v in guard_max.items()})
        return m

    results = {"baseline": {}, "recovery": []}
    for eval_sem in ("exact", "fast", "hybrid"):
        for split, scenes, batches in (
            ("train", train_scenes, train_batches),
            ("val", val_scenes, val_batches),
        ):
            m = evaluate(eval_sem, variables0, scenes, batches)
            key = f"eval_{eval_sem}/{split}"
            keep = {k: m[k] for k in ("mAP", "NDS", "mATE", "mASE")}
            keep.update(
                {k: v for k, v in m.items() if k.startswith("guard_")}
            )
            results["baseline"][key] = keep
            print(f"[{key}] " + " ".join(
                f"{k} {v:.4f}" for k, v in keep.items()), flush=True)

    # ---- short fast-semantics fine-tune, eval-under-fast curve ----
    cfg_ft = build_cfg(args, "fast")
    model = SimPB(cfg_ft)
    total = max(args.budgets)
    tc = TrainConfig(
        lr=args.ft_lr, warmup_iters=min(50, total // 10),
        num_iters_per_epoch=total, num_epochs=1,
    )
    # rebuild full variables (batch_stats etc.) then load trained params
    state = create_train_state(model, variables0, tc)
    step = jax.jit(build_train_step(model, tc), donate_argnums=(0,))
    temporal, dn_state = init_temporal(cfg_ft, 1)
    key = jax.random.PRNGKey(17)
    budgets = sorted(args.budgets)
    next_budget = 0
    t0 = time.time()
    for i in range(total):
        key, sub = jax.random.split(key)
        state, temporal, dn_state, metrics = step(
            state, train_batches[i % len(train_batches)],
            temporal, dn_state, sub,
        )
        if (i + 1) % args.log_every == 0:
            loss = float(metrics["loss"])
            print(f"[ft] step {i + 1:5d}  loss {loss:9.3f}  "
                  f"({time.time() - t0:6.1f}s)", flush=True)
            assert np.isfinite(loss), "fine-tune diverged"
        if (i + 1) == budgets[next_budget]:
            v = {"params": jax.device_get(state.params)}
            if state.batch_stats:
                v["batch_stats"] = jax.device_get(state.batch_stats)
            entry = {"steps": i + 1}
            for split, scenes, batches in (
                ("train", train_scenes, train_batches),
                ("val", val_scenes, val_batches),
            ):
                m = evaluate("fast", v, scenes, batches)
                entry[f"fast/{split}"] = {
                    k: m[k] for k in ("mAP", "NDS", "mATE", "mASE")
                }
            results["recovery"].append(entry)
            print(f"[recovery @ {i + 1}] "
                  f"train mAP {entry['fast/train']['mAP']:.4f}  "
                  f"val mAP {entry['fast/val']['mAP']:.4f}", flush=True)
            next_budget += 1
            if next_budget >= len(budgets):
                break

    out = {
        "config": {
            "ckpt": args.ckpt, "budgets": budgets, "ft_lr": args.ft_lr,
            "scenes": args.scenes, "val_scenes": args.val_scenes,
            "wh": list(img_wh), "embed": args.embed,
            "anchors": args.anchors, "patch_hw": list(args.patch_hw),
            "clamp_capacity": args.clamp_capacity,
        },
        "results": results,
    }
    print(json.dumps(out, indent=1))
    if args.json:
        os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
