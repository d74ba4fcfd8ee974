"""Trained-weights cross-semantics accuracy bounds (exact vs fast).

VERDICT.md round-2 item 1a: `tools/patch_accuracy.py` measured
exact-vs-fast deviation at RANDOM init, where the 6-layer recurrent
decoder chaotically amplifies any op difference — uninformative. The
right experiment is on CONVERGED weights: train one arm under exact
sampling and one under the fast semantics (windowed MSDA + top-2 level
selection, the flagship `_fast` knobs), then evaluate EACH checkpoint
under BOTH semantics and report the mAP/NDS/mATE deltas. The
exact-trained/eval-under-fast delta is the serving contract number: it
bounds what converting an exact-semantics (reference-trained)
checkpoint into the fast config costs on this benchmark.

Scenes are the painted synthetic layouts of tools/overfit_study.py
(images fully determine labels; the native nuScenes evaluator scores
them — metric path parity: reference nuscenes_dataset.py:588-634).
Held-out layouts (unseen seeds) are scored too, so the deltas cover
generalisation, not just memorisation.

Usage (on-chip):
  python tools/cross_semantics_study.py --steps 4000 --scenes 8 \
      --val-scenes 8 --embed 128 --anchors 128 --wh 256 128 \
      --json studies/cross_semantics.json
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


def build_cfg(args, fast: bool):
    import dataclasses

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
        msda_patch_mode=fast,
        msda_patch_hw=tuple(args.patch_hw),
        msda_sel_levels=2 if fast else 0,
    )
    return dataclasses.replace(
        base, input_size=tuple(args.wh), head=head
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--scenes", type=int, default=8)
    p.add_argument("--val-scenes", type=int, default=8)
    p.add_argument("--boxes", type=int, default=5)
    p.add_argument("--wh", type=int, nargs=2, default=[256, 128])
    p.add_argument("--embed", type=int, default=128)
    p.add_argument("--anchors", type=int, default=128)
    p.add_argument("--alloc-capacity", type=int, default=16)
    p.add_argument("--patch-hw", type=int, nargs=2, default=[6, 6],
                   help="fast-arm window; (6,6) covers the same map "
                        "fraction on the 64x32 level-0 map of 256x128 "
                        "inputs as the flagship 8x8 does at 704x256")
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--log-every", type=int, default=200)
    p.add_argument("--json", default=None)
    p.add_argument("--ckpt-dir", default=None,
                   help="save/load per-arm trained params (pickle); "
                        "reruns reuse converged arms")
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
    from simpb_tpu.utils.synthetic import synthetic_rig

    img_wh = tuple(args.wh)
    g_slots = max(8, args.boxes)
    g2_slots = g_slots
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
        b = scene_to_batch(scene, g_slots, g2_slots, cams, jnp)
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
    print(
        f"{len(train_scenes)} train + {len(val_scenes)} val scenes "
        f"painted at {img_wh}", flush=True
    )

    def train_arm(sem: str):
        cfg = build_cfg(args, fast=(sem == "fast"))
        ck = (
            os.path.join(args.ckpt_dir, f"arm_{sem}.pkl")
            if args.ckpt_dir
            else None
        )
        if ck and os.path.exists(ck):
            with open(ck, "rb") as f:
                payload = pickle.load(f)
            print(f"[{sem}] loaded checkpoint {ck}", flush=True)
            return cfg, payload["variables"]
        model = SimPB(cfg)
        tc = TrainConfig(
            lr=args.lr, warmup_iters=min(200, args.steps // 4),
            num_iters_per_epoch=args.steps, num_epochs=1,
        )
        variables = jax.jit(
            lambda: model.init(
                {"params": jax.random.PRNGKey(0),
                 "aug": jax.random.PRNGKey(1),
                 "dropout": jax.random.PRNGKey(2),
                 "sampling": jax.random.PRNGKey(3)},
                train_batches[0]["img"], proj, train=True,
            )
        )()
        state = create_train_state(model, variables, tc)
        del variables
        step = jax.jit(build_train_step(model, tc), donate_argnums=(0,))
        temporal, dn_state = init_temporal(cfg, 1)
        key = jax.random.PRNGKey(11)
        t0 = time.time()
        for i in range(args.steps):
            key, sub = jax.random.split(key)
            state, temporal, dn_state, metrics = step(
                state, train_batches[i % len(train_batches)],
                temporal, dn_state, sub,
            )
            if (i + 1) % args.log_every == 0 or i == args.steps - 1:
                loss = float(metrics["loss"])
                print(
                    f"[{sem}] step {i + 1:5d}  loss {loss:10.3f}  "
                    f"({time.time() - t0:6.1f}s)", flush=True
                )
                assert np.isfinite(loss), "loss diverged"
        out_vars = {"params": state.params}
        if state.batch_stats:
            out_vars["batch_stats"] = state.batch_stats
        out_vars = jax.device_get(out_vars)
        if ck:
            os.makedirs(args.ckpt_dir, exist_ok=True)
            with open(ck, "wb") as f:
                pickle.dump({"variables": out_vars, "sem": sem}, f)
        return cfg, out_vars

    def evaluate(eval_sem: str, variables, scenes, batches):
        cfg = build_cfg(args, fast=(eval_sem == "fast"))
        model = SimPB(cfg)
        temporal0, _ = init_temporal(cfg, 1)
        apply = jax.jit(
            lambda v, img, temporal, dt: model.apply(
                v, img, proj, temporal=temporal, time_interval=dt,
                temp2cur=static["temp2cur"], train=False,
            )
        )
        preds, gts = [], []
        temporal = temporal0
        for s, b in zip(scenes, batches):
            out = apply(variables, b["img"], temporal,
                        b["time_interval"])
            temporal = out["temporal_state"]
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
        return evaluate_detections(preds, gts)

    results = {}
    for train_sem in ("exact", "fast"):
        cfg, variables = train_arm(train_sem)
        for eval_sem in ("exact", "fast"):
            for split, scenes, batches in (
                ("train", train_scenes, train_batches),
                ("val", val_scenes, val_batches),
            ):
                if not scenes:
                    continue
                m = evaluate(eval_sem, variables, scenes, batches)
                key = f"{train_sem}_weights/eval_{eval_sem}/{split}"
                results[key] = {
                    k: m[k] for k in ("mAP", "NDS", "mATE", "mASE")
                }
                print(
                    f"[{key}] mAP {m['mAP']:.4f}  NDS {m['NDS']:.4f}  "
                    f"mATE {m['mATE']:.4f}", flush=True
                )

    # headline deltas: same weights, exact vs fast evaluation
    deltas = {}
    for train_sem in ("exact", "fast"):
        for split in ("train", "val"):
            a = results.get(f"{train_sem}_weights/eval_exact/{split}")
            b = results.get(f"{train_sem}_weights/eval_fast/{split}")
            if a and b:
                deltas[f"{train_sem}_weights/{split}"] = {
                    k: abs(a[k] - b[k]) for k in a
                }
    out = {
        "config": {
            "steps": args.steps, "scenes": args.scenes,
            "val_scenes": args.val_scenes, "boxes": args.boxes,
            "wh": list(img_wh), "embed": args.embed,
            "anchors": args.anchors, "patch_hw": list(args.patch_hw),
        },
        "results": results,
        "deltas": deltas,
    }
    print(json.dumps(out, indent=1))
    if args.json:
        os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
