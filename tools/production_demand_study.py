"""Production-geometry serving evidence for converted checkpoints:
clamp-demand distribution + held-out fine-tune recovery.

VERDICT.md round-4 item 1: the two serving-recipe claims for converted
(exact-trained) checkpoints rested on measurements from regimes that
don't transfer —

  * the hybrid tier's premise ("demand concentrates: only a minority
    of (query, level) entries clamp") was contradicted by its only
    data point, a 6x6 window on a 64x32 map (demand 64/64 = total);
  * the 250-step fine-tune recovery was proven on TRAIN-scene mAP in
    an 8-scene memorisation regime (val ~= 0.046).

This study closes both at the PRODUCTION sampling geometry: the
flagship 8x8 window on the production 176x64 level-0 map (704x256
input, stride 4) with the 256-scene generalisation rig (the round-4
instrument whose held-out val mAP reached 0.528,
`studies/capacity_xl_emb256_s256.json`):

  1. train an EXACT-semantics arm (the converted-torch-checkpoint
     stand-in; mmcv MSDA semantics, reference
     models/group_attn.py:229-232 + ops/src/deformable_aggregation_
     cuda.cu:129-187) to convergence on 256 painted scenes;
  2. measure the `msda_clamp_demand` DISTRIBUTION of that checkpoint
     under the production 8x8 window: per-frame, per-layer,
     per-camera counts (histogram + p50/p90/p99/max), via the
     `msda_percam_clamp_demand` guard vector (models/group_attn.py).
     This number decides whether `simpb_r50_704x256_hybrid` is a real
     serving tier (demand << total entries) or a dead branch (demand
     ~= total, where PERF.md says serve `_guarded` instead);
  3. evaluate the exact-trained weights under exact / fast / hybrid
     semantics on train AND HELD-OUT val scenes (the conversion-cost
     and hybrid-recovery numbers in the generalisation regime);
  4. re-run the fast-semantics fine-tune recovery curve
     (250/500/1000/2000 steps at lr 5e-5) and report HELD-OUT val mAP
     — the day-0 "convert + brief fine-tune -> 76 fps tier" recipe,
     proven on data the checkpoint cannot have memorised.

Usage (on-chip, ~2 h at the defaults):
  python tools/production_demand_study.py \
      --ckpt-dir studies/ckpt_prod_demand \
      --json studies/production_demand.json
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
    """Study config at production geometry. `sem` picks the sampling
    semantics: exact (converted-checkpoint stand-in), fast (flagship
    windowed + top-2 levels), hybrid (windowed + exact correction)."""
    from simpb_tpu.configs.base import simpb_tiny

    base = simpb_tiny()
    head = dataclasses.replace(
        base.head,
        embed_dims=args.embed,
        num_groups=max(4, args.embed // 32),
        num_anchor=args.anchors,
        num_temp_instances=args.anchors // 2,
        allocation_capacity=args.alloc_capacity,
        # the DN allocation pool is num_dn_groups x padded-GT slots
        # (tiny: 2 x 8 = 16); its capacity must not exceed the pool
        dn_allocation_capacity=min(
            args.alloc_capacity,
            base.head.num_dn_groups * max(8, args.boxes),
        ),
        num_output=min(300, args.anchors),
        # PRODUCTION window geometry: the flagship (8, 8) default on
        # the real 176x64 level-0 map — nothing is rescaled here
        msda_patch_mode=(sem == "fast"),
        msda_patch_hw=tuple(args.patch_hw),
        msda_sel_levels=2 if sem == "fast" else 0,
        msda_hybrid_mode=(sem == "hybrid"),
        msda_clamp_capacity=args.clamp_capacity,
        guard_sampling=(sem == "hybrid"),
    )
    return dataclasses.replace(
        base,
        input_size=tuple(args.wh),
        head=head,
        # production training numerics + memory posture (tools/train.py
        # defaults): bf16 trunk, fp32 head, remat on (704x256 bs-2
        # activations without remat pressure HBM alongside the
        # on-device scene cache)
        compute_dtype="bfloat16",
        backbone_remat=True,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=12000)
    p.add_argument("--scenes", type=int, default=256)
    p.add_argument("--val-scenes", type=int, default=32)
    p.add_argument("--train-eval-scenes", type=int, default=64,
                   help="cap on train scenes scored per eval pass "
                        "(accuracy only; the demand histogram streams "
                        "over ALL train + val scenes)")
    p.add_argument("--boxes", type=int, default=5)
    p.add_argument("--wh", type=int, nargs=2, default=[704, 256],
                   help="production input -> 176x64 level-0 map")
    p.add_argument("--embed", type=int, default=128)
    p.add_argument("--anchors", type=int, default=128)
    p.add_argument("--alloc-capacity", type=int, default=32)
    p.add_argument("--patch-hw", type=int, nargs=2, default=[8, 8])
    p.add_argument("--clamp-capacity", type=int, default=None,
                   help="hybrid correction-lane capacity for the "
                        "accuracy eval; default = alloc * levels "
                        "(covers every entry, so demand is measured "
                        "with zero overflow)")
    p.add_argument("--bs", type=int, default=2)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--ft-lr", type=float, default=5e-5)
    p.add_argument("--budgets", type=int, nargs="+",
                   default=[250, 500, 1000, 2000])
    p.add_argument("--log-every", type=int, default=200)
    p.add_argument("--ckpt-dir", default="studies/ckpt_prod_demand")
    p.add_argument("--json", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.clamp_capacity is None:
        args.clamp_capacity = args.alloc_capacity * 4  # 4 levels

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
    cams = 6
    proj_np = synthetic_rig(1, image_wh=img_wh)[0]
    proj = jnp.asarray(proj_np[None])
    fx = float(proj_np[0, 0, 0])
    static = {
        "projection_mat": proj,
        "temp2cur": jnp.eye(4)[None],
        "focal": jnp.full((1, cams), fx),
    }

    t_paint = time.time()
    train_scenes = [
        make_scene(100 + i, args.boxes, img_wh, proj_np)
        for i in range(args.scenes)
    ]
    val_scenes = [
        make_scene(10_000 + i, args.boxes, img_wh, proj_np)
        for i in range(args.val_scenes)
    ]
    print(
        f"{len(train_scenes)} train + {len(val_scenes)} val scenes "
        f"painted at {img_wh} ({time.time() - t_paint:.0f}s)",
        flush=True,
    )

    def host_batch(scene):
        """Numpy batch (host-resident; images go to device per eval
        frame — keeping all 288 scenes' images in HBM alongside the
        training pairs would not fit)."""
        b = scene_to_batch(scene, g_slots, g_slots, cams, np)
        b["img"] = scene["img"][None]
        b["time_interval"] = np.full((1,), 5.0, np.float32)
        return b

    train_hb = [host_batch(s) for s in train_scenes]
    val_hb = [host_batch(s) for s in val_scenes]

    # ---- k-means GT anchors (production tools/anchor_generator.py
    # recipe; uniform-at-origin init fails at this scale — PERF.md
    # capacity ladder) ----
    gt = np.concatenate([s_["boxes"] for s_ in train_scenes], 0)
    feats = np.concatenate([
        gt[:, :3],
        np.log(np.maximum(gt[:, 3:6], 1e-3)),
        np.sin(gt[:, 6:7]), np.cos(gt[:, 6:7]),
        np.zeros((len(gt), 3), np.float32),
    ], 1).astype(np.float64)
    if len(feats) >= args.anchors:
        from sklearn.cluster import KMeans

        centers = KMeans(
            n_clusters=args.anchors, n_init=4, random_state=0
        ).fit(feats).cluster_centers_
    else:  # smoke-scale fallback: tile + jitter positions
        rng_a = np.random.default_rng(0)
        centers = np.tile(feats, (args.anchors // len(feats) + 1, 1))[
            : args.anchors
        ]
        centers[:, :2] += rng_a.normal(0, 2.0, (args.anchors, 2))
    centers = centers.astype(np.float32)

    def install_anchors(variables):
        def _replace(path, leaf):
            if (
                getattr(path[-1], "key", None) == "anchor"
                and leaf.shape == centers.shape
            ):
                return jnp.asarray(centers, leaf.dtype)
            return leaf

        return jax.tree_util.tree_map_with_path(_replace, variables)

    # ---- train (or load) the exact-semantics arm ----
    ck = os.path.join(args.ckpt_dir, "arm_exact_prod.pkl")
    cfg_exact = build_cfg(args, "exact")
    if os.path.exists(ck):
        with open(ck, "rb") as f:
            variables0 = pickle.load(f)["variables"]
        print(f"loaded exact arm from {ck}", flush=True)
        variables0 = jax.device_put(variables0)  # ONE param upload
    else:
        model = SimPB(cfg_exact)
        tc = TrainConfig(
            lr=args.lr, warmup_iters=min(500, args.steps // 8),
            num_iters_per_epoch=args.steps, num_epochs=1,
        )
        # bs-2 training pairs live on device; eval keeps host singles
        def device_pair(i, j):
            keys = train_hb[0].keys()
            out = {}
            for k in keys:
                out[k] = jnp.asarray(np.concatenate(
                    [train_hb[i][k], train_hb[j][k]], 0
                ))
            for k, v in static.items():
                out[k] = jnp.concatenate([v] * args.bs, 0)
            return out

        n_pairs = len(train_hb) // args.bs
        print(f"staging {n_pairs} bs-{args.bs} training batches on "
              "device...", flush=True)
        train_batches = [
            device_pair(i * args.bs, i * args.bs + 1)
            for i in range(n_pairs)
        ]
        variables = jax.jit(
            lambda: model.init(
                {"params": jax.random.PRNGKey(0),
                 "aug": jax.random.PRNGKey(1),
                 "dropout": jax.random.PRNGKey(2),
                 "sampling": jax.random.PRNGKey(3)},
                train_batches[0]["img"],
                train_batches[0]["projection_mat"], train=True,
            )
        )()
        variables = install_anchors(variables)
        state = create_train_state(model, variables, tc)
        del variables
        step = jax.jit(build_train_step(model, tc), donate_argnums=(0,))
        temporal, dn_state = init_temporal(cfg_exact, args.bs)
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
                    f"[exact] step {i + 1:6d}  loss {loss:10.3f}  "
                    f"({time.time() - t0:7.1f}s)", flush=True
                )
                assert np.isfinite(loss), "exact arm diverged"
        host_vars = {"params": jax.device_get(state.params)}
        if state.batch_stats:
            host_vars["batch_stats"] = jax.device_get(state.batch_stats)
        os.makedirs(args.ckpt_dir, exist_ok=True)
        with open(ck, "wb") as f:
            pickle.dump({"variables": host_vars, "sem": "exact"}, f)
        # keep the DEVICE-resident copy for the eval phases (one param
        # upload total — see evaluate() docstring)
        variables0 = {"params": state.params}
        if state.batch_stats:
            variables0["batch_stats"] = state.batch_stats
        del train_batches, state, host_vars
        print(f"saved exact arm -> {ck}", flush=True)

    # ---- eval helpers ----
    def make_apply(cfg, model, collect_guards):
        def run(v, img, temporal, dt):
            if collect_guards:
                out, mut = model.apply(
                    v, img, proj, temporal=temporal, time_interval=dt,
                    temp2cur=static["temp2cur"], train=False,
                    mutable=["guards"],
                )
                # per-layer [B*cams] demand vectors, stacked
                leaves = []
                for path, leaf in jax.tree_util.tree_flatten_with_path(
                    mut["guards"]
                )[0]:
                    name = str(path)
                    if "msda_percam_clamp_demand" in name:
                        leaves.append(jnp.asarray(leaf).reshape(-1))
                demand = (
                    jnp.stack(leaves) if leaves
                    else jnp.zeros((0, 0), jnp.float32)
                )
                return out, demand
            out = model.apply(
                v, img, proj, temporal=temporal, time_interval=dt,
                temp2cur=static["temp2cur"], train=False,
            )
            return out, jnp.zeros((0, 0), jnp.float32)

        return jax.jit(run)

    _apply_cache = {}

    def evaluate(eval_sem, variables, host_batches, scenes,
                 collect_guards=False, tag=""):
        """`variables` MUST be a device-resident pytree
        (jax.device_put once per checkpoint): passing host numpy here
        re-uploads the full param set per frame, and the tunnel client
        keeps each upload's host mirror alive for the call — hundreds
        of frames x ~140 MB OOMed the host on the first run of this
        study (same failure class as the round-2 cam-sharded eval
        fix: one-time param transfer)."""
        import gc

        cfg = build_cfg(args, eval_sem)
        model = SimPB(cfg)
        temporal0, _ = init_temporal(cfg, 1)
        cache_key = (eval_sem, collect_guards)
        if cache_key not in _apply_cache:
            _apply_cache[cache_key] = make_apply(
                cfg, model, collect_guards
            )
        apply = _apply_cache[cache_key]
        gc.collect()
        preds, gts, demands = [], [], []
        temporal = temporal0
        for s, hb in zip(scenes, host_batches):
            out, demand = apply(
                variables, jnp.asarray(hb["img"]), temporal,
                jnp.asarray(hb["time_interval"]),
            )
            temporal = out["temporal_state"]
            if collect_guards:
                demands.append(np.asarray(demand))
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
        if tag:
            print(f"[{tag}] mAP {m['mAP']:.4f}  NDS {m['NDS']:.4f}  "
                  f"mATE {m['mATE']:.4f}", flush=True)
        return m, demands

    results = {"config": vars(args), "baseline": {}, "demand": {},
               "recovery": []}
    tr_hb = train_hb[: args.train_eval_scenes]
    tr_sc = train_scenes[: args.train_eval_scenes]

    # ---- (2) demand distribution under the production window ----
    # streamed over ALL train + val scenes; capacity covers every
    # entry so overflow is 0 and demand is the true need
    _, demands_tr = evaluate(
        "hybrid", variables0, train_hb, train_scenes,
        collect_guards=True, tag="demand/train-sweep",
    )
    _, demands_val = evaluate(
        "hybrid", variables0, val_hb, val_scenes,
        collect_guards=True, tag="demand/val-sweep",
    )
    all_d = np.concatenate(
        [d.reshape(-1) for d in demands_tr + demands_val]
    )
    per_frame_max = np.asarray(
        [d.max() if d.size else 0.0 for d in demands_tr + demands_val]
    )
    total_entries = args.alloc_capacity * 4
    hist_edges = list(range(0, total_entries + 8, 8))
    hist, _ = np.histogram(all_d, bins=hist_edges)
    results["demand"] = {
        "window": list(args.patch_hw),
        "level0_map": [img_wh[1] // 4, img_wh[0] // 4],
        "total_entries_per_camera": total_entries,
        "n_values": int(all_d.size),
        "n_frames": int(per_frame_max.size),
        "per_camera_layer": {
            "p50": float(np.percentile(all_d, 50)),
            "p90": float(np.percentile(all_d, 90)),
            "p99": float(np.percentile(all_d, 99)),
            "max": float(all_d.max()),
            "mean": float(all_d.mean()),
        },
        "per_frame_max": {
            "p50": float(np.percentile(per_frame_max, 50)),
            "p99": float(np.percentile(per_frame_max, 99)),
            "max": float(per_frame_max.max()),
        },
        "histogram_bin_edges": hist_edges,
        "histogram_counts": hist.tolist(),
        "demand_fraction_of_total": float(
            all_d.max() / total_entries
        ),
    }
    print("[demand] " + json.dumps(results["demand"]["per_camera_layer"])
          + f" / total {total_entries}", flush=True)

    # ---- (3) accuracy under each semantics, train + HELD-OUT val ----
    for eval_sem in ("exact", "fast", "hybrid"):
        for split, hbs, scs in (
            ("train", tr_hb, tr_sc), ("val", val_hb, val_scenes),
        ):
            m, _ = evaluate(
                eval_sem, variables0, hbs, scs,
                tag=f"eval_{eval_sem}/{split}",
            )
            results["baseline"][f"eval_{eval_sem}/{split}"] = {
                k: m[k] for k in ("mAP", "NDS", "mATE", "mASE")
            }

    # ---- (4) fine-tune recovery, HELD-OUT val curve ----
    cfg_ft = build_cfg(args, "fast")
    model_ft = SimPB(cfg_ft)
    total = max(args.budgets)
    tc_ft = TrainConfig(
        lr=args.ft_lr, warmup_iters=min(50, total // 10),
        num_iters_per_epoch=total, num_epochs=1,
    )
    # fine-tune on bs-1 single scenes (the data the checkpoint was
    # trained on; budgets are tiny so throughput is irrelevant)
    state = create_train_state(model_ft, variables0, tc_ft)
    step = jax.jit(build_train_step(model_ft, tc_ft),
                   donate_argnums=(0,))
    temporal, dn_state = init_temporal(cfg_ft, 1)
    key = jax.random.PRNGKey(17)
    budgets = sorted(args.budgets)
    next_b = 0
    t0 = time.time()
    for i in range(total):
        key, sub = jax.random.split(key)
        hb = train_hb[i % len(train_hb)]
        batch = {k: jnp.asarray(v) for k, v in hb.items()}
        batch.update(static)
        state, temporal, dn_state, metrics = step(
            state, batch, temporal, dn_state, sub,
        )
        del batch
        if (i + 1) % 100 == 0:
            import gc

            gc.collect()  # free the per-step image uploads promptly
            loss = float(metrics["loss"])
            print(f"[ft] step {i + 1:5d}  loss {loss:9.3f}  "
                  f"({time.time() - t0:6.1f}s)", flush=True)
            assert np.isfinite(loss), "fine-tune diverged"
        if (i + 1) == budgets[next_b]:
            # device-resident snapshot for the eval passes (no
            # per-frame param re-upload)
            v = {"params": state.params}
            if state.batch_stats:
                v["batch_stats"] = state.batch_stats
            entry = {"steps": i + 1}
            for split, hbs, scs in (
                ("train", tr_hb, tr_sc),
                ("val", val_hb, val_scenes),
            ):
                m, _ = evaluate(
                    "fast", v, hbs, scs,
                    tag=f"recovery@{i + 1}/fast/{split}",
                )
                entry[f"fast/{split}"] = {
                    k: m[k] for k in ("mAP", "NDS", "mATE", "mASE")
                }
            results["recovery"].append(entry)
            next_b += 1
            if next_b >= len(budgets):
                break

    print(json.dumps(
        {k: v for k, v in results.items() if k != "config"}, indent=1
    ))
    if args.json:
        os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
