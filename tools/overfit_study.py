"""End-to-end learning evidence: overfit synthetic scenes, measure mAP.

The stability runs (PERF.md) only show finite loss on NOISE images with
random GT — nothing proves the full loop (targets, Hungarian matching,
DN, gradients through DFA/MSDA sampling, box/cls/quality losses) can
actually move detections onto objects. This study closes that gap
without a dataset: each GT box is PAINTED into the six cameras (filled
rectangle at its projected footprint, color keyed to its class), so the
images fully determine the labels; a model that learns drives scene
mAP -> 1 on the training scenes.

Mirrors nothing in the reference (it has real data); the metric path is
the reference's eval contract (`nuscenes_dataset.py:588-634`) via
`data/nuscenes_eval.py::evaluate_detections`.

Every step uses time_interval=5 s (> the 2 s stream-break threshold,
reference instance_bank.py:118-125) so each scene is a cold start —
temporal coherence is not part of what this study tests.

Usage:
  python tools/overfit_study.py [--steps 800] [--scenes 3] [--boxes 4]
      [--wh 128 64] [--lr 4e-4] [--json out.json]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

PALETTE = np.array(
    [
        [1.0, 0.2, 0.2], [0.2, 1.0, 0.2], [0.2, 0.4, 1.0], [1.0, 1.0, 0.2],
        [1.0, 0.2, 1.0], [0.2, 1.0, 1.0], [1.0, 0.6, 0.2], [0.6, 0.2, 1.0],
        [0.6, 1.0, 0.6], [0.9, 0.9, 0.9],
    ],
    np.float32,
)


def box_corners_np(box9):
    """[9] raw GT (x,y,z,w,l,h,yaw,vx,vy) -> [8,3] world corners."""
    x, y, z, w, l, h, yaw = box9[:7]
    idx = np.arange(8)
    template = (
        np.stack([(idx // 4) % 2, (idx // 2) % 2, idx % 2], -1) - 0.5
    )
    corners = template * np.array([w, l, h])
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    return corners @ rot.T + np.array([x, y, z])


def project_box(box9, proj, img_wh):
    """2D bbox of the projected corners; None when not visible."""
    corners = box_corners_np(box9)
    pts = np.concatenate([corners, np.ones((8, 1))], -1) @ proj.T
    depth = pts[:, 2]
    if (depth < 0.5).any():
        return None
    uv = pts[:, :2] / depth[:, None]
    lo, hi = uv.min(0), uv.max(0)
    lo = np.maximum(lo, 0)
    hi = np.minimum(hi, np.array(img_wh, np.float64))
    if (hi - lo).min() < 2:  # degenerate / outside
        return None
    return np.array([lo[0], lo[1], hi[0], hi[1]], np.float32)


def sample_boxes(seed, num_boxes, with_velocity=False):
    """Base GT: [G, 9] boxes (vx, vy in cols 7:9) + labels."""
    rng = np.random.default_rng(seed)
    G = num_boxes
    boxes = np.zeros((G, 9), np.float32)
    # spread around the ego so several cameras see something
    r = rng.uniform(8, 22, G)
    th = rng.uniform(-np.pi, np.pi, G)
    boxes[:, 0] = r * np.cos(th)
    boxes[:, 1] = r * np.sin(th)
    boxes[:, 2] = 0.8
    boxes[:, 3:6] = rng.uniform(1.8, 4.0, (G, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, G)
    if with_velocity:
        boxes[:, 7:9] = rng.uniform(-2.0, 2.0, (G, 2))
    labels = rng.integers(0, len(PALETTE), G).astype(np.int32)
    return boxes, labels


def make_scene(seed, num_boxes, img_wh, proj, boxes=None, labels=None):
    """One scene: GT boxes + painted 6-camera images + 2D GT tensors."""
    rng = np.random.default_rng(seed)
    w, h = img_wh
    cams = proj.shape[0]
    if boxes is None:
        boxes, labels = sample_boxes(seed, num_boxes)
    G = boxes.shape[0]

    img = rng.normal(0, 0.05, size=(cams, h, w, 3)).astype(np.float32)
    boxes2d = np.zeros((G, cams, 4), np.float32)
    vis2d = np.zeros((G, cams), bool)
    alphas = np.zeros((G, cams), np.float32)
    for n in range(cams):
        for g in range(G):
            bb = project_box(boxes[g], proj[n], img_wh)
            if bb is None:
                continue
            x0, y0, x1, y1 = (int(round(v)) for v in bb)
            img[n, y0:y1, x0:x1] = PALETTE[labels[g]]
            boxes2d[g, n] = bb
            vis2d[g, n] = True
            # alpha: box heading in the camera frame minus the viewing
            # ray angle (dataset.py convention up to a constant — the
            # network only needs consistency to overfit)
            Rc = proj[n][:3, :3]
            fwd = Rc @ np.array(
                [-np.sin(boxes[g, 6]), np.cos(boxes[g, 6]), 0.0]
            )
            ctr = proj[n] @ np.array([*boxes[g, :3], 1.0])
            alphas[g, n] = np.arctan2(fwd[0], fwd[2]) - np.arctan2(
                ctr[0], ctr[2]
            )
    return dict(
        boxes=boxes, labels=labels, img=img, boxes2d=boxes2d,
        vis2d=vis2d, alphas=alphas,
    )


def make_sequence(seed, num_boxes, img_wh, proj, seq_len, dt=0.5):
    """`seq_len` frames of boxes moving at constant velocity (the
    motion is the ONLY source of velocity information — per-frame
    images are static snapshots, so predicting vx/vy requires the
    temporal pathway)."""
    base, labels = sample_boxes(seed, num_boxes, with_velocity=True)
    frames = []
    for t in range(seq_len):
        b = base.copy()
        b[:, :2] += b[:, 7:9] * dt * t
        frames.append(
            make_scene(seed * 1000 + t, num_boxes, img_wh, proj,
                       boxes=b, labels=labels)
        )
    return frames


def scene_to_batch(scene, g_slots, g2_slots, cams, jnp):
    """Pad a scene into the train_step batch contract (train_step.py)."""
    G = scene["boxes"].shape[0]
    boxes3d = np.zeros((1, g_slots, 9), np.float32)
    boxes3d[0, :G] = scene["boxes"]
    labels3d = np.zeros((1, g_slots), np.int32)
    labels3d[0, :G] = scene["labels"]
    valid3d = np.zeros((1, g_slots), bool)
    valid3d[0, :G] = True

    # per-camera 2D GT: pack each camera's visible boxes into g2 slots
    boxes2d = np.zeros((1, cams, g2_slots, 4), np.float32)
    labels2d = np.zeros((1, cams, g2_slots), np.int32)
    alphas2d = np.zeros((1, cams, g2_slots), np.float32)
    valid2d = np.zeros((1, cams, g2_slots), bool)
    for n in range(cams):
        k = 0
        for g in range(G):
            if scene["vis2d"][g, n] and k < g2_slots:
                boxes2d[0, n, k] = scene["boxes2d"][g, n]
                labels2d[0, n, k] = scene["labels"][g]
                alphas2d[0, n, k] = scene["alphas"][g, n]
                valid2d[0, n, k] = True
                k += 1

    vis_p3 = np.zeros((1, g_slots, cams), bool)
    vis_p3[0, :G] = scene["vis2d"]
    boxes2d_p3 = np.zeros((1, g_slots, cams, 4), np.float32)
    boxes2d_p3[0, :G] = scene["boxes2d"]
    labels2d_p3 = np.zeros((1, g_slots, cams), np.int32)
    labels2d_p3[0, :G] = scene["labels"][:, None]
    alphas_p3 = np.zeros((1, g_slots, cams), np.float32)
    alphas_p3[0, :G] = scene["alphas"]

    return {
        "gt_boxes3d": jnp.asarray(boxes3d),
        "gt_labels3d": jnp.asarray(labels3d),
        "gt_valid3d": jnp.asarray(valid3d),
        "gt_instance_id": jnp.asarray(
            np.arange(g_slots, dtype=np.int32)[None]
        ),
        "gt_boxes2d": jnp.asarray(boxes2d),
        "gt_labels2d": jnp.asarray(labels2d),
        "gt_alphas2d": jnp.asarray(alphas2d),
        "gt_valid2d": jnp.asarray(valid2d),
        "gt_vis2d_per3d": jnp.asarray(vis_p3),
        "gt_boxes2d_per3d": jnp.asarray(boxes2d_p3),
        "gt_labels2d_per3d": jnp.asarray(labels2d_p3),
        "gt_alphas2d_per3d": jnp.asarray(alphas_p3),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--scenes", type=int, default=3)
    p.add_argument("--boxes", type=int, default=4)
    p.add_argument("--wh", type=int, nargs=2, default=[128, 64],
                   help="image (W, H) — width first, matching ModelConfig.input_size")
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--json", default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--fast", action="store_true",
                   help="train with the fast-config sampling semantics "
                        "(windowed MSDA + top-2 level selection) — the "
                        "train-native accuracy evidence for the "
                        "flagship `_fast` configs")
    p.add_argument("--patch-hw", type=int, nargs=2, default=[4, 4],
                   help="window (h, w) for --fast; the default (4,4) "
                        "covers the same fraction of the tiny level-0 "
                        "map as the flagship 8x8 does at 704x256")
    p.add_argument("--temporal", action="store_true",
                   help="boxes move at constant velocity; stream "
                        "sequences with dt=0.5 (tests the temporal "
                        "pathway: velocity + instance-id tracking)")
    p.add_argument("--seq-len", type=int, default=6)
    p.add_argument("--dt", type=float, default=0.5)
    p.add_argument("--val-scenes", type=int, default=0,
                   help="also score N HELD-OUT painted scenes (unseen "
                        "box layouts/classes) — generalisation, not "
                        "memorisation. In --temporal mode these are "
                        "held-out SEQUENCES: val mAVE + instance-id "
                        "track consistency measure whether the "
                        "velocity/tracking pathways transfer to "
                        "unseen layouts (VERDICT r4 item 8)")
    # capacity-ladder knobs (VERDICT round-2 item 2): scale the model
    # above the tiny config to test whether held-out val mAP rises with
    # capacity (round-2 plateau: ~0.17 at embed 64 / 32 anchors)
    p.add_argument("--embed", type=int, default=None,
                   help="embed dims (default: tiny config's 64)")
    p.add_argument("--anchors", type=int, default=None,
                   help="3D anchor count (default: tiny's 32)")
    p.add_argument("--alloc-capacity", type=int, default=None,
                   help="per-camera 2D slot capacity (default tiny 8)")
    p.add_argument("--bs", type=int, default=1,
                   help="scenes per train step (distinct scenes batch "
                        "along axis 0; eval stays bs=1)")
    p.add_argument("--gt-anchors", action="store_true",
                   help="initialise the 3D anchors by k-means over the "
                        "TRAIN scenes' GT boxes (the production "
                        "tools/anchor_generator.py recipe) instead of "
                        "the default uniform[0,1) init — the round-3 "
                        "capacity-ladder top rung failed partly "
                        "because uniform anchors start at the ego "
                        "origin (VERDICT r3 weak #6)")
    p.add_argument("--lr-label", default=None, help=argparse.SUPPRESS)
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from simpb_tpu.configs.base import TrainConfig, simpb_tiny
    from simpb_tpu.data.nuscenes_eval import evaluate_detections
    from simpb_tpu.models.decoder3d import decode_boxes3d
    from simpb_tpu.models.detector import SimPB
    from simpb_tpu.training.train_step import (
        build_train_step, create_train_state, init_temporal)
    from simpb_tpu.utils.synthetic import synthetic_rig

    img_wh = tuple(args.wh)
    cfg = dataclasses.replace(simpb_tiny(), input_size=img_wh)
    head = cfg.head
    if args.embed:
        head = dataclasses.replace(
            head, embed_dims=args.embed,
            num_groups=max(4, args.embed // 32),
        )
    if args.anchors:
        head = dataclasses.replace(
            head, num_anchor=args.anchors,
            num_temp_instances=args.anchors // 2,
            num_output=min(300, args.anchors),
        )
    if args.alloc_capacity:
        head = dataclasses.replace(
            head, allocation_capacity=args.alloc_capacity,
            dn_allocation_capacity=args.alloc_capacity,
        )
    cfg = dataclasses.replace(cfg, head=head)
    if args.fast:
        cfg = dataclasses.replace(
            cfg,
            head=dataclasses.replace(
                cfg.head,
                msda_patch_mode=True,
                msda_patch_hw=tuple(args.patch_hw),
                msda_sel_levels=2,
            ),
        )
    g_slots = 8
    g2_slots = 8
    cams = cfg.head.num_cams
    tc = TrainConfig(
        lr=args.lr, warmup_iters=min(50, args.steps // 4),
        num_iters_per_epoch=args.steps, num_epochs=1,
    )
    proj_np = synthetic_rig(1, image_wh=img_wh)[0]
    proj = jnp.asarray(proj_np[None])
    fx = float(proj_np[0, 0, 0])
    static = {
        "projection_mat": proj,
        "temp2cur": jnp.eye(4)[None],
        "focal": jnp.full((1, cams), fx),
    }

    def build_batch(scene, dt_value):
        b = scene_to_batch(scene, g_slots, g2_slots, cams, jnp)
        b["img"] = jnp.asarray(scene["img"][None])
        b["time_interval"] = jnp.full((1,), dt_value)
        b.update(static)
        return b

    if args.temporal:
        # sequences of moving boxes; dt=5 at frame 0 breaks the stream
        sequences = [
            make_sequence(100 + i, args.boxes, img_wh, proj_np,
                          args.seq_len, args.dt)
            for i in range(args.scenes)
        ]
        scenes = [fr for seq in sequences for fr in seq]
        batches = [
            build_batch(fr, 5.0 if t == 0 else args.dt)
            for seq in sequences
            for t, fr in enumerate(seq)
        ]
    else:
        scenes = [
            make_scene(100 + i, args.boxes, img_wh, proj_np)
            for i in range(args.scenes)
        ]
        batches = [build_batch(s, 5.0) for s in scenes]

    # train-time scene batching (--bs): distinct scenes stack on axis 0
    # (every step is a cold start, so batching is just throughput)
    if args.bs > 1:
        assert not args.temporal, "--bs applies to non-temporal mode"

        def concat(bl):
            return {
                k: jnp.concatenate([b[k] for b in bl], axis=0)
                for k in bl[0]
            }

        # wrap within each chunk so eval keeps the pristine per-scene
        # batches (no duplicated scenes in the metric set)
        train_batches = [
            concat([
                batches[(i + j) % len(batches)] for j in range(args.bs)
            ])
            for i in range(0, len(batches), args.bs)
        ]
    else:
        train_batches = batches

    print(f"{len(scenes)} scenes painted; compiling init...", flush=True)
    model = SimPB(cfg)
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
    if args.gt_anchors:
        # production anchor recipe (tools/anchor_generator.py): k-means
        # over GT box states; anchor state is the 11-dim
        # [x,y,z,logw,logl,logh,sin,cos,vx,vy,vz] (core/box3d.py)
        gt = np.concatenate([s_["boxes"] for s_ in scenes], 0)
        feats = np.concatenate([
            gt[:, :3],
            np.log(np.maximum(gt[:, 3:6], 1e-3)),
            np.sin(gt[:, 6:7]), np.cos(gt[:, 6:7]),
            np.zeros((len(gt), 3), np.float32),
        ], 1).astype(np.float64)
        k = cfg.head.num_anchor
        if len(feats) >= k:
            from sklearn.cluster import KMeans

            centers = KMeans(
                n_clusters=k, n_init=4, random_state=0
            ).fit(feats).cluster_centers_
        else:
            # fewer GT than anchors: tile + jitter positions
            rng_a = np.random.default_rng(0)
            centers = np.tile(feats, (k // len(feats) + 1, 1))[:k]
            centers[:, :2] += rng_a.normal(0, 2.0, (k, 2))
        centers = centers.astype(np.float32)

        def _replace(path, leaf):
            if (
                getattr(path[-1], "key", None) == "anchor"
                and leaf.shape == centers.shape
            ):
                return jnp.asarray(centers, leaf.dtype)
            return leaf

        variables = jax.tree_util.tree_map_with_path(_replace, variables)
        print(f"installed {k} k-means GT anchors "
              f"(from {len(feats)} GT boxes)", flush=True)

    def evaluate(params_variables, tag, ev_scenes=None, ev_batches=None):
        ev_scenes = scenes if ev_scenes is None else ev_scenes
        ev_batches = batches if ev_batches is None else ev_batches
        apply = jax.jit(
            lambda v, img, temporal, dt: model.apply(
                v, img, proj, temporal=temporal, time_interval=dt,
                temp2cur=static["temp2cur"], train=False,
            )
        )
        preds, gts = [], []
        track_hits, track_total = 0, 0
        temporal = temporal0
        prev_match = {}  # gt slot -> predicted instance id
        for s, b in zip(ev_scenes, ev_batches):
            out = apply(params_variables, b["img"], temporal,
                        b["time_interval"])
            temporal = out["temporal_state"]
            det = decode_boxes3d(
                out["classification"][-1], out["prediction"][-1],
                instance_id=(temporal.instance_id if args.temporal
                             else None),
                quality=(out["quality"][-1] if out.get("quality")
                         else None),
                num_output=cfg.head.num_output,
            )
            pred = {
                "boxes": np.asarray(det["boxes_3d"][0], np.float64),
                "scores": np.asarray(det["scores_3d"][0], np.float64),
                "labels": np.asarray(det["labels_3d"][0]),
            }
            preds.append(pred)
            gts.append({
                "boxes": s["boxes"].astype(np.float64),
                "labels": s["labels"],
            })
            if args.temporal:
                # tracking: the highest-score pred within 2 m of each GT
                # must keep its instance id across consecutive frames
                if float(b["time_interval"][0]) > 2.0:
                    prev_match = {}
                ids = np.asarray(det["instance_ids"][0])
                cur_match = {}
                for g, gt_box in enumerate(s["boxes"]):
                    d = np.linalg.norm(
                        pred["boxes"][:, :2] - gt_box[None, :2], axis=-1
                    )
                    cand = np.nonzero(d < 2.0)[0]
                    if len(cand):
                        cur_match[g] = int(ids[cand[0]])
                for g, iid in cur_match.items():
                    if g in prev_match:
                        track_total += 1
                        track_hits += int(prev_match[g] == iid)
                prev_match = cur_match
        m = evaluate_detections(preds, gts)
        if args.temporal and track_total:
            m["track_consistency"] = track_hits / track_total
        print(f"[{tag}] mAP {m['mAP']:.3f}  NDS {m['NDS']:.3f}  "
              f"mATE {m['mATE']:.3f}  mAVE {m['mAVE']:.3f}"
              + (f"  track {m.get('track_consistency', float('nan')):.3f}"
                 if args.temporal else ""), flush=True)
        return m

    temporal0, _ = init_temporal(cfg, 1)
    print("init done; scoring the untrained model...", flush=True)

    state = create_train_state(model, variables, tc)
    del variables  # buffers are donated into `state` by the train step

    def state_variables(st):
        v = {"params": st.params}
        if st.batch_stats:
            v["batch_stats"] = st.batch_stats
        return v

    before = evaluate(state_variables(state), "before")

    step = jax.jit(build_train_step(model, tc), donate_argnums=(0,))
    temporal, dn_state = init_temporal(cfg, args.bs)
    key = jax.random.PRNGKey(11)
    t0 = time.time()
    loss_first = loss_last = None
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        state, temporal, dn_state, metrics = step(
            state, train_batches[i % len(train_batches)], temporal,
            dn_state, sub,
        )
        if i == 0:
            loss_first = float(metrics["loss"])
        if (i + 1) % args.log_every == 0 or i == args.steps - 1:
            loss_last = float(metrics["loss"])
            print(f"step {i + 1:5d}  loss {loss_last:10.3f}  "
                  f"({time.time() - t0:6.1f}s)", flush=True)
            assert np.isfinite(loss_last), "loss diverged"

    after = evaluate(state_variables(state), "after")

    val = None
    if args.val_scenes:
        # held-out layouts: same rig and painting rule, unseen seeds —
        # scoring them tests generalisation of the learned
        # appearance->box mapping, not scene memorisation. Temporal
        # mode holds out whole SEQUENCES: val mAVE and track
        # consistency measure velocity/tracking transfer.
        if args.temporal:
            val_seqs = [
                make_sequence(20_000 + i, args.boxes, img_wh, proj_np,
                              args.seq_len, args.dt)
                for i in range(args.val_scenes)
            ]
            val_scenes = [fr for seq in val_seqs for fr in seq]
            val_batches = [
                build_batch(fr, 5.0 if t == 0 else args.dt)
                for seq in val_seqs
                for t, fr in enumerate(seq)
            ]
        else:
            val_scenes = [
                make_scene(10_000 + i, args.boxes, img_wh, proj_np)
                for i in range(args.val_scenes)
            ]
            val_batches = [build_batch(s, 5.0) for s in val_scenes]
        val = evaluate(
            state_variables(state), "val", val_scenes, val_batches
        )

    result = {
        "steps": args.steps, "scenes": args.scenes,
        "boxes_per_scene": args.boxes, "wh": list(img_wh),
        "temporal": args.temporal,
        "fast": args.fast,
        "embed": cfg.head.embed_dims, "anchors": cfg.head.num_anchor,
        "lr": args.lr, "bs": args.bs, "gt_anchors": args.gt_anchors,
        "loss_first": loss_first, "loss_last": loss_last,
        "mAP_before": before["mAP"], "mAP_after": after["mAP"],
        "NDS_before": before["NDS"], "NDS_after": after["NDS"],
        "mATE_after": after["mATE"], "mAVE_after": after["mAVE"],
    }
    if val is not None:
        result["val_scenes"] = args.val_scenes
        result["mAP_val"] = val["mAP"]
        result["NDS_val"] = val["NDS"]
        result["mATE_val"] = val["mATE"]
        result["mAVE_val"] = val["mAVE"]
        if args.temporal:
            result["track_consistency_val"] = val.get(
                "track_consistency"
            )
    if args.temporal:
        result["track_consistency_before"] = before.get(
            "track_consistency"
        )
        result["track_consistency_after"] = after.get(
            "track_consistency"
        )
        result["seq_len"] = args.seq_len
    print(json.dumps(result))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
