"""In-process streaming evaluation over a sequence-aligned val shard.

Shared by `tools/test.py` (standalone eval CLI) and `tools/train.py`
(mid-training eval). The reference's mid-training eval forks a second
process per GPU (`CustomDistEvalHook`, reference
core/evaluation/eval_hooks.py:56-97 + apis/test.py:49-171); on TPU a
second process would contend with the trainer for the single chip
(CLAUDE.md: one process owns the TPU), so eval here runs in-process on
the live params with its own jitted step.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# jitted eval steps cached for the mid-training eval loop (rebuilding
# the jit wrappers per call would recompile the full model each
# eval_interval). Keyed on the model instance AND the decode-relevant
# cfg fields (a same-model call with different num_output/threshold
# must not reuse stale steps); bounded to the most recent few entries
# so sweeping many models (test suite, notebooks) cannot pin compiled
# executables for the process lifetime.
_JIT_CACHE: Dict[Tuple, Tuple[Any, Any, Any]] = {}
_JIT_CACHE_MAX = 3


def _jitted_steps(model, cfg, cam_mesh=None):
    """Jitted (cold_step, stream_step) for bs-batched streaming.

    With `cam_mesh` (a 1-D mesh named "cam"), the camera axis of the
    image/projection inputs shards across its devices and XLA inserts
    the cross-camera collectives the decoder needs — single-stream
    LATENCY scaling over several chips, the SURVEY §5 high-res scaling
    plan (camera-axis sharding; no reference equivalent — the reference
    is strictly one-GPU-per-stream at inference)."""
    from ..models.decoder3d import decode_boxes3d

    # cam_mesh keyed by content (device ids + axis names), not object
    # identity: callers build a fresh Mesh per eval call, and an id()
    # key would miss the cache and recompile the full model every time
    mesh_key = (
        None
        if cam_mesh is None
        else (
            tuple(d.id for d in cam_mesh.devices.flat),
            cam_mesh.axis_names,
        )
    )
    key = (
        id(model), cfg.head.num_output, cfg.head.score_threshold,
        mesh_key,
    )
    entry = _JIT_CACHE.get(key)
    if entry is not None and entry[0] is model:
        return entry[1], entry[2]

    guard = getattr(cfg.head, "guard_sampling", False)

    def _apply(variables, img, proj, **kw):
        """Run the model; with guard_sampling, also collect the sown
        sampling-exactness counters (utils/guards.py) and attach their
        per-frame maxima to the decode dict as `guard_*` entries
        (broadcast to [bs] so downstream per-sample indexing works)."""
        if guard:
            from ..utils.guards import summarize_guards

            out, mut = model.apply(
                variables, img, proj, train=False, mutable=["guards"],
                **kw,
            )
            gsum = summarize_guards(mut.get("guards", {}))
        else:
            out = model.apply(variables, img, proj, train=False, **kw)
            gsum = None
        dec = decode_boxes3d(
            out["classification"][-1],
            out["prediction"][-1],
            instance_id=out.get("instance_id"),
            quality=out["quality"][-1],
            num_output=cfg.head.num_output,
            score_threshold=cfg.head.score_threshold,
        )
        if gsum:
            bs = out["prediction"][-1].shape[0]
            for k, v in gsum.items():
                dec["guard_" + k] = jnp.broadcast_to(v, (bs,))
        return dec, out["temporal_state"]

    def _cold(variables, img, proj):
        return _apply(variables, img, proj)

    def _stream(variables, img, proj, state, dt, t2c):
        return _apply(
            variables, img, proj, temporal=state, time_interval=dt,
            temp2cur=t2c,
        )

    if cam_mesh is None:
        cold_step, stream_step = jax.jit(_cold), jax.jit(_stream)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        cam_sh = NamedSharding(cam_mesh, P(None, "cam"))
        repl = NamedSharding(cam_mesh, P())
        cold_step = jax.jit(
            _cold,
            in_shardings=(repl, cam_sh, cam_sh),
            out_shardings=repl,
        )
        stream_step = jax.jit(
            _stream,
            in_shardings=(repl, cam_sh, cam_sh, repl, repl, repl),
            out_shardings=repl,
        )

    while len(_JIT_CACHE) >= _JIT_CACHE_MAX:
        _JIT_CACHE.pop(next(iter(_JIT_CACHE)))
    _JIT_CACHE[key] = (model, cold_step, stream_step)
    return cold_step, stream_step


def _stream_shard(
    model,
    cfg,
    variables,
    dataset,
    shard: List[int],
    show_dir: Optional[str] = None,
    show_threshold: float = 0.3,
    progress: bool = False,
    cam_mesh=None,
):
    """Stream one sequence-aligned shard; returns
    (preds, gts, scene_ids, tokens) with boxes in the global frame."""
    from ..data.postprocess import boxes_lidar_to_global

    cold_step, stream_step = _jitted_steps(model, cfg, cam_mesh=cam_mesh)

    # transfer the parameters ONCE: callers often hold a numpy pytree
    # (orbax restore / torch conversion), and jit re-uploads numpy
    # arguments on every call — tens of MB per frame through the
    # ~40-90 ms-RTT tunnel, dwarfing the ~13 ms step itself
    if cam_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        variables = jax.device_put(
            variables, NamedSharding(cam_mesh, P())
        )
    else:
        variables = jax.device_put(variables)

    preds: List[dict] = []
    gts: List[dict] = []
    tokens: List[str] = []
    scene_ids: List[int] = []
    guard_max: Dict[str, float] = {}
    scene_no = 0
    vis_frames: List[np.ndarray] = []
    state = None
    prev_ts = prev_t_global = None
    for n, idx in enumerate(shard):
        sample = dataset.get_sample(idx, with_points=False)
        img = jnp.asarray(sample["img"][None])
        proj = jnp.asarray(sample["projection_mat"][None])
        ts = sample["timestamp"]
        t_global = sample["lidar2global"]
        # scene boundary = the sequence_eval_shards timestamp-gap rule
        if prev_ts is not None and ts - prev_ts > 4.0:
            scene_no += 1
        scene_ids.append(scene_no)
        if state is None:
            dec, state = cold_step(variables, img, proj)
        else:
            dt = jnp.asarray([ts - prev_ts], jnp.float32)
            t2c = jnp.asarray(
                (np.linalg.inv(t_global) @ prev_t_global)[None], jnp.float32
            )
            dec, state = stream_step(variables, img, proj, state, dt, t2c)
        prev_ts, prev_t_global = ts, t_global

        dec = {k: np.asarray(v)[0] for k, v in dec.items()}
        for k in list(dec):
            if k.startswith("guard_"):
                guard_max[k] = max(
                    guard_max.get(k, 0.0), float(dec.pop(k))
                )
        boxes_g = boxes_lidar_to_global(dec["boxes_3d"], t_global)
        valid = dec["valid"]
        # boxes are in the GLOBAL frame here: the class-range filter in
        # evaluate_detections needs the ego position (devkit measures
        # range as norm(box.translation - ego_pose.translation))
        ego_xy = sample["ego2global"][:2, 3].astype(np.float32)
        pred = {
            "boxes": boxes_g[valid],
            "scores": dec["scores_3d"][valid],
            "labels": dec["labels_3d"][valid],
            "ego_xy": ego_xy,
        }
        if "instance_ids" in dec:
            pred["track_ids"] = dec["instance_ids"][valid]
        preds.append(pred)
        tokens.append(dataset.data_infos[idx]["token"])
        gt = dataset.get_annotations(idx)
        gboxes = gt.get("gt_bboxes_3d", np.zeros((0, 9), np.float32))
        if len(gboxes):
            g10 = np.zeros((len(gboxes), 10), np.float32)
            g10[:, : gboxes.shape[1]] = gboxes
            g10 = boxes_lidar_to_global(g10, t_global)
        else:
            g10 = np.zeros((0, 10), np.float32)
        gt_d = {
            "boxes": g10,
            "labels": gt["gt_labels_3d"],
            "ego_xy": ego_xy,
        }
        if "gt_instance_id" in gt:
            gt_d["track_ids"] = np.asarray(gt["gt_instance_id"])
        gts.append(gt_d)

        if show_dir:
            from ..data.transforms import IMG_MEAN, IMG_STD
            from ..data.visualize import render_frame

            raw = sample["img"] * IMG_STD + IMG_MEAN
            frame = render_frame(
                list(raw),
                {
                    "boxes_3d": dec["boxes_3d"],
                    "scores_3d": dec["scores_3d"],
                    "labels_3d": dec["labels_3d"],
                },
                list(sample["projection_mat"]),
                score_threshold=show_threshold,
            )
            vis_frames.append(frame[..., ::-1])  # RGB -> BGR for cv2

        if progress and (n + 1) % 100 == 0:
            print(f"{n + 1}/{len(shard)} frames", flush=True)

    if show_dir and vis_frames:
        import os

        from ..data.visualize import write_video

        os.makedirs(show_dir, exist_ok=True)
        write_video(
            vis_frames, os.path.join(show_dir, "detections.mp4")
        )
        print(f"wrote {len(vis_frames)}-frame video to {show_dir}")

    return preds, gts, scene_ids, tokens, guard_max


def _score(preds, gts, scene_ids, tracking: bool) -> Dict[str, float]:
    from ..data.nuscenes_eval import evaluate_detections

    metrics = evaluate_detections(preds, gts)
    if tracking:
        have_ids = all(
            "track_ids" in p for p in preds
        ) and all("track_ids" in g for g in gts)
        if have_ids:
            from ..data.tracking_eval import evaluate_tracking

            metrics.update(evaluate_tracking(preds, gts, scene_ids))
        else:
            print(
                "tracking metrics skipped: instance ids missing from "
                "predictions or annotations"
            )
    return metrics


def streaming_eval(
    model,
    cfg,
    variables,
    dataset,
    max_frames: Optional[int] = None,
    show_dir: Optional[str] = None,
    show_threshold: float = 0.3,
    progress: bool = False,
    tracking: bool = False,
    world_size: int = 1,
    rank: int = 0,
    cam_shards: int = 1,
) -> Tuple[Dict[str, float], List[dict], List[str]]:
    """Stream one shard of `dataset` through the model and score it.

    Returns (metrics, per-frame predictions in global frame, tokens).
    The temporal instance bank threads frame-to-frame exactly like
    deployment streaming (reference tools/test.py:127-317). With
    `tracking=True` the decoder's persistent instance ids are scored
    with the native AMOTA/AMOTP evaluator (data/tracking_eval.py) —
    the reference formats a tracking submission but short-circuits the
    tracking branch of evaluate() (nuscenes_dataset.py:717-718).
    `world_size`/`rank` select one sequence-aligned shard (metrics then
    cover that shard only — use `distributed_streaming_eval` for the
    gathered multi-process score). `cam_shards > 1` shards the CAMERA
    axis over that many local devices for single-stream latency
    scaling (same program, cross-camera collectives inserted by XLA:
    cold-frame outputs match the unsharded stream within reduction-
    order float noise ~4e-4, which the recurrent temporal stream then
    amplifies — tests/test_distributed_eval.py)."""
    from ..data.sampler import sequence_eval_shards

    cam_mesh = None
    if cam_shards > 1:
        from jax.sharding import Mesh

        n_cams = getattr(cfg.head, "num_cams", 6)
        if n_cams % cam_shards:
            raise ValueError(
                f"cam_shards={cam_shards} must divide {n_cams} cameras"
            )
        if cam_shards > len(jax.local_devices()):
            raise ValueError(
                f"cam_shards={cam_shards} exceeds the "
                f"{len(jax.local_devices())} local devices"
            )
        cam_mesh = Mesh(
            np.array(jax.local_devices()[:cam_shards]), ("cam",)
        )

    shard = sequence_eval_shards(dataset, world_size)[rank]
    if max_frames:
        shard = shard[:max_frames]
    preds, gts, scene_ids, tokens, guard_max = _stream_shard(
        model, cfg, variables, dataset, shard,
        show_dir=show_dir, show_threshold=show_threshold,
        progress=progress, cam_mesh=cam_mesh,
    )
    metrics = _score(preds, gts, scene_ids, tracking)
    metrics.update(guard_max)
    return metrics, preds, tokens


def multidevice_streaming_eval(
    model,
    cfg,
    variables,
    dataset,
    max_frames: Optional[int] = None,
    progress: bool = False,
    tracking: bool = False,
    devices=None,
) -> Tuple[Dict[str, float], List[dict], List[str]]:
    """Single-process multi-device eval: each local device streams its
    own sequence-aligned shard as one slot of the batch axis, sharded
    over a 1-D data mesh. This is the JAX-native counterpart of the
    reference's 8-process x 1-GPU `dist_test.sh` eval (apis/test.py:
    49-167) — one process drives all chips, no disk gather needed.
    Per-device work stays a single stream (multi-stream batching on ONE
    chip is a measured dead end — PERF.md), so wall time scales ~1/N.

    Each shard starts with a cold instance bank — the same semantics as
    one rank of the reference's dist_test.sh (and of
    `distributed_streaming_eval`). Scene boundaries INSIDE a shard go
    through the per-sample |dt| > max_time_interval mask
    (models/instance_bank.py:109), exactly as in bs=1 streaming; padded
    tail frames (shards differ in length) re-feed the last frame and
    their predictions are dropped. Per-frame outputs are verified
    identical to streaming each shard sequentially at bs=1
    (tests/test_distributed_eval.py). Returns the same (metrics, preds,
    tokens) contract as `streaming_eval`, frames ordered shard-major."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..data.postprocess import boxes_lidar_to_global
    from ..data.sampler import sequence_eval_shards

    if devices is None:
        devices = jax.local_devices()
    n = len(devices)
    if n == 1:
        return streaming_eval(
            model, cfg, variables, dataset, max_frames=max_frames,
            progress=progress, tracking=tracking,
        )

    shards = sequence_eval_shards(dataset, n)
    n_eff = sum(1 for s in shards if s)
    if n_eff < n:
        # fewer scenes than devices: shrink the mesh so no shard is
        # empty (a zero-length stream has no valid temporal state)
        devices = devices[:n_eff]
        n = n_eff
        shards = sequence_eval_shards(dataset, n)
        if n == 1:
            return streaming_eval(
                model, cfg, variables, dataset, max_frames=max_frames,
                progress=progress, tracking=tracking,
            )
    if max_frames:
        # max_frames is the TOTAL frame budget (same meaning as the
        # single-stream path): split it evenly across the shards
        per_shard = -(-max_frames // n)  # ceil
        shards = [s[:per_shard] for s in shards]
    length = max(len(s) for s in shards)

    mesh = Mesh(np.asarray(devices), ("data",))
    batch_sh = NamedSharding(mesh, P("data"))
    repl_sh = NamedSharding(mesh, P())
    variables = jax.device_put(variables, repl_sh)
    cold_step, stream_step = _jitted_steps(model, cfg)

    preds: List[dict] = []
    gts: List[dict] = []
    tokens: List[str] = []
    scene_keys: List[Tuple[int, int]] = []
    md_guard_max: Dict[str, float] = {}
    # per-slot host state
    prev_ts = [None] * n
    prev_tg = [None] * n
    scene_no = [0] * n
    # shard-major result buffers so the output ordering matches the
    # rank-ordered merge of the per-process protocol
    per_shard: List[List[Tuple[dict, dict, Tuple[int, int], str]]] = [
        [] for _ in range(n)
    ]
    state = None
    last_sample: List[Optional[dict]] = [None] * n
    for t in range(length):
        samples = []
        for s in range(n):
            if t < len(shards[s]):
                last_sample[s] = dataset.get_sample(
                    shards[s][t], with_points=False
                )
            # else: dead slot re-feeds its last frame (no re-decode);
            # its predictions are dropped below
            samples.append(last_sample[s])
        img = jax.device_put(
            np.stack([sm["img"] for sm in samples]), batch_sh
        )
        proj = jax.device_put(
            np.stack(
                [sm["projection_mat"] for sm in samples]
            ).astype(np.float32),
            batch_sh,
        )
        if state is None:
            dec, state = cold_step(variables, img, proj)
        else:
            dt = np.zeros((n,), np.float32)
            t2c = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
            for s in range(n):
                dt[s] = samples[s]["timestamp"] - prev_ts[s]
                t2c[s] = (
                    np.linalg.inv(samples[s]["lidar2global"])
                    @ prev_tg[s]
                ).astype(np.float32)
            dec, state = stream_step(
                variables, img, proj, state,
                jax.device_put(dt, batch_sh),
                jax.device_put(t2c, batch_sh),
            )
        dec = {k: np.asarray(v) for k, v in dec.items()}
        for k in list(dec):
            if k.startswith("guard_"):
                md_guard_max[k] = max(
                    md_guard_max.get(k, 0.0), float(dec.pop(k).max())
                )

        for s in range(n):
            live = t < len(shards[s])
            sm = samples[s]
            ts = sm["timestamp"]
            if live:
                if prev_ts[s] is not None and ts - prev_ts[s] > 4.0:
                    scene_no[s] += 1
            prev_ts[s], prev_tg[s] = ts, sm["lidar2global"]
            if not live:
                continue
            idx = shards[s][t]
            t_global = sm["lidar2global"]
            boxes_g = boxes_lidar_to_global(dec["boxes_3d"][s], t_global)
            valid = dec["valid"][s]
            ego_xy = sm["ego2global"][:2, 3].astype(np.float32)
            pred = {
                "boxes": boxes_g[valid],
                "scores": dec["scores_3d"][s][valid],
                "labels": dec["labels_3d"][s][valid],
                "ego_xy": ego_xy,
            }
            if "instance_ids" in dec:
                pred["track_ids"] = dec["instance_ids"][s][valid]
            gt = dataset.get_annotations(idx)
            gboxes = gt.get("gt_bboxes_3d", np.zeros((0, 9), np.float32))
            if len(gboxes):
                g10 = np.zeros((len(gboxes), 10), np.float32)
                g10[:, : gboxes.shape[1]] = gboxes
                g10 = boxes_lidar_to_global(g10, t_global)
            else:
                g10 = np.zeros((0, 10), np.float32)
            gt_d = {
                "boxes": g10,
                "labels": gt["gt_labels_3d"],
                "ego_xy": ego_xy,
            }
            if "gt_instance_id" in gt:
                gt_d["track_ids"] = np.asarray(gt["gt_instance_id"])
            per_shard[s].append(
                (pred, gt_d, (s, scene_no[s]),
                 dataset.data_infos[idx]["token"])
            )
        if progress and (t + 1) % 100 == 0:
            print(f"{t + 1}/{length} frames x {n} devices", flush=True)

    for s in range(n):
        for pred, gt_d, key, token in per_shard[s]:
            preds.append(pred)
            gts.append(gt_d)
            scene_keys.append(key)
            tokens.append(token)
    metrics = _score(preds, gts, scene_keys, tracking)
    metrics.update(md_guard_max)
    return metrics, preds, tokens


def distributed_streaming_eval(
    model,
    cfg,
    variables,
    dataset,
    tmpdir: str,
    world_size: Optional[int] = None,
    rank: Optional[int] = None,
    max_frames: Optional[int] = None,
    progress: bool = False,
    tracking: bool = False,
) -> Optional[Tuple[Dict[str, float], List[dict], List[str]]]:
    """Multi-process eval with the reference's disk-gather protocol
    (custom_multi_gpu_test, reference apis/test.py:49-167): each process
    streams its sequence-aligned shard, pickles `part_{rank}.pkl` into
    the shared `tmpdir`, and rank 0 concatenates RANK-ORDERED (not
    interleaved — shards hold whole scenes, reference apis/test.py:155)
    and scores the full set. Returns (metrics, preds, tokens) on rank 0,
    None elsewhere. Defaults world_size/rank to the jax process grid;
    pass them explicitly to drive shards manually (single-host tests)."""
    import os
    import pickle

    if world_size is None:
        world_size = jax.process_count()
    if rank is None:
        rank = jax.process_index()

    from ..data.sampler import sequence_eval_shards

    shard = sequence_eval_shards(dataset, world_size)[rank]
    if max_frames:
        shard = shard[:max_frames]
    preds, gts, scene_ids, tokens, guard_max = _stream_shard(
        model, cfg, variables, dataset, shard, progress=progress
    )
    os.makedirs(tmpdir, exist_ok=True)
    part = os.path.join(tmpdir, f"part_{rank}.pkl")
    with open(part + ".tmp", "wb") as f:
        pickle.dump(
            {
                "preds": preds,
                "gts": gts,
                # scene keys must stay distinct across ranks
                "scene_ids": [(rank, s) for s in scene_ids],
                "tokens": tokens,
                "guard_max": guard_max,
            },
            f,
        )
    os.replace(part + ".tmp", part)  # atomic publish

    if jax.process_count() > 1:
        # barrier across hosts (reference dist.barrier, apis/test.py:144)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("simpb_eval_gather")
    if rank != 0:
        return None

    from ..utils.guards import merge_guard_maxima

    all_preds: List[dict] = []
    all_gts: List[dict] = []
    all_scenes: List = []
    all_tokens: List[str] = []
    all_guards: Dict[str, float] = {}
    for r in range(world_size):
        with open(os.path.join(tmpdir, f"part_{r}.pkl"), "rb") as f:
            payload = pickle.load(f)
        all_preds.extend(payload["preds"])
        all_gts.extend(payload["gts"])
        all_scenes.extend(payload["scene_ids"])
        all_tokens.extend(payload["tokens"])
        all_guards = merge_guard_maxima(
            all_guards, payload.get("guard_max", {})
        )
    metrics = _score(all_preds, all_gts, all_scenes, tracking)
    metrics.update(all_guards)
    return metrics, all_preds, all_tokens
