"""Full-state checkpointing: params, optimizer, streaming temporal state.

The reference checkpoints only model params + optimizer (mmcv
CheckpointHook); the temporal instance-bank stream restarts cold on
resume (SURVEY §5 gap). The explicit-state design here makes the full
stream resumable: TemporalState, DnState, and the host's per-slot
previous-frame pose all ride the same orbax tree, so a resumed run
continues the exact stream the interrupted one was on.
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np


def _pack_prev_pose(prev_pose: Optional[List]) -> Dict[str, np.ndarray]:
    """[(timestamp, lidar2global 4x4) | None] per slot -> dense arrays."""
    n = len(prev_pose) if prev_pose else 0
    ts = np.zeros((n,), np.float64)
    pose = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    has = np.zeros((n,), bool)
    for i, p in enumerate(prev_pose or []):
        if p is not None:
            ts[i], pose[i] = p[0], p[1]
            has[i] = True
    return {"ts": ts, "pose": pose, "has": has}


def _unpack_prev_pose(packed: Dict[str, np.ndarray]) -> List:
    out: List = []
    for i in range(len(packed["has"])):
        out.append(
            (float(packed["ts"][i]), np.asarray(packed["pose"][i]))
            if packed["has"][i]
            else None
        )
    return out


def gather_stream_state(temporal, dn_state, prev_pose: Optional[List]):
    """Collect the full global streaming state onto every host.

    Single process: identity. Multi-process: `temporal`/`dn_state` are
    data-sharded over the global mesh (not host-addressable), and each
    host's `prev_pose` covers only its local sampler slots — allgather
    both so rank 0 can write one checkpoint holding the whole stream
    (the reference saves per-rank nothing at all here; its temporal
    stream restarts cold on resume, SURVEY §5). Every process must call
    this (it contains collectives). Returns host values
    (temporal, dn_state, prev_pose-list of bs_global slots)."""
    if jax.process_count() == 1:
        return temporal, dn_state, prev_pose
    from jax.experimental import multihost_utils

    temporal = multihost_utils.process_allgather(temporal, tiled=True)
    dn_state = multihost_utils.process_allgather(dn_state, tiled=True)
    packed = _pack_prev_pose(prev_pose)
    gathered = multihost_utils.process_allgather(packed, tiled=True)
    return temporal, dn_state, _unpack_prev_pose(gathered)


def save_checkpoint(
    path: str,
    state,
    temporal,
    dn_state,
    prev_pose: Optional[List] = None,
    best_score: Optional[float] = None,
) -> None:
    import orbax.checkpoint as ocp

    tree = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": int(state.step),
        "temporal": temporal,
        "dn_state": dn_state,
        "prev_pose": _pack_prev_pose(prev_pose),
        # NaN = no best yet; restored so a resumed run cannot regress
        # ckpt_best with a worse post-resume score
        "best_score": float(
            best_score if best_score is not None else np.nan
        ),
    }
    ocp.PyTreeCheckpointer().save(
        os.path.abspath(path), jax.tree.map(np.asarray, tree), force=True
    )


def restore_checkpoint(
    path: str, state, temporal, dn_state
) -> Tuple[Any, Any, Any, Optional[List], int, Optional[float]]:
    """Restore into the given templates.

    Returns (state, temporal, dn_state, prev_pose | None, start_iter,
    best_score | None). Falls back to a params-only restore for older
    checkpoints.
    """
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(path)
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": 0,
        "temporal": temporal,
        "dn_state": dn_state,
        "prev_pose": _pack_prev_pose(None),
        "best_score": float("nan"),
    }
    prev_pose = None
    best_score = None
    # metadata pass: detect the checkpoint format and the prev_pose slot
    # count (follows bs_local, may differ from the current run) WITHOUT
    # deserialising any array data
    meta_tree = ckptr.metadata(path).item_metadata.tree
    full_format = all(
        k in meta_tree
        for k in ("opt_state", "temporal", "dn_state", "prev_pose")
    )
    if full_format:
        # typed restore — errors here mean a REAL mismatch (different
        # batch size / device count / model config than the templates)
        # and must surface, not silently fall back to params-only
        n_slots = int(meta_tree["prev_pose"]["has"].shape[0])
        template["prev_pose"] = _pack_prev_pose([None] * n_slots)
        if "best_score" not in meta_tree:  # pre-best_score checkpoint
            template.pop("best_score")
        loaded = ckptr.restore(path, item=template)
        state = state.replace(
            params=loaded["params"],
            batch_stats=loaded["batch_stats"],
            opt_state=loaded["opt_state"],
            step=jnp.asarray(loaded["step"], jnp.int32),
        )
        temporal = loaded["temporal"]
        dn_state = loaded["dn_state"]
        if n_slots:
            prev_pose = _unpack_prev_pose(loaded["prev_pose"])
        bs_val = float(loaded.get("best_score", float("nan")))
        if bs_val == bs_val:
            best_score = bs_val
    else:
        print(
            f"[checkpoint] {path} is params-only (no optimizer/temporal "
            "state): optimizer moments and the temporal stream restart "
            "fresh",
            flush=True,
        )
        raw = ckptr.restore(path)
        state = state.replace(
            params=raw["params"],
            batch_stats=raw["batch_stats"],
            step=jnp.asarray(raw["step"], jnp.int32),
        )
    return state, temporal, dn_state, prev_pose, int(state.step), best_score
