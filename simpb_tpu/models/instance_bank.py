"""Temporal instance memory as explicit functional state.

The reference `InstanceBank` (models/instance_bank.py:23-196) keeps its
recurrent state in Python attributes of an nn.Module, implicitly reset
when batch size or timestamps break. Here the state is an explicit pytree
(`TemporalState`) threaded through the jitted step —
`step(params, state, frame) -> (outputs, state)` — which is what makes
streaming inference / training compile under pjit (SURVEY.md §3.4, §7).

Timestamps never enter the device: the host (data pipeline) provides the
per-sample `time_interval` and the `temp2cur` ego-pose transform, which
sidesteps fp64 unix-epoch arithmetic on TPU.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from ..core import box3d


@flax.struct.dataclass
class TemporalState:
    """Carried across frames; all leaves have static shapes."""

    feature: jnp.ndarray  # [bs, T, C] cached instance features (detached)
    anchor: jnp.ndarray  # [bs, T, 11] cached anchors (current frame's ego)
    confidence: jnp.ndarray  # [bs, T] decayed sigmoid confidence
    instance_id: jnp.ndarray  # [bs, A] persistent tracking ids (-1 = none)
    prev_id: jnp.ndarray  # [bs] next-free id counter

    @staticmethod
    def init(bs: int, num_temp: int, num_anchor: int, embed_dims: int):
        return TemporalState(
            feature=jnp.zeros((bs, num_temp, embed_dims), jnp.float32),
            anchor=jnp.zeros((bs, num_temp, box3d.STATE_DIM), jnp.float32),
            confidence=jnp.zeros((bs, num_temp), jnp.float32),
            instance_id=jnp.full((bs, num_anchor), -1, jnp.int32),
            prev_id=jnp.zeros((bs,), jnp.int32),
        )


def topk_gather(confidence: jnp.ndarray, k: int, *inputs):
    """Batched top-k by confidence, gathering companions.

    Equivalent of the reference `topk` helper (instance_bank.py:13-20).
    """
    conf, indices = jax.lax.top_k(confidence, k)
    outs = [
        jnp.take_along_axis(
            x, indices.reshape(indices.shape + (1,) * (x.ndim - 2)), axis=1
        )
        for x in inputs
    ]
    return conf, outs


class InstanceBank:
    """Stateless helper bundling the bank's hyperparameters.

    Learnable parameters (anchors + features) live in the head's param
    tree; this class only implements the pure state-transition functions
    (reference instance_bank.py get/update/cache/get_instance_id).
    """

    def __init__(
        self,
        num_anchor: int = 900,
        num_temp_instances: int = 600,
        embed_dims: int = 256,
        confidence_decay: float = 0.6,
        default_time_interval: float = 0.5,
        max_time_interval: float = 2.0,
    ):
        self.num_anchor = num_anchor
        self.num_temp_instances = num_temp_instances
        self.embed_dims = embed_dims
        self.confidence_decay = confidence_decay
        self.default_time_interval = default_time_interval
        self.max_time_interval = max_time_interval

    def get(
        self,
        anchor_param: jnp.ndarray,  # [A, 11] learnable anchors
        feature_param: jnp.ndarray,  # [A, C] learnable features
        batch_size: int,
        state: Optional[TemporalState],
        time_interval: Optional[jnp.ndarray] = None,  # [bs] seconds
        temp2cur: Optional[jnp.ndarray] = None,  # [bs, 4, 4]
    ):
        """Start-of-frame fetch (reference instance_bank.py:79-119).

        Returns (instance_feature, anchor, temp_feature, temp_anchor,
        time_interval, temp_mask). temp_* are None when state is None
        (cold start). Cached anchors are ego-motion compensated through
        `temp2cur` with velocity back-propagation over -dt.
        """
        instance_feature = jnp.tile(feature_param[None], (batch_size, 1, 1))
        anchor = jnp.tile(anchor_param[None], (batch_size, 1, 1))
        if state is None:
            dt = jnp.full(
                (batch_size,), self.default_time_interval, jnp.float32
            )
            return instance_feature, anchor, None, None, dt, None

        mask = jnp.abs(time_interval) <= self.max_time_interval  # [bs]
        temp_anchor = box3d.anchor_projection(
            state.anchor, temp2cur, -time_interval
        )
        dt = jnp.where(
            (time_interval != 0) & mask,
            time_interval,
            self.default_time_interval,
        )
        return instance_feature, anchor, state.feature, temp_anchor, dt, mask

    def update(
        self,
        instance_feature: jnp.ndarray,  # [bs, A(+dn), C]
        anchor: jnp.ndarray,  # [bs, A(+dn), 11]
        confidence_logits: jnp.ndarray,  # [bs, A(+dn), num_cls]
        temp_feature: jnp.ndarray,  # [bs, T, C] (projected)
        temp_anchor: jnp.ndarray,  # [bs, T, 11]
        temp_mask: jnp.ndarray,  # [bs]
    ):
        """Merge fresh top-(A-T) instances with the cached T
        (reference instance_bank.py:121-150). Handles a trailing DN block
        by leaving it untouched."""
        num_dn = instance_feature.shape[1] - self.num_anchor
        if num_dn > 0:
            dn_feature = instance_feature[:, self.num_anchor :]
            dn_anchor = anchor[:, self.num_anchor :]
            instance_feature = instance_feature[:, : self.num_anchor]
            anchor = anchor[:, : self.num_anchor]
            confidence_logits = confidence_logits[:, : self.num_anchor]

        n = self.num_anchor - self.num_temp_instances
        conf = confidence_logits.max(axis=-1)
        _, (sel_feature, sel_anchor) = topk_gather(
            conf, n, instance_feature, anchor
        )
        sel_feature = jnp.concatenate([temp_feature, sel_feature], axis=1)
        sel_anchor = jnp.concatenate([temp_anchor, sel_anchor], axis=1)
        m = temp_mask[:, None, None]
        instance_feature = jnp.where(m, sel_feature, instance_feature)
        anchor = jnp.where(m, sel_anchor, anchor)

        if num_dn > 0:
            instance_feature = jnp.concatenate(
                [instance_feature, dn_feature], axis=1
            )
            anchor = jnp.concatenate([anchor, dn_anchor], axis=1)
        return instance_feature, anchor

    def cache(
        self,
        instance_feature: jnp.ndarray,  # [bs, A, C] (no DN block)
        anchor: jnp.ndarray,  # [bs, A, 11]
        confidence_logits: jnp.ndarray,  # [bs, A, num_cls]
        state: Optional[TemporalState],
        temp_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[TemporalState, jnp.ndarray]:
        """End-of-frame top-T cache with confidence decay
        (reference instance_bank.py:152-167). Returns (new_state,
        temp_confidence) — the latter feeds `update_instance_id`.

        Gradients are stopped: the reference detaches cached tensors.
        """
        # carried state stays fp32 regardless of head compute dtype so
        # lax.scan carries keep a stable signature
        instance_feature = jax.lax.stop_gradient(instance_feature).astype(
            jnp.float32
        )
        anchor = jax.lax.stop_gradient(anchor).astype(jnp.float32)
        conf = jax.nn.sigmoid(
            jax.lax.stop_gradient(confidence_logits).max(axis=-1)
        ).astype(jnp.float32)  # [bs, A]
        if state is not None:
            decayed = jnp.maximum(
                state.confidence * self.confidence_decay,
                conf[:, : self.num_temp_instances],
            )
            if temp_mask is not None:
                decayed = jnp.where(
                    temp_mask[:, None],
                    decayed,
                    conf[:, : self.num_temp_instances],
                )
            conf = conf.at[:, : self.num_temp_instances].set(decayed)
        temp_confidence = conf
        new_conf, (new_feature, new_anchor) = topk_gather(
            conf, self.num_temp_instances, instance_feature, anchor
        )
        bs = instance_feature.shape[0]
        prev = (
            state
            if state is not None
            else TemporalState.init(
                bs, self.num_temp_instances, self.num_anchor, self.embed_dims
            )
        )
        new_state = prev.replace(
            feature=new_feature, anchor=new_anchor, confidence=new_conf
        )
        return new_state, temp_confidence

    def assign_instance_ids(
        self,
        confidence_logits: jnp.ndarray,  # [bs, A, num_cls]
        state: TemporalState,
        temp_confidence: jnp.ndarray,  # [bs, A] from cache()
        threshold: Optional[float] = None,
        temp_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, TemporalState]:
        """Tracking-id assignment at inference
        (reference instance_bank.py:169-196). Current instances inherit
        stored ids; confident new instances get fresh sequential ids; the
        id table is re-ordered to follow the cached top-T so ids persist
        across frames. Returns (instance_id [bs, A], updated state)."""
        conf = jax.nn.sigmoid(confidence_logits.max(axis=-1))  # [bs, A]
        instance_id = jnp.broadcast_to(
            state.instance_id, conf.shape
        ).astype(jnp.int32)
        if temp_mask is not None:
            # samples whose stream broke lose their ids (instance_bank.py:144)
            instance_id = jnp.where(temp_mask[:, None], instance_id, -1)

        new_mask = instance_id < 0
        if threshold is not None:
            new_mask = new_mask & (conf >= threshold)
        # sequential ids per sample: prev_id + exclusive cumsum over slots
        offsets = jnp.cumsum(new_mask.astype(jnp.int32), axis=1) - 1
        fresh = state.prev_id[:, None] + offsets
        instance_id = jnp.where(new_mask, fresh, instance_id)
        prev_id = state.prev_id + new_mask.sum(axis=1).astype(jnp.int32)

        # keep ids of the cached top-T, pad the rest with -1
        _, (kept,) = topk_gather(
            temp_confidence, self.num_temp_instances, instance_id[..., None]
        )
        kept = kept[..., 0].astype(jnp.int32)
        stored = jnp.concatenate(
            [
                kept,
                jnp.full(
                    (kept.shape[0], self.num_anchor - self.num_temp_instances),
                    -1,
                    jnp.int32,
                ),
            ],
            axis=1,
        )
        return instance_id, state.replace(
            instance_id=stored, prev_id=prev_id
        )
