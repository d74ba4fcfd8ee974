"""AOT serving export: a self-contained, weights-baked artifact.

Wraps the streaming inference step (backbone -> head -> decode) with
`jax.export`: the result is a serialized StableHLO program with the
trained weights embedded as constants, loadable and runnable WITHOUT
any model code — the TPU-native analogue of the torch->ONNX/TensorRT
deployment path the reference leaves to downstream users (its
tools/benchmark.py times the eager torch model only).

The artifact's calling convention uses ONLY standard containers: the
TemporalState pytree is flattened to a 5-tuple at the boundary
(feature, anchor, confidence, instance_id, prev_id), so deserializers
need no custom pytree registrations.

Artifact signature:
  (img [bs,cams,H,W,3] f32, projection_mat [bs,cams,4,4] f32,
   time_interval [bs] f32, temp2cur [bs,4,4] f32, temporal 5-tuple)
  -> {"boxes": [bs,K,10], "scores": [bs,K], "labels": [bs,K],
      "cls_scores": [bs,K], "instance_ids": [bs,K],
      "temporal": 5-tuple}
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from ..configs.base import ModelConfig
from ..models.decoder3d import decode_boxes3d
from ..models.detector import SimPB
from ..models.instance_bank import TemporalState

TEMPORAL_FIELDS = (
    "feature", "anchor", "confidence", "instance_id", "prev_id"
)


def temporal_to_tuple(state: TemporalState) -> Tuple:
    return tuple(getattr(state, f) for f in TEMPORAL_FIELDS)


def tuple_to_temporal(leaves: Tuple) -> TemporalState:
    return TemporalState(**dict(zip(TEMPORAL_FIELDS, leaves)))


def make_serving_fn(cfg: ModelConfig, variables):
    """Closure over weights: the streaming step + fixed-shape decode."""
    model = SimPB(cfg)
    hc = cfg.head

    def serve(img, projection_mat, time_interval, temp2cur, temporal):
        state = tuple_to_temporal(temporal)
        out = model.apply(
            variables, img, projection_mat, temporal=state,
            time_interval=time_interval, temp2cur=temp2cur, train=False,
        )
        new_state = out["temporal_state"]
        det = decode_boxes3d(
            out["classification"][-1],
            out["prediction"][-1],
            instance_id=new_state.instance_id,
            quality=(out["quality"][-1] if out.get("quality") else None),
            num_output=hc.num_output,
            score_threshold=hc.score_threshold,
        )
        return {
            "boxes": det["boxes_3d"],
            "scores": det["scores_3d"],
            "labels": det["labels_3d"],
            "cls_scores": det["cls_scores"],
            "valid": det["valid"],
            "instance_ids": det["instance_ids"],
            "temporal": temporal_to_tuple(new_state),
        }

    return serve


def example_inputs(cfg: ModelConfig, batch_size: int = 1):
    """ShapeDtypeStructs matching the artifact signature."""
    hc = cfg.head
    w, h = cfg.input_size
    cams = hc.num_cams
    f32 = jnp.float32
    sds = jax.ShapeDtypeStruct
    temporal = TemporalState.init(
        batch_size, hc.num_temp_instances, hc.num_anchor, hc.embed_dims
    )
    return (
        sds((batch_size, cams, h, w, 3), f32),
        sds((batch_size, cams, 4, 4), f32),
        sds((batch_size,), f32),
        sds((batch_size, 4, 4), f32),
        tuple(
            sds(x.shape, x.dtype) for x in temporal_to_tuple(temporal)
        ),
    )


def export_serving(
    cfg: ModelConfig,
    variables,
    batch_size: int = 1,
    platforms: Optional[Tuple[str, ...]] = None,
) -> bytes:
    """Serialize the AOT-compiled streaming step (weights embedded)."""
    serve = make_serving_fn(cfg, variables)
    exported = jax_export.export(
        jax.jit(serve),
        platforms=list(platforms) if platforms else None,
    )(*example_inputs(cfg, batch_size))
    return exported.serialize()


@dataclasses.dataclass
class ServingModel:
    """Host-side convenience wrapper over a deserialized artifact."""

    exported: "jax_export.Exported"

    @classmethod
    def load(cls, data: bytes) -> "ServingModel":
        return cls(jax_export.deserialize(bytearray(data)))

    def init_temporal(self, batch_size, num_temp, num_anchor, embed):
        return temporal_to_tuple(
            TemporalState.init(batch_size, num_temp, num_anchor, embed)
        )

    def __call__(self, img, projection_mat, time_interval, temp2cur,
                 temporal):
        return self.exported.call(
            img, projection_mat, time_interval, temp2cur, temporal
        )
