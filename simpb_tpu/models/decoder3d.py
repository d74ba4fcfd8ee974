"""3D box decoding / top-k post-processing (device part).

TPU-native `SparseBox3DDecoder` (reference detection3d/decoder.py:10-122):
sigmoid scores, top-`num_output`, optional quality(centerness) reweighted
re-sort, box decode. All outputs are fixed-shape with a validity mask
instead of ragged per-sample filtering; the ragged 2D association of
`decode_with2d` (decoder.py:124-252) happens on host
(simpb_tpu/data/postprocess.py) from the fixed-shape tensors returned
here.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..core import box3d
from ..core.box3d import CNS


def decode_boxes3d(
    cls_scores: jnp.ndarray,  # [bs, A, num_cls] logits (last decoder layer)
    box_preds: jnp.ndarray,  # [bs, A, 11]
    instance_id: Optional[jnp.ndarray] = None,  # [bs, A]
    quality: Optional[jnp.ndarray] = None,  # [bs, A, 2]
    num_output: int = 300,
    score_threshold: Optional[float] = None,
) -> Dict[str, jnp.ndarray]:
    """Returns fixed-shape top-k detections per sample.

    Keys: boxes_3d [bs,K,10] (decoded), scores_3d [bs,K], labels_3d
    [bs,K], valid [bs,K] (score-threshold mask), cls_scores [bs,K]
    (pre-quality scores), instance_ids [bs,K] (when tracking),
    anchor_idx [bs,K] (index into the query set, used for host-side 2D
    association).
    """
    scores = jax.nn.sigmoid(cls_scores)
    bs, num_pred, num_cls = scores.shape
    squeeze_cls = instance_id is not None

    if squeeze_cls:
        cls_ids_full = jnp.argmax(scores, axis=-1)  # [bs, A]
        flat_scores = scores.max(axis=-1)  # [bs, A]
        topk_scores, indices = jax.lax.top_k(flat_scores, num_output)
        anchor_idx = indices
        labels = jnp.take_along_axis(cls_ids_full, anchor_idx, axis=1)
    else:
        flat_scores = scores.reshape(bs, num_pred * num_cls)
        topk_scores, indices = jax.lax.top_k(flat_scores, num_output)
        anchor_idx = indices // num_cls
        labels = indices % num_cls

    valid = (
        topk_scores >= score_threshold
        if score_threshold is not None
        else jnp.ones_like(topk_scores, dtype=bool)
    )

    cls_scores_origin = topk_scores
    if quality is not None:
        centerness = jnp.take_along_axis(quality[..., CNS], anchor_idx, axis=1)
        reweighted = topk_scores * jax.nn.sigmoid(centerness)
        order = jnp.argsort(-reweighted, axis=1)
        topk_scores = jnp.take_along_axis(reweighted, order, axis=1)
        cls_scores_origin = jnp.take_along_axis(cls_scores_origin, order, axis=1)
        labels = jnp.take_along_axis(labels, order, axis=1)
        valid = jnp.take_along_axis(valid, order, axis=1)
        anchor_idx = jnp.take_along_axis(anchor_idx, order, axis=1)

    boxes = jnp.take_along_axis(box_preds, anchor_idx[..., None], axis=1)
    out = {
        "boxes_3d": box3d.decode_box(boxes),
        "scores_3d": topk_scores,
        "labels_3d": labels,
        "cls_scores": cls_scores_origin,
        "valid": valid,
        "anchor_idx": anchor_idx,
    }
    if instance_id is not None:
        out["instance_ids"] = jnp.take_along_axis(instance_id, anchor_idx, axis=1)
    return out
