"""Packed multi-camera multi-scale feature layout.

The reference packs per-level FPN maps `[bs, cams, C, H, W]` into a flat
column tensor consumed by the fused CUDA kernel
(reference projects/mmdet3d_plugin/ops/__init__.py:22-92). The TPU-native
equivalent keeps the camera axis explicit and channels last —
`[bs, cams, sum(H*W), C]` — and carries the per-level spatial shapes as
*static* Python metadata instead of device tensors, so every downstream
shape is known at trace time.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import jax.numpy as jnp


@dataclass(frozen=True)
class SpatialShapes:
    """Static per-level (H, W) metadata for a packed feature column."""

    shapes: Tuple[Tuple[int, int], ...]

    @property
    def num_levels(self) -> int:
        return len(self.shapes)

    @property
    def sizes(self) -> Tuple[int, ...]:
        return tuple(h * w for h, w in self.shapes)

    @property
    def start_indices(self) -> Tuple[int, ...]:
        starts = []
        acc = 0
        for s in self.sizes:
            starts.append(acc)
            acc += s
        return tuple(starts)

    @property
    def total(self) -> int:
        return sum(self.sizes)


def pack_feature_maps(
    feature_maps: Sequence[jnp.ndarray],
) -> tuple[jnp.ndarray, SpatialShapes]:
    """Pack per-level `[bs, cams, H, W, C]` maps into `[bs, cams, ΣHW, C]`.

    Counterpart of the reference `feature_maps_format`
    (ops/__init__.py:63-92), with channels-last layout and static shapes.
    """
    shapes = tuple((f.shape[2], f.shape[3]) for f in feature_maps)
    bs, cams = feature_maps[0].shape[:2]
    cols = [f.reshape(bs, cams, -1, f.shape[-1]) for f in feature_maps]
    return jnp.concatenate(cols, axis=2), SpatialShapes(shapes)


def unpack_feature_maps(
    col_feats: jnp.ndarray, spatial_shapes: SpatialShapes
) -> list[jnp.ndarray]:
    """Inverse of :func:`pack_feature_maps` (ops/__init__.py:22-54)."""
    bs, cams, _, c = col_feats.shape
    out = []
    for (h, w), start, size in zip(
        spatial_shapes.shapes,
        spatial_shapes.start_indices,
        spatial_shapes.sizes,
    ):
        out.append(col_feats[:, :, start : start + size].reshape(bs, cams, h, w, c))
    return out
