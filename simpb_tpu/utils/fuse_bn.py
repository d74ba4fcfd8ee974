"""Conv + BatchNorm folding for inference.

Equivalent of reference tools/fuse_conv_bn.py:10-48. The backbone convs
are bias-free, so the fold keeps the module structure: the conv kernel
absorbs `scale / sqrt(var + eps)` and the BatchNorm collapses to a pure
bias add (stats mean 0 / var 1, scale 1) — after folding the BN is a
single vector add instead of a normalisation.
"""
from __future__ import annotations

import copy
from typing import Dict, Tuple

import numpy as np

CONV_BN_PAIRS = (
    ("conv1", "bn1"),
    ("conv2", "bn2"),
    ("conv3", "bn3"),
    ("downsample_conv", "downsample_bn"),
)


def _fold_pair(conv: Dict, bn: Dict, stats: Dict, eps: float = 1e-5):
    kernel = np.asarray(conv["kernel"])  # [kh, kw, in, out]
    scale = np.asarray(bn["scale"])
    bias = np.asarray(bn["bias"])
    mean = np.asarray(stats["mean"])
    var = np.asarray(stats["var"])
    factor = (scale / np.sqrt(var + eps)).astype(kernel.dtype)
    conv["kernel"] = kernel * factor[None, None, None, :]
    bn["scale"] = np.ones_like(scale)
    bn["bias"] = (bias - mean * factor).astype(bias.dtype)
    stats["mean"] = np.zeros_like(mean)
    stats["var"] = np.ones_like(var) * (1.0 - eps)


def fuse_backbone_bn(params: Dict, batch_stats: Dict) -> Tuple[Dict, Dict]:
    """Returns (fused_params, fused_batch_stats); numerically identical
    inference, with every backbone BN reduced to a bias add."""
    params = copy.deepcopy(params)
    batch_stats = copy.deepcopy(batch_stats)
    bb = params.get("img_backbone", {})
    bb_stats = batch_stats.get("img_backbone", {})

    if "conv1" in bb and "bn1" in bb:
        _fold_pair(bb["conv1"], bb["bn1"], bb_stats["bn1"])
    for mod_name, mod in bb.items():
        if not isinstance(mod, dict) or not mod_name.startswith("layer"):
            continue
        st_mod = bb_stats.get(mod_name, {})
        for conv_name, bn_name in CONV_BN_PAIRS:
            if conv_name in mod and bn_name in mod:
                _fold_pair(mod[conv_name], mod[bn_name], st_mod[bn_name])
    return params, batch_stats
