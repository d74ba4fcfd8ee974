#!/usr/bin/env python
"""Measure patch-mode MSDA end-to-end deviation vs exact sampling.

Runs the full production-scale SimPB head twice on identical params and
inputs — exact `msda` vs `msda_patch` — under trained-scale sampling
offset distributions (offset std sigma px on top of the mmcv grid init),
and reports box/score deviation statistics. Used to pin the bounds in
tests/test_msda_patch_e2e.py (VERDICT round 1, weak #5).

Usage: JAX_PLATFORMS=cpu python tools/patch_accuracy.py [sigma_px ...]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses
import json

import jax.numpy as jnp
import numpy as np


def build(head_cfg, patch, patch_hw=(8, 8)):
    from simpb_tpu.models.head import SimPBHead

    cfg = dataclasses.replace(
        head_cfg, msda_patch_mode=patch, msda_patch_hw=tuple(patch_hw)
    )
    return SimPBHead(cfg, dtype=jnp.float32)


def make_features(rng, shapes, num_cams, embed_dims, smooth_px: float):
    """Per-level feature columns; `smooth_px` > 0 low-pass filters the
    noise to the spatial correlation length of real FPN maps (white
    noise is an adversarial worst case for any sampling approximation —
    neighbouring pixels are uncorrelated)."""
    from scipy.ndimage import gaussian_filter

    cols = []
    for hh, ww in shapes:
        f = rng.normal(size=(num_cams, hh, ww, embed_dims)).astype(
            np.float32
        )
        if smooth_px > 0:
            f = gaussian_filter(f, sigma=(0, smooth_px, smooth_px, 0))
            f /= f.std() + 1e-9
        cols.append(f.reshape(num_cams, hh * ww, embed_dims))
    return np.concatenate(cols, axis=1)[None]


def run_pair(
    sigma_px: float, seed: int = 0, input_size=(704, 256),
    smooth_px: float = 0.0, patch_hw=(8, 8),
):
    from simpb_tpu.configs.base import simpb_r50_704x256
    from simpb_tpu.models.decoder3d import decode_boxes3d
    from simpb_tpu.ops.format import SpatialShapes
    from simpb_tpu.utils.synthetic import synthetic_anchors, synthetic_rig

    cfg = simpb_r50_704x256()
    hc = cfg.head
    w, h = input_size
    shapes = tuple((h // s, w // s) for s in cfg.strides)
    ss = SpatialShapes(shapes=shapes)
    total_hw = sum(a * b for a, b in shapes)

    rng = np.random.default_rng(seed)
    bs = 1
    col_feats = jnp.asarray(
        make_features(rng, shapes, hc.num_cams, hc.embed_dims, smooth_px)
    )
    proj = jnp.asarray(synthetic_rig(bs, image_wh=input_size))

    head_exact = build(hc, False)
    variables = head_exact.init(
        {"params": jax.random.PRNGKey(seed)},
        col_feats, ss, proj, input_size,
    )
    params = variables["params"]
    params["anchor"] = jnp.asarray(synthetic_anchors(hc.num_anchor, seed))

    # trained-scale sampling offsets: the zeros-kernel init leaves offsets
    # at the +-num_points px grid bias; real training adds query-dependent
    # spread. Model it as kernel ~ N(0, sigma_px/sqrt(embed)) so the
    # per-query offset std is ~sigma_px (the MSDA input is LayerNorm'd).
    scale = sigma_px / np.sqrt(hc.embed_dims)
    for name, p in params.items():
        if "qg_cross_attn" in name:
            k = p["sampling_offsets"]["kernel"]
            p["sampling_offsets"]["kernel"] = jnp.asarray(
                rng.normal(size=k.shape).astype(np.float32) * scale
            )
            ka = p["attention_weights"]["kernel"]
            p["attention_weights"]["kernel"] = jnp.asarray(
                rng.normal(size=ka.shape).astype(np.float32)
                / np.sqrt(hc.embed_dims)
            )

    head_patch = build(hc, True, patch_hw)

    def fwd(head):
        out = head.apply(
            {"params": params}, col_feats, ss, proj, input_size, train=False
        )
        dec = decode_boxes3d(
            out["classification"][-1],
            out["prediction"][-1],
            quality=out["quality"][-1],
            num_output=hc.num_output,
            score_threshold=hc.score_threshold,
        )
        return (
            out["classification"][-1],
            out["prediction"][-1],
            dec["boxes_3d"],
            dec["scores_3d"],
            [p for p in out["prediction2d"]],
        )

    ce, pe, be, se, p2e = jax.jit(lambda: fwd(head_exact))()
    cp, pp, bp, sp, p2p = jax.jit(lambda: fwd(head_patch))()

    sig = jax.nn.sigmoid
    # rank stability of per-anchor max class prob (what mAP ranking and
    # the top-num_output decode actually consume)
    from scipy.stats import spearmanr

    conf_e = np.asarray(sig(ce).max(-1)[0])
    conf_p = np.asarray(sig(cp).max(-1)[0])
    rank_corr = float(spearmanr(conf_e, conf_p).statistic)
    k = 300
    top_e = set(np.argsort(-conf_e)[:k].tolist())
    top_p = set(np.argsort(-conf_p)[:k].tolist())

    stats = {
        "sigma_px": sigma_px,
        "smooth_px": smooth_px,
        "patch_hw": list(patch_hw),
        "cls_prob_mean_abs": float(jnp.abs(sig(ce) - sig(cp)).mean()),
        "cls_prob_max_abs": float(jnp.abs(sig(ce) - sig(cp)).max()),
        "center_mean_abs_m": float(
            jnp.abs(pe[..., :3] - pp[..., :3]).mean()
        ),
        "center_p99_abs_m": float(
            jnp.percentile(jnp.abs(pe[..., :3] - pp[..., :3]), 99)
        ),
        "score_mean_abs": float(jnp.abs(se - sp).mean()),
        "score_rank_corr": rank_corr,
        "top300_overlap": len(top_e & top_p) / k,
        "box2d_mean_abs": float(
            sum(jnp.abs(a - b).mean() for a, b in zip(p2e, p2p))
            / len(p2e)
        ),
    }
    return stats


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("sigmas", nargs="*", type=float,
                    default=[0.0, 1.0, 2.0, 4.0])
    ap.add_argument("--hw", type=int, nargs=2, default=[8, 8],
                    help="MSDA patch window (H, W) — height first, "
                         "matching HeadConfig.msda_patch_hw; NOT an "
                         "image size")
    ap.add_argument("--smooth", type=float, nargs="*", default=[0.0, 2.0])
    args = ap.parse_args()
    for s in args.sigmas:
        for smooth in args.smooth:
            print(json.dumps(run_pair(
                s, smooth_px=smooth, patch_hw=tuple(args.hw)
            )), flush=True)
