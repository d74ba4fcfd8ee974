"""Compiled peak-HBM of the production train step (bs 4, r50-fast).

VERDICT r4 item 4 asks for the bs-4 TRAINING peak alongside the
serving peaks. The tunnel device exposes no runtime memory_stats, so
this AOT-compiles the real train step (no execution) and reads XLA's
memory_analysis — the HBM the program reserves (PERF.md round-5).

Usage: python tools/train_memory_probe.py [--config r50-fast] [--bs 4]
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="r50-fast",
                   choices=["r50", "r50-fast", "tiny"])
    p.add_argument("--bs", type=int, default=4)
    args = p.parse_args()

    from simpb_tpu.configs.base import (
        TrainConfig, simpb_r50_704x256, simpb_r50_704x256_fast,
        simpb_tiny,
    )
    from simpb_tpu.models.detector import SimPB
    from simpb_tpu.training.train_step import (
        build_train_step, create_train_state, init_temporal,
    )
    from simpb_tpu.utils.synthetic import synthetic_rig

    cfg = {"r50": simpb_r50_704x256, "r50-fast": simpb_r50_704x256_fast,
           "tiny": simpb_tiny}[args.config]()
    cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    tc = TrainConfig(batch_size=args.bs)
    model = SimPB(cfg)
    bs, cams, (w, h) = args.bs, 6, cfg.input_size
    g = g2 = 8
    rng = np.random.default_rng(0)
    proj = jnp.asarray(synthetic_rig(bs, image_wh=(w, h)))
    batch = {
        "img": jnp.zeros((bs, cams, h, w, 3), jnp.float32),
        "projection_mat": proj,
        "time_interval": jnp.full((bs,), 0.5),
        "temp2cur": jnp.tile(jnp.eye(4)[None], (bs, 1, 1)),
        "focal": jnp.full((bs, cams), float(np.asarray(proj)[0, 0, 0, 0])),
        "gt_boxes3d": jnp.zeros((bs, g, 9)),
        "gt_labels3d": jnp.zeros((bs, g), jnp.int32),
        "gt_valid3d": jnp.ones((bs, g), bool),
        "gt_instance_id": jnp.tile(jnp.arange(g, dtype=jnp.int32)[None],
                                   (bs, 1)),
        "gt_boxes2d": jnp.zeros((bs, cams, g2, 4)),
        "gt_labels2d": jnp.zeros((bs, cams, g2), jnp.int32),
        "gt_alphas2d": jnp.zeros((bs, cams, g2)),
        "gt_valid2d": jnp.ones((bs, cams, g2), bool),
        "gt_vis2d_per3d": jnp.ones((bs, g, cams), bool),
        "gt_boxes2d_per3d": jnp.zeros((bs, g, cams, 4)),
        "gt_labels2d_per3d": jnp.zeros((bs, g, cams), jnp.int32),
        "gt_alphas2d_per3d": jnp.zeros((bs, g, cams)),
    }
    variables = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "aug": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2),
             "sampling": jax.random.PRNGKey(3)},
            batch["img"], proj, train=True,
        )
    )
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables
    )
    state = create_train_state(model, variables, tc)
    temporal, dn_state = init_temporal(cfg, bs)
    step = jax.jit(build_train_step(model, tc), donate_argnums=(0, 2, 3))
    compiled = step.lower(
        state, batch, temporal, dn_state, jax.random.PRNGKey(0)
    ).compile()
    ma = compiled.memory_analysis()
    peak = getattr(ma, "peak_memory_in_bytes", None)
    print({
        "config": args.config, "batch_size": args.bs,
        "train_peak_hbm_gib": round(peak / 2**30, 3) if peak else None,
        "argument_gib": round(ma.argument_size_in_bytes / 2**30, 3),
        "temp_gib": round(ma.temp_size_in_bytes / 2**30, 3),
    })


if __name__ == "__main__":
    main()
