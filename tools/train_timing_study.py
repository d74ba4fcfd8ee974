"""Training-throughput study: s/step at the flagship fast config under
remat variations (backbone_remat on/off), bs=4 and bs=2.

`backbone_remat=True` mirrors the reference's `with_cp=True`
(config:86) and trades a second backbone forward in the backward pass
for activation memory. On a 16G v5e chip the fast config may not need
that trade — this study measures it. Methodology: distinct batches per
step (training state changes each step so the tunnel cache cannot
serve repeats), warm 2 steps, time the next N by fetching the loss.

MEASURED (v5e, solo host): bs=4 remat-on 1.33 / remat-off 2.12 s/step;
bs=2 1.42 / 1.45. Remat ON is strictly better: without it the bs=4
activation footprint pressures HBM enough that XLA's schedule loses
far more than the recompute costs. Keep `backbone_remat=True` (also
reference parity). CAVEAT on absolute numbers: each host-loop step
ships the batch through the axon tunnel (bs=4: ~52 MB of images), so
these include ~0.9-1.0 s/step of transfer+dispatch the on-device
pipeline does not pay — PERF.md's 0.42 s/step (device-resident data)
is the real per-chip cost; use this study for A/B deltas only.
"""
import dataclasses, json, os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax, numpy as np
from simpb_tpu.configs.base import TrainConfig, simpb_r50_704x256_fast
from simpb_tpu.models.detector import SimPB
from simpb_tpu.training.train_step import (
    build_train_step, create_train_state, init_temporal)
from simpb_tpu.utils.synthetic import synthetic_rig
import jax.numpy as jnp

STEPS = 10
G, G2 = 32, 24


def batch_for(i, bs, cams, h, w, proj):
    r = np.random.default_rng(i)
    return {k: jnp.asarray(v) for k, v in {
        "img": r.normal(size=(bs, cams, h, w, 3)).astype(np.float32),
        "projection_mat": np.asarray(proj, np.float32),
        "time_interval": np.full((bs,), 0.5, np.float32),
        "temp2cur": np.tile(np.eye(4, dtype=np.float32), (bs, 1, 1)),
        "focal": np.full((bs, cams), 400.0, np.float32),
        "gt_boxes3d": (r.normal(size=(bs, G, 9)) * 5).astype(np.float32),
        "gt_labels3d": r.integers(0, 10, (bs, G)).astype(np.int32),
        "gt_valid3d": np.ones((bs, G), bool),
        "gt_instance_id": (np.arange(bs * G).reshape(bs, G)
                           + i * 100).astype(np.int32),
        "gt_boxes2d": r.uniform(0, 200, (bs, cams, G2, 4)).astype(np.float32),
        "gt_labels2d": r.integers(0, 10, (bs, cams, G2)).astype(np.int32),
        "gt_alphas2d": r.uniform(-3, 3, (bs, cams, G2)).astype(np.float32),
        "gt_valid2d": r.uniform(size=(bs, cams, G2)) > 0.5,
        "gt_vis2d_per3d": r.uniform(size=(bs, G, cams)) > 0.6,
        "gt_boxes2d_per3d": r.uniform(0, 200, (bs, G, cams, 4)).astype(
            np.float32),
        "gt_labels2d_per3d": r.integers(0, 10, (bs, G, cams)).astype(
            np.int32),
        "gt_alphas2d_per3d": r.uniform(-1, 1, (bs, G, cams)).astype(
            np.float32),
    }.items()}


def run(bs, backbone_remat):
    cfg = dataclasses.replace(
        simpb_r50_704x256_fast(),
        compute_dtype="bfloat16", head_dtype="bfloat16",
        backbone_remat=backbone_remat,
    )
    tc = TrainConfig()
    model = SimPB(cfg)
    cams = cfg.head.num_cams
    w, h = cfg.input_size
    proj = synthetic_rig(bs, image_wh=(w, h))
    b0 = batch_for(0, bs, cams, h, w, proj)
    rngs = {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2),
            "sampling": jax.random.PRNGKey(3)}
    variables = jax.jit(
        lambda: model.init(rngs, b0["img"], b0["projection_mat"], train=True)
    )()
    state = create_train_state(model, variables, tc)
    step = jax.jit(build_train_step(model, tc), donate_argnums=(0,))
    temporal, dn = init_temporal(cfg, bs)
    key = jax.random.PRNGKey(42)
    try:
        for i in range(2):  # warm: two compiles (weak-type state change)
            state, temporal, dn, m = step(
                state, batch_for(i, bs, cams, h, w, proj), temporal, dn, key)
        float(m["loss"])
        batches = [batch_for(10 + i, bs, cams, h, w, proj)
                   for i in range(STEPS)]
        t0 = time.perf_counter()
        for b in batches:
            state, temporal, dn, m = step(state, b, temporal, dn, key)
        last = float(m["loss"])  # fetch = sync
        dt = (time.perf_counter() - t0) / STEPS
        print(json.dumps({"bs": bs, "backbone_remat": backbone_remat,
                          "s_per_step": round(dt, 4),
                          "loss": round(last, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"bs": bs, "backbone_remat": backbone_remat,
                          "error": f"{type(e).__name__}: {str(e)[:160]}"}),
              flush=True)


if __name__ == "__main__":
    for bs in (4, 2):
        for br in (True, False):
            run(bs, br)
