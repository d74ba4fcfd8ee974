"""Training-stability study: 300 steps at the flagship fast config (bs=2).

Extends the 60-step round-2 evidence (PERF.md): loss stays finite and
plateaus on random synthetic data; temporal + DN state threaded
throughout. 30 distinct batches cycled (training state changes every
step, so the tunnel result cache cannot serve repeats)."""
import dataclasses, json, os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax, numpy as np
from simpb_tpu.configs.base import TrainConfig, simpb_r50_704x256_fast
from simpb_tpu.models.detector import SimPB
from simpb_tpu.training.train_step import (
    build_train_step, create_train_state, init_temporal)
from simpb_tpu.utils.synthetic import synthetic_rig
import jax.numpy as jnp

bs = 2
cfg = dataclasses.replace(simpb_r50_704x256_fast(),
                          compute_dtype="bfloat16", head_dtype="bfloat16")
tc = TrainConfig()
model = SimPB(cfg)
cams = cfg.head.num_cams
w, h = cfg.input_size
G, G2 = 32, 24
proj = synthetic_rig(bs, image_wh=(w, h))

def batch_for(i):
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
        "gt_instance_id": (np.arange(bs * G).reshape(bs, G) + i * 100).astype(np.int32),
        "gt_boxes2d": r.uniform(0, 200, (bs, cams, G2, 4)).astype(np.float32),
        "gt_labels2d": r.integers(0, 10, (bs, cams, G2)).astype(np.int32),
        "gt_alphas2d": r.uniform(-3, 3, (bs, cams, G2)).astype(np.float32),
        "gt_valid2d": np.ones((bs, cams, G2), bool),
        "gt_vis2d_per3d": r.uniform(size=(bs, G, cams)) > 0.5,
        "gt_boxes2d_per3d": r.uniform(0, 200, (bs, G, cams, 4)).astype(np.float32),
        "gt_labels2d_per3d": r.integers(0, 10, (bs, G, cams)).astype(np.int32),
        "gt_alphas2d_per3d": r.uniform(-1, 1, (bs, G, cams)).astype(np.float32),
    }.items()}

batches = [batch_for(i) for i in range(30)]
b0 = batches[0]
variables = jax.jit(lambda: model.init(
    {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1),
     "dropout": jax.random.PRNGKey(2), "sampling": jax.random.PRNGKey(3)},
    b0["img"], b0["projection_mat"], train=True))()
state = create_train_state(model, variables, tc)
step = jax.jit(build_train_step(model, tc), donate_argnums=(0,))
temporal, dn_state = init_temporal(cfg, bs)
key = jax.random.PRNGKey(7)
losses = []
t0 = time.time()
for i in range(300):
    state, temporal, dn_state, metrics = step(
        state, batches[i % 30], temporal, dn_state,
        jax.random.fold_in(key, i))
    if i % 20 == 19 or i < 2:
        l = float(metrics["loss"])
        losses.append((i, round(l, 2)))
        print(f"step {i}: loss={l:.2f}", flush=True)
print(json.dumps({"losses": losses,
                  "finite": all(np.isfinite(l) for _, l in losses),
                  "elapsed_s": round(time.time() - t0, 1)}), flush=True)
