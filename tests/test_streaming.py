"""Streaming semantics: lax.scan rollout == per-step host loop.

The throughput benchmark and any production serving loop run the
temporal stream as a device-side `lax.scan`; evaluation runs it as a
host loop. Both must traverse the exact same state machine.
"""
import jax
import jax.numpy as jnp
import numpy as np

from simpb_tpu.configs.base import HeadConfig, ModelConfig
from simpb_tpu.models.detector import SimPB
from simpb_tpu.models.instance_bank import TemporalState
import pytest

pytestmark = pytest.mark.medium

BS, CAMS, T = 1, 6, 3
IMG_W, IMG_H = 64, 32


def build():
    head = HeadConfig(
        embed_dims=64, num_groups=4, num_anchor=32, num_temp_instances=16,
        allocation_capacity=8, num_output=8,
    )
    cfg = ModelConfig(backbone_remat=False, input_size=(IMG_W, IMG_H),
                      head=head)
    model = SimPB(cfg)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.normal(size=(T, BS, CAMS, IMG_H, IMG_W, 3)).astype(np.float32)
    )
    proj = np.zeros((BS, CAMS, 4, 4), np.float32)
    for c in range(CAMS):
        th = 2 * np.pi * c / CAMS
        R = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
             [0, 0, 1]], np.float32)
        K = np.array([[40, 0, 32], [0, 40, 16], [0, 0, 1]], np.float32)
        swap = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = swap @ R
        P = np.eye(4, dtype=np.float32)
        P[:3, :3] = K
        proj[:, c] = P @ ext
    proj = jnp.asarray(proj)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2),
             "sampling": jax.random.PRNGKey(3)},
            imgs[0], proj, train=False,
        )
    )()
    return cfg, model, variables, imgs, proj


def test_scan_rollout_matches_host_loop():
    cfg, model, variables, imgs, proj = build()
    dt = jnp.full((BS,), 0.5)
    t2c = jnp.tile(jnp.eye(4)[None], (BS, 1, 1))
    state0 = TemporalState.init(
        BS, cfg.head.num_temp_instances, cfg.head.num_anchor,
        cfg.head.embed_dims,
    )

    @jax.jit
    def step(v, img, st):
        out = model.apply(
            v, img, proj, temporal=st, time_interval=dt, temp2cur=t2c,
            train=False,
        )
        return out["prediction"][-1], out["temporal_state"]

    # host loop
    st = state0
    host_preds = []
    for t in range(T):
        pred, st = step(variables, imgs[t], st)
        host_preds.append(np.asarray(pred))

    # device scan
    @jax.jit
    def rollout(v, imgs, st):
        def body(carry, img):
            pred, ns = step(v, img, carry)
            return ns, pred
        return jax.lax.scan(body, st, imgs)

    final, preds = rollout(variables, imgs, state0)
    preds = np.asarray(preds)
    for t in range(T):
        np.testing.assert_allclose(
            preds[t], host_preds[t], atol=1e-5, rtol=1e-5
        )
    # final state matches host-loop state
    np.testing.assert_allclose(
        np.asarray(final.confidence), np.asarray(st.confidence), atol=1e-5
    )
