"""Training step smoke tests: losses finite, params update, DN plumbing."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpb_tpu.configs.base import HeadConfig, ModelConfig, TrainConfig
from simpb_tpu.models.detector import SimPB
from simpb_tpu.training.train_step import (
    build_train_step,
    create_train_state,
    init_temporal,
)

pytestmark = pytest.mark.medium

BS, CAMS, G, G2 = 1, 6, 8, 6
IMG_W, IMG_H = 64, 32


def tiny_config():
    head = HeadConfig(
        embed_dims=64,
        num_groups=4,
        num_anchor=32,
        num_temp_instances=16,
        allocation_capacity=8,
        dn_allocation_capacity=8,
        num_dn_groups=2,
        num_temp_dn_groups=1,
        max_dn_gt=4,
        num_output=16,
    )
    return ModelConfig(
        backbone_remat=False, input_size=(IMG_W, IMG_H), head=head
    )


def make_batch(rng):
    proj = np.zeros((BS, CAMS, 4, 4), np.float32)
    for c in range(CAMS):
        th = 2 * np.pi * c / CAMS
        R = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
             [0, 0, 1]], np.float32,
        )
        K = np.array([[40, 0, 32], [0, 40, 16], [0, 0, 1]], np.float32)
        swap = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = swap @ R
        P = np.eye(4, dtype=np.float32)
        P[:3, :3] = K
        proj[:, c] = P @ ext

    boxes = np.zeros((BS, G, 9), np.float32)
    boxes[..., :2] = rng.uniform(-20, 20, size=(BS, G, 2))
    boxes[..., 2] = 0.5
    boxes[..., 3:6] = rng.uniform(1, 3, size=(BS, G, 3))
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, size=(BS, G))
    valid = np.ones((BS, G), bool)
    valid[:, -2:] = False

    boxes2d = np.zeros((BS, CAMS, G2, 4), np.float32)
    boxes2d[..., 0] = rng.uniform(0, 30, size=(BS, CAMS, G2))
    boxes2d[..., 1] = rng.uniform(0, 15, size=(BS, CAMS, G2))
    boxes2d[..., 2] = boxes2d[..., 0] + rng.uniform(5, 20, (BS, CAMS, G2))
    boxes2d[..., 3] = boxes2d[..., 1] + rng.uniform(5, 10, (BS, CAMS, G2))
    valid2d = rng.uniform(size=(BS, CAMS, G2)) > 0.5

    batch = {
        "img": rng.normal(size=(BS, CAMS, IMG_H, IMG_W, 3)).astype(np.float32),
        "projection_mat": proj,
        "time_interval": np.full((BS,), 0.5, np.float32),
        "temp2cur": np.tile(np.eye(4, dtype=np.float32), (BS, 1, 1)),
        "focal": np.full((BS, CAMS), 40.0, np.float32),
        "gt_boxes3d": boxes,
        "gt_labels3d": rng.integers(0, 10, size=(BS, G)).astype(np.int32),
        "gt_valid3d": valid,
        "gt_instance_id": np.arange(BS * G).reshape(BS, G).astype(np.int32),
        "gt_boxes2d": boxes2d,
        "gt_labels2d": rng.integers(0, 10, (BS, CAMS, G2)).astype(np.int32),
        "gt_alphas2d": rng.uniform(-np.pi, np.pi, (BS, CAMS, G2)).astype(
            np.float32
        ),
        "gt_valid2d": valid2d,
        "gt_vis2d_per3d": rng.uniform(size=(BS, G, CAMS)) > 0.6,
        "gt_boxes2d_per3d": rng.uniform(0, 40, (BS, G, CAMS, 4)).astype(
            np.float32
        ),
        "gt_labels2d_per3d": rng.integers(0, 10, (BS, G, CAMS)).astype(
            np.int32
        ),
        "gt_alphas2d_per3d": rng.uniform(-1, 1, (BS, G, CAMS)).astype(
            np.float32
        ),
    }
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_train_step_uint16_img_wire_matches_bf16():
    """--img-bf16 wire contract (tools/train.py): images arrive as the
    bf16 bit pattern in native uint16 (numpy bfloat16 device_put hangs
    the axon tunnel client — CLAUDE.md) and loss_fn bitcasts in-graph.
    The uint16-wire step must equal the direct-bf16-image step exactly.
    """
    import ml_dtypes

    cfg = tiny_config()
    tc = TrainConfig()
    model = SimPB(cfg)
    rng = np.random.default_rng(3)
    batch = make_batch(rng)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2),
             "sampling": jax.random.PRNGKey(3)},
            batch["img"], batch["projection_mat"], train=True,
        )
    )()
    state = create_train_state(model, variables, tc)
    step = jax.jit(build_train_step(model, tc))
    temporal, dn_state = init_temporal(cfg, BS)
    key = jax.random.PRNGKey(7)

    img_bf16 = np.asarray(batch["img"], np.float32).astype(
        ml_dtypes.bfloat16
    )
    batch_bf16 = dict(batch, img=jnp.asarray(img_bf16))
    batch_wire = dict(batch, img=jnp.asarray(img_bf16.view(np.uint16)))

    _, _, _, m_bf16 = step(state, batch_bf16, temporal, dn_state, key)
    _, _, _, m_wire = step(state, batch_wire, temporal, dn_state, key)
    np.testing.assert_array_equal(
        np.asarray(m_bf16["loss"]), np.asarray(m_wire["loss"])
    )


def test_train_step_runs_and_updates():
    cfg = tiny_config()
    tc = TrainConfig()
    model = SimPB(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2),
             "sampling": jax.random.PRNGKey(3)},
            batch["img"], batch["projection_mat"], train=True,
        )
    )()
    state = create_train_state(model, variables, tc)
    step = jax.jit(build_train_step(model, tc))

    temporal, dn_state = init_temporal(cfg, BS)
    key = jax.random.PRNGKey(42)
    state2, temporal, dn_state, metrics = step(
        state, batch, temporal, dn_state, key
    )
    assert np.isfinite(float(metrics["loss"]))
    # loss keys mirror the reference's per-layer naming
    for k in ["loss_cls3d_0", "loss_box3d_5", "loss_cls2d_2",
              "loss_iou2d_0", "loss_cls3d_dn_3", "loss_box3d_dn_0",
              "loss_cls2d_dn_1", "loss_cns3d_0", "loss_yns3d_5",
              "loss_alpha2d_1"]:
        assert k in metrics, f"missing {k}: {sorted(metrics)[:40]}"
    # params changed (except frozen instance_feature)
    p0 = state.params["head"]["anchor"]
    p1 = state2.params["head"]["anchor"]
    assert float(jnp.abs(p1 - p0).sum()) > 0
    f0 = state.params["head"]["instance_feature"]
    f1 = state2.params["head"]["instance_feature"]
    assert float(jnp.abs(f1 - f0).sum()) == 0  # feat_grad=False

    # second step: streaming with carried temporal + dn state, same
    # compiled program (no retrace)
    state3, temporal, dn_state, metrics2 = step(
        state2, batch, temporal, dn_state, key
    )
    assert np.isfinite(float(metrics2["loss"]))
    assert dn_state is not None
    assert step._cache_size() == 1
    # temporal dn losses appear from layer num_single_frame_decoder on
    assert "loss_cls3d_dn_1" in metrics2
