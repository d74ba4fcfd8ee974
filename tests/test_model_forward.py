"""End-to-end forward smoke tests on a tiny configuration.

Covers: cold-start frame, streaming frame with temporal state, decoder
postprocess, and jit-compilability of the full step.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpb_tpu.configs.base import HeadConfig, ModelConfig
from simpb_tpu.models.decoder3d import decode_boxes3d
from simpb_tpu.models.detector import SimPB
from simpb_tpu.models.instance_bank import TemporalState

pytestmark = pytest.mark.heavy

BS, CAMS = 2, 6
IMG_W, IMG_H = 64, 32


def tiny_config():
    head = HeadConfig(
        embed_dims=64,
        num_groups=4,
        num_anchor=32,
        num_temp_instances=16,
        allocation_capacity=8,
        num_output=16,
    )
    return ModelConfig(
        backbone_depth=50,
        backbone_remat=False,
        input_size=(IMG_W, IMG_H),
        head=head,
    )


def make_inputs(rng):
    img = rng.normal(size=(BS, CAMS, IMG_H, IMG_W, 3)).astype(np.float32)
    # plausible pinhole projections looking outward
    proj = np.zeros((BS, CAMS, 4, 4), np.float32)
    for c in range(CAMS):
        th = 2 * np.pi * c / CAMS
        R = np.array(
            [
                [np.cos(th), -np.sin(th), 0],
                [np.sin(th), np.cos(th), 0],
                [0, 0, 1],
            ],
            np.float32,
        )
        K = np.array(
            [[40, 0, IMG_W / 2], [0, 40, IMG_H / 2], [0, 0, 1]], np.float32
        )
        # camera looks along +x after rotation: build lidar->img
        ext = np.eye(4, dtype=np.float32)
        swap = np.array(
            [[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32
        )  # x-forward -> z-forward
        ext[:3, :3] = swap @ R
        P = np.eye(4, dtype=np.float32)
        P[:3, :3] = K
        proj[:, c] = (P @ ext)[None]
    return jnp.asarray(img), jnp.asarray(proj)


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = tiny_config()
    model = SimPB(cfg)
    rng = np.random.default_rng(0)
    img, proj = make_inputs(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2), "sampling": jax.random.PRNGKey(3)},
        img, proj, train=False,
    )
    return cfg, model, variables, img, proj


def test_cold_start_forward(model_and_vars):
    cfg, model, variables, img, proj = model_and_vars
    out = model.apply(variables, img, proj, train=False)
    A = cfg.head.num_anchor
    assert len(out["prediction"]) == 6
    assert out["prediction"][-1].shape == (BS, A, 11)
    assert out["classification"][-1].shape == (BS, A, cfg.head.num_classes)
    assert out["quality"][-1].shape == (BS, A, 2)
    assert len(out["prediction2d"]) == 3
    q2 = CAMS * cfg.head.allocation_capacity
    assert out["prediction2d"][-1].shape == (BS, q2, 4)
    assert out["classification2d"][-1].shape == (BS, q2, cfg.head.num_classes)
    state = out["temporal_state"]
    assert state.feature.shape == (BS, cfg.head.num_temp_instances, 64)
    assert np.all(np.isfinite(np.asarray(out["prediction"][-1])))
    assert out["instance_id"].shape == (BS, A)


def test_streaming_forward(model_and_vars):
    cfg, model, variables, img, proj = model_and_vars
    out1 = model.apply(variables, img, proj, train=False)
    state = out1["temporal_state"]
    dt = jnp.full((BS,), 0.5)
    t2c = jnp.tile(jnp.eye(4)[None], (BS, 1, 1))
    out2 = model.apply(
        variables, img, proj,
        temporal=state, time_interval=dt, temp2cur=t2c,
        train=False,
    )
    assert np.all(np.isfinite(np.asarray(out2["prediction"][-1])))
    # tracking ids of confident instances persist in the state
    st2 = out2["temporal_state"]
    assert st2.prev_id.shape == (BS,)


def test_decode_boxes(model_and_vars):
    cfg, model, variables, img, proj = model_and_vars
    out = model.apply(variables, img, proj, train=False)
    dec = decode_boxes3d(
        out["classification"][-1],
        out["prediction"][-1],
        instance_id=out["instance_id"],
        quality=out["quality"][-1],
        num_output=cfg.head.num_output,
        score_threshold=0.05,
    )
    assert dec["boxes_3d"].shape == (BS, cfg.head.num_output, 10)
    assert dec["scores_3d"].shape == (BS, cfg.head.num_output)
    assert dec["instance_ids"].shape == (BS, cfg.head.num_output)
    s = np.asarray(dec["scores_3d"])
    assert np.all(s[:, :-1] >= s[:, 1:] - 1e-6)  # sorted descending


def test_jit_streaming_step(model_and_vars):
    cfg, model, variables, img, proj = model_and_vars

    @jax.jit
    def step(variables, img, proj, state, dt, t2c):
        return model.apply(
            variables, img, proj, temporal=state,
            time_interval=dt, temp2cur=t2c, train=False,
        )

    state = TemporalState.init(
        BS, cfg.head.num_temp_instances, cfg.head.num_anchor, 64
    )
    dt = jnp.full((BS,), 0.5)
    t2c = jnp.tile(jnp.eye(4)[None], (BS, 1, 1))
    out = step(variables, img, proj, state, dt, t2c)
    assert np.all(np.isfinite(np.asarray(out["prediction"][-1])))


def test_fast_path_forward_close_to_exact(model_and_vars):
    """The serving fast path (windowed MSDA + MSDA/DFA gather caps, cf.
    simpb_r50_704x256_fast) must run end-to-end and, at capacities that
    cover the demand, its compaction legs must be EXACT — only the
    window clamp may perturb outputs."""
    cfg, model, variables, img, proj = model_and_vars
    head = dataclasses.replace(
        cfg.head,
        msda_patch_mode=True,
        # tiny config: 8 slots/cam, 32 anchors x 13 pts = 416 slots/cam
        msda_gather_capacity=8,   # == capacity: cap covers everything
        dfa_gather_capacity=256,
    )
    fast_cfg = dataclasses.replace(cfg, head=head)
    fast = SimPB(fast_cfg)
    out_exact = model.apply(variables, img, proj, train=False)
    out_fast = fast.apply(variables, img, proj, train=False)
    pe = np.asarray(out_exact["prediction"][-1])
    pf = np.asarray(out_fast["prediction"][-1])
    assert np.isfinite(pf).all()
    # same program shape; outputs finite and in the same ballpark (the
    # window clamp is the only semantic difference)
    assert pe.shape == pf.shape
    ce = np.asarray(out_exact["classification"][-1])
    cf = np.asarray(out_fast["classification"][-1])
    assert np.isfinite(cf).all()
    assert np.corrcoef(ce.ravel(), cf.ravel())[0, 1] > 0.9


def test_msda_cap_only_is_exact(model_and_vars):
    """MSDA valid-slot compaction alone (exact msda, cap == slot count)
    must be bit-identical on all valid-slot-dependent outputs."""
    cfg, model, variables, img, proj = model_and_vars
    head = dataclasses.replace(cfg.head, msda_gather_capacity=8)
    capped = SimPB(dataclasses.replace(cfg, head=head))
    out_a = model.apply(variables, img, proj, train=False)
    out_b = capped.apply(variables, img, proj, train=False)
    np.testing.assert_allclose(
        np.asarray(out_a["prediction"][-1]),
        np.asarray(out_b["prediction"][-1]),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_a["classification"][-1]),
        np.asarray(out_b["classification"][-1]),
        atol=1e-5, rtol=1e-5,
    )


def test_non_decoupled_attn_forward(model_and_vars):
    """decouple_attn=False / decouple_attn2d=False must run (reference
    falls back to nn.Identity for fc_before/fc_after, simpb_head.py:192)
    and use the pos-free residual identity in 2D self-attn (mmcv
    MultiheadAttention semantics)."""
    cfg, _, _, img, proj = model_and_vars
    head = dataclasses.replace(
        cfg.head, decouple_attn=False, decouple_attn2d=False
    )
    model = SimPB(dataclasses.replace(cfg, head=head))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2), "sampling": jax.random.PRNGKey(3)},
        img, proj, train=False,
    )
    out = model.apply(variables, img, proj, train=False)
    assert np.all(np.isfinite(np.asarray(out["prediction"][-1])))
    assert np.all(np.isfinite(np.asarray(out["prediction2d"][-1])))
