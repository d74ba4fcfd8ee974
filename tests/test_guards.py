"""In-graph sampling-exactness guards (VERDICT.md round-2 item 1b).

The guarded configs promote "exact while caps cover demand" from a
study-time observation to a CHECKED invariant: modules sow overflow
counters into the "guards" collection, and 0 means the frame's sampling
was bit-equivalent to the uncapped exact semantics (reference
ops/src/deformable_aggregation_cuda.cu:129-187 is the semantics being
preserved). These tests pin both directions: counters are zero exactly
when outputs match the exact op, and fire when they don't.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpb_tpu.configs.base import simpb_tiny
from simpb_tpu.models.group_attn import QueryGroupMSDA
from simpb_tpu.ops.format import SpatialShapes
from simpb_tpu.ops.sampling import msda, msda_patch, msda_window_stats
from simpb_tpu.utils.guards import merge_guard_maxima, summarize_guards

pytestmark = pytest.mark.medium

SHAPES = SpatialShapes(((16, 24), (8, 12), (8, 10), (8, 8)))
HW = sum(h * w for h, w in SHAPES.shapes)


def _msda_inputs(rng, b=2, q=6, heads=4, pts=2, spread_px=3.0, far=None):
    """Sampling inputs whose per-(query, level) spread is bounded by
    `spread_px` pixels on level 0 (tighter on coarser levels); `far`
    optionally moves one sample of query 0 far outside any window."""
    L = SHAPES.num_levels
    value = rng.normal(size=(b, HW, 32)).astype(np.float32)
    center = rng.uniform(0.35, 0.65, size=(b, q, 1, L, 1, 2))
    # offsets in level-0 pixels, normalised by level-0 size
    offs = (rng.uniform(size=(b, q, heads, L, pts, 2)) - 0.5) * spread_px
    norm = np.array([SHAPES.shapes[0][1], SHAPES.shapes[0][0]], np.float64)
    loc = center + offs / norm
    if far is not None:
        # ~7.2 level-0 px beyond query 0's sample cluster: still inside
        # the image (center <= 0.65 -> 0.95), but the per-(query, level)
        # spread now exceeds the 7 px an 8-wide window can cover
        loc[0, 0, 0, far, 0] = center[0, 0, 0, far, 0] + 0.3
    w = rng.uniform(0.1, 1.0, size=(b, q, heads, L, pts))
    w = w / w.sum(axis=(-2, -1), keepdims=True)
    return (
        jnp.asarray(value),
        jnp.asarray(loc.astype(np.float32)),
        jnp.asarray(w.astype(np.float32)),
    )


def test_window_stats_zero_implies_patch_equals_exact():
    rng = np.random.default_rng(0)
    value, loc, w = _msda_inputs(rng, spread_px=3.0)
    stats = msda_window_stats(SHAPES, loc, w, 8, 8)
    assert float(stats["window_clamped"].sum()) == 0.0
    assert float(stats["level_dropped_mass"].max()) == 0.0
    a = msda(value, SHAPES, loc, w)
    b = msda_patch(value, SHAPES, loc, w)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_window_stats_flag_out_of_window_sample():
    rng = np.random.default_rng(1)
    value, loc, w = _msda_inputs(rng, spread_px=3.0, far=0)
    stats = msda_window_stats(SHAPES, loc, w, 8, 8)
    clamped = np.asarray(stats["window_clamped"])
    assert clamped[0] >= 1.0 and clamped[1] == 0.0
    mass = np.asarray(stats["window_clamped_mass"])
    assert mass[0] > 0.0 and mass[1] == 0.0
    # and the patch output for that query really deviates from exact
    a = np.asarray(msda(value, SHAPES, loc, w))
    b = np.asarray(msda_patch(value, SHAPES, loc, w))
    assert not np.allclose(a[0, 0], b[0, 0], atol=1e-4)
    # every unflagged query still matches
    np.testing.assert_allclose(a[0, 1:], b[0, 1:], atol=1e-4)
    np.testing.assert_allclose(a[1], b[1], atol=1e-4)


def test_window_stats_sel_levels_dropped_mass():
    rng = np.random.default_rng(2)
    _, loc, w = _msda_inputs(rng, spread_px=3.0)
    stats = msda_window_stats(SHAPES, loc, w, 8, 8, sel_levels=2)
    # window fits only levels >= 8x8: SHAPES level 0 is 16x24, all >= 8
    # wide/high, so selection engages; per-query dropped mass equals the
    # mass of the 2 lowest-mass levels
    mass = np.asarray(w.sum(axis=(2, 4)))  # [B, Q, L]
    dropped_ref = np.sort(mass, axis=-1)[..., :2].sum(-1).max(-1)
    np.testing.assert_allclose(
        np.asarray(stats["level_dropped_mass"]), dropped_ref, atol=1e-6
    )


def _mod_inputs(valid_per_cam, k=8, cams=2, c=32, seed=3):
    rng = np.random.default_rng(seed)
    bs = 1
    q = rng.normal(size=(bs, cams * k, c)).astype(np.float32)
    qp = rng.normal(size=(bs, cams * k, c)).astype(np.float32)
    ref = rng.uniform(0.3, 0.7, size=(bs, cams * k, 2)).astype(np.float32)
    depth = np.zeros((bs, cams, k, 1), np.float32)
    for cam in range(cams):
        depth[:, cam, : valid_per_cam] = 1.0
    value = rng.normal(size=(bs, cams, HW, c)).astype(np.float32)
    return (
        jnp.asarray(q), jnp.asarray(qp), jnp.asarray(ref),
        jnp.asarray(depth.reshape(bs, cams * k, 1)), jnp.asarray(value),
    )


@pytest.mark.parametrize(
    "valid,cap,expect", [(4, 6, 0.0), (8, 6, 2.0), (6, 6, 0.0)]
)
def test_msda_module_overflow_counter(valid, cap, expect):
    inputs = _mod_inputs(valid)
    mod = QueryGroupMSDA(
        embed_dims=32, num_heads=4, num_levels=4, num_points=2,
        num_cams=2, dropout=0.0, gather_capacity=cap, guard=True,
    )
    q, qp, ref, depth, value = inputs
    variables = mod.init(
        jax.random.PRNGKey(0), q, qp, ref, depth, value, SHAPES
    )
    assert "guards" not in variables, (
        "guard counters must not leak into init variables"
    )
    _, mut = mod.apply(
        variables, q, qp, ref, depth, value, SHAPES, mutable=["guards"]
    )
    summary = summarize_guards(mut["guards"])
    assert float(summary["msda_overflow"]) == expect


def test_guarded_tiny_detector_end_to_end():
    """Full detector with guard_sampling: counters surface through
    streaming_eval metrics, outputs are untouched by guarding, and a
    starved cap makes the DFA counter fire."""
    from simpb_tpu.models.detector import SimPB
    from simpb_tpu.utils.synthetic import synthetic_rig

    base = simpb_tiny()
    head_g = dataclasses.replace(base.head, guard_sampling=True)
    cfg_g = dataclasses.replace(base, head=head_g)
    # starved caps: 32 anchors x 13 pts = 416 slots; cap 16 overflows
    # on any frame with >16 in-view keypoints per camera
    head_s = dataclasses.replace(
        base.head, guard_sampling=True, dfa_gather_capacity=16
    )
    cfg_s = dataclasses.replace(base, head=head_s)

    W, H = base.input_size
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (1, 6, H, W, 3), jnp.float32)
    proj = jnp.asarray(synthetic_rig(1, image_wh=(W, H)))

    m_plain = SimPB(base)
    m_guard = SimPB(cfg_g)
    m_starv = SimPB(cfg_s)
    variables = jax.jit(lambda: m_plain.init(rng, img, proj, train=False))()

    out_plain = jax.jit(
        lambda v: m_plain.apply(v, img, proj, train=False)
    )(variables)
    out_guard, mut = jax.jit(
        lambda v: m_guard.apply(
            v, img, proj, train=False, mutable=["guards"]
        )
    )(variables)
    np.testing.assert_array_equal(
        np.asarray(out_plain["prediction"][-1]),
        np.asarray(out_guard["prediction"][-1]),
    )
    summary = {
        k: float(v) for k, v in summarize_guards(mut["guards"]).items()
    }
    assert set(summary) >= {"dfa_overflow", "msda_overflow"}
    assert summary["dfa_overflow"] == 0.0  # tiny default cap 4096 covers
    assert summary["msda_overflow"] == 0.0  # cap None

    _, mut_s = jax.jit(
        lambda v: m_starv.apply(
            v, img, proj, train=False, mutable=["guards"]
        )
    )(variables)
    s = summarize_guards(mut_s["guards"])
    assert float(s["dfa_overflow"]) > 0.0


def test_merge_guard_maxima():
    a = {"dfa_overflow": 0.0, "msda_overflow": 3.0}
    b = {"dfa_overflow": 2.0, "window_clamped": 1.0}
    m = merge_guard_maxima(a, b)
    assert m == {
        "dfa_overflow": 2.0, "msda_overflow": 3.0, "window_clamped": 1.0
    }


def test_guarded_config_constructs():
    from simpb_tpu.configs.base import simpb_r50_704x256_guarded

    cfg = simpb_r50_704x256_guarded()
    assert cfg.head.guard_sampling
    assert not cfg.head.msda_patch_mode  # exact semantics
    assert cfg.head.msda_gather_capacity == 208
    assert cfg.head.dfa_gather_capacity == 2304


def test_fast_guarded_config_constructs():
    from simpb_tpu.configs.base import simpb_r50_704x256_fast_guarded

    cfg = simpb_r50_704x256_fast_guarded()
    assert cfg.head.guard_sampling and cfg.head.msda_patch_mode
    assert cfg.head.msda_sel_levels == 2


def test_streaming_eval_surfaces_guard_metrics(tmp_path):
    """The eval surface must report the counters: streaming_eval on a
    guarded tiny config returns guard_* keys in its metrics dict."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tests.test_cli_e2e import SRC_H, SRC_W, write_fake_dataset

    from simpb_tpu.data.dataset import NuScenesDataset
    from simpb_tpu.models.detector import SimPB
    from simpb_tpu.training.evaluate import streaming_eval

    base = simpb_tiny()
    cfg = dataclasses.replace(
        base, head=dataclasses.replace(base.head, guard_sampling=True)
    )
    fw, fh = cfg.input_size
    pkl = write_fake_dataset(tmp_path, n_frames=2)
    aug = {
        "resize_lim": (0.4, 0.47), "final_dim": (fh, fw),
        "bot_pct_lim": (0.0, 0.0), "rot_lim": (0, 0),
        "H": SRC_H, "W": SRC_W, "rand_flip": False,
        "rot3d_range": [0, 0],
    }
    dataset = NuScenesDataset(
        pkl, test_mode=True, data_aug_conf=aug, sequences_split_num=1
    )
    model = SimPB(cfg)
    img0 = jnp.zeros((1, 6, fh, fw, 3), jnp.float32)
    proj0 = jnp.tile(jnp.eye(4)[None, None], (1, 6, 1, 1))
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), img0, proj0,
                           train=False)
    )()
    metrics, _, _ = streaming_eval(model, cfg, variables, dataset)
    assert "guard_dfa_overflow" in metrics
    assert "guard_msda_overflow" in metrics
    assert metrics["guard_dfa_overflow"] == 0.0


def test_check_guard_violations_and_cli_enforcement(capsys):
    """Nonzero guard maxima must fail loudly (VERDICT round-3 item 8):
    `check_guard_violations` flags them and `tools/test.py`'s
    `enforce_guards` turns them into a WARNING + exit code 3."""
    import math

    from simpb_tpu.utils.guards import check_guard_violations

    clean = {"mAP": 0.4, "guard_dfa_overflow": 0.0,
             "guard_msda_overflow": 0.0,
             "guard_msda_window_clamped": float("nan")}
    assert check_guard_violations(clean) == []
    dirty = dict(clean, guard_dfa_overflow=7.0,
                 guard_msda_window_clamped_mass=0.25,
                 guard_msda_clamp_demand=42.0)  # stat, not a violation
    assert check_guard_violations(dirty) == [
        "guard_dfa_overflow", "guard_msda_window_clamped_mass"
    ]

    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "simpb_test_cli",
        os.path.join(os.path.dirname(__file__), "..", "tools", "test.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.enforce_guards(clean) == 0
    assert mod.enforce_guards(dirty) == 3
    err = capsys.readouterr().err
    assert "guard violated" in err and "guard_dfa_overflow=7" in err
