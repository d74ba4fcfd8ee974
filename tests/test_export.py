"""AOT serving-export tests: serialize -> deserialize -> run == apply."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from simpb_tpu.configs.base import simpb_tiny
from simpb_tpu.models.decoder3d import decode_boxes3d
from simpb_tpu.models.detector import SimPB
from simpb_tpu.models.instance_bank import TemporalState
from simpb_tpu.utils.export import (
    ServingModel,
    export_serving,
    make_serving_fn,
    temporal_to_tuple,
)
from simpb_tpu.utils.synthetic import synthetic_rig
import pytest

pytestmark = pytest.mark.medium


def _setup():
    cfg = simpb_tiny()
    model = SimPB(cfg)
    rng = np.random.default_rng(0)
    bs, cams = 1, cfg.head.num_cams
    w, h = cfg.input_size
    img = jnp.asarray(rng.normal(size=(bs, cams, h, w, 3)).astype(np.float32))
    proj = jnp.asarray(synthetic_rig(bs, image_wh=(w, h)))
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2),
             "sampling": jax.random.PRNGKey(3)},
            img, proj, train=False,
        )
    )()
    return cfg, model, variables, img, proj


def test_export_roundtrip_matches_direct_apply():
    cfg, model, variables, img, proj = _setup()
    hc = cfg.head
    data = export_serving(cfg, variables, platforms=("cpu",))
    assert isinstance(data, (bytes, bytearray)) and len(data) > 1000
    served = ServingModel.load(bytes(data))

    temporal = served.init_temporal(
        1, hc.num_temp_instances, hc.num_anchor, hc.embed_dims
    )
    dt = jnp.full((1,), 5.0)
    t2c = jnp.eye(4)[None]
    # two streaming frames through the artifact
    out1 = served(img, proj, dt, t2c, temporal)
    out2 = served(img * 1.01, proj, jnp.full((1,), 0.5), t2c,
                  out1["temporal"])

    # direct path with the same weights
    state = TemporalState.init(
        1, hc.num_temp_instances, hc.num_anchor, hc.embed_dims
    )
    ref1 = model.apply(variables, img, proj, temporal=state,
                       time_interval=dt, temp2cur=t2c, train=False)
    ref2 = model.apply(variables, img * 1.01, proj,
                       temporal=ref1["temporal_state"],
                       time_interval=jnp.full((1,), 0.5), temp2cur=t2c,
                       train=False)

    # The artifact is a SEPARATE compilation of the same program:
    # accumulation order differs, and at random init many scores are
    # near-ties, so the top-k ORDER is unstable between the two
    # programs (rows legitimately swap). Compare as score-sorted sets:
    # the score multisets must match, and every leading reference box
    # must appear somewhere in the artifact's detections.
    def assert_detections_match(out, ref):
        det = decode_boxes3d(
            ref["classification"][-1], ref["prediction"][-1],
            instance_id=ref["temporal_state"].instance_id,
            quality=(ref["quality"][-1] if ref.get("quality") else None),
            num_output=cfg.head.num_output,
            score_threshold=cfg.head.score_threshold,
        )
        o_s = np.sort(np.asarray(out["scores"][0]))
        r_s = np.sort(np.asarray(det["scores_3d"][0]))
        np.testing.assert_allclose(o_s, r_s, rtol=5e-3, atol=2e-3)
        ob = np.asarray(out["boxes"][0])
        rb = np.asarray(det["boxes_3d"][0])
        # compare in a scale-robust space: log-sizes instead of exp'd
        ob, rb = ob.copy(), rb.copy()
        ob[:, 3:6] = np.log(np.maximum(ob[:, 3:6], 1e-6))
        rb[:, 3:6] = np.log(np.maximum(rb[:, 3:6], 1e-6))
        for i in range(8):  # leading ref boxes must exist in out
            gap = np.abs(ob - rb[i]).max(-1).min()
            assert gap < 0.1, (i, gap)

    assert_detections_match(out1, ref1)
    # out2/ref2 each consumed their OWN pipeline's threaded temporal
    # state: matching detections on frame 2 proves the artifact's state
    # threading is functionally equivalent.
    assert_detections_match(out2, ref2)
    for a, b in zip(out2["temporal"],
                    temporal_to_tuple(ref2["temporal_state"])):
        assert a.shape == b.shape and a.dtype == b.dtype
        assert np.isfinite(np.asarray(a, np.float32)).all()


def test_serving_fn_is_jittable_without_export():
    cfg, model, variables, img, proj = _setup()
    hc = cfg.head
    serve = jax.jit(make_serving_fn(cfg, variables))
    temporal = temporal_to_tuple(TemporalState.init(
        1, hc.num_temp_instances, hc.num_anchor, hc.embed_dims
    ))
    out = serve(img, proj, jnp.full((1,), 5.0), jnp.eye(4)[None],
                temporal)
    assert np.isfinite(np.asarray(out["scores"])).all()
    assert out["boxes"].shape == (1, hc.num_output, 10)
