"""Full-stack checkpoint parity: the assembled jax SimPB DETECTOR must
reproduce torch replicas of the whole reference eval path through ONE
combined converted state dict.

tests/test_torch_backbone.py proves `img_backbone.*`/`img_neck.*`
convert numerically; tests/test_torch_composite.py proves the assembled
`head.*` op loop converts. This test closes the remaining seam: images
-> trunk -> FPN -> `feature_maps_format` packing -> head, as one
program through `SimPB.__call__` (reference eval path
simpb.py:110-122: extract_feat -> head), with every parameter family
loaded from a single reference-layout state dict exactly like a real
released .pth.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from simpb_tpu.configs.base import HeadConfig, ModelConfig
from simpb_tpu.models.detector import SimPB
from simpb_tpu.utils.synthetic import synthetic_anchors, synthetic_rig
from simpb_tpu.utils.torch_convert import merge_params, torch_to_flax

from test_torch_backbone import (
    DepthBranchT, FPNT, ResNet50T, _randomize_bn_stats,
)
from torch_replica import HeadReplicaT, build_state_dict

pytestmark = pytest.mark.heavy

EMBED, HEADS, NUM_ANCHOR, NUM_CLS = 64, 4, 32, 10
NUM_CAMS, NUM_LEVELS = 6, 4
IMG_W, IMG_H = 64, 32
CAP = NUM_ANCHOR  # capacity >= any per-camera count: zero slot drops
OP_ORDER = (
    "allocation", "qg_self_attn", "norm", "qg_cross_attn", "ffn", "norm",
    "refine2d", "aggregation", "refine3d",
    "temp_gnn", "gnn", "norm", "deformable", "ffn", "norm", "refine3d",
)


def _head_cfg():
    return HeadConfig(
        embed_dims=EMBED,
        num_groups=HEADS,
        num_anchor=NUM_ANCHOR,
        num_temp_instances=16,
        allocation_capacity=CAP,
        operation_order=OP_ORDER,
        num_single_frame_decoder=1,
        dfa_gather_capacity=None,
        msda_gather_capacity=None,
    )


@pytest.fixture(scope="module")
def stack():
    gen = torch.Generator().manual_seed(0)
    torch.manual_seed(0)
    trunk, neck = ResNet50T().eval(), FPNT(out_channels=EMBED).eval()
    depth = DepthBranchT(channels=EMBED).eval()
    for m in (trunk, neck):
        _randomize_bn_stats(m, gen)
    rep = HeadReplicaT(
        EMBED, HEADS, NUM_ANCHOR, NUM_CLS, NUM_LEVELS, NUM_CAMS, OP_ORDER
    ).eval()
    with torch.no_grad():
        rep.anchor.copy_(torch.from_numpy(synthetic_anchors(NUM_ANCHOR)))
        rep.instance_feature.normal_(0, 0.5)

    # one combined reference-layout state dict, like a released .pth
    sd = dict(build_state_dict(rep))
    for prefix, mod in (
        ("img_backbone", trunk), ("img_neck", neck), ("depth_branch", depth)
    ):
        for k, v in mod.state_dict().items():
            if k.endswith("num_batches_tracked"):
                continue
            sd[f"{prefix}.{k}"] = v.numpy()

    rng = np.random.default_rng(0)
    img = rng.normal(size=(NUM_CAMS, 3, IMG_H, IMG_W)).astype(np.float32)
    proj = synthetic_rig(1, image_wh=(IMG_W, IMG_H))

    # torch eval path: trunk -> FPN -> flatten to the packed column
    # layout [bs, cams, sum(HW), C] (reference feature_maps_format,
    # ops/__init__.py:63-92) -> head replica
    with torch.no_grad():
        fpn = neck(trunk(torch.from_numpy(img)))
        col = torch.cat(
            [f.flatten(2).permute(0, 2, 1) for f in fpn], dim=1
        )[None]  # [1, cams, sum(HW), C]
    shapes = tuple((f.shape[2], f.shape[3]) for f in fpn)
    t_out = rep(col, shapes, torch.from_numpy(proj), (IMG_W, IMG_H))

    cfg = ModelConfig(
        backbone_depth=50,
        backbone_remat=False,
        input_size=(IMG_W, IMG_H),
        head=_head_cfg(),
    )
    model = SimPB(cfg)
    img_j = jnp.asarray(img.transpose(0, 2, 3, 1))[None]  # [1,cams,H,W,3]
    proj_j = jnp.asarray(proj)
    # init with train=True: the depth branch only traces on the train
    # path (detector.py return_depth=train), and the combined state
    # dict must cover it too
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2), "sampling": jax.random.PRNGKey(3)},
        img_j, proj_j, train=True,
    )
    loaded, stats = torch_to_flax(sd, cfg)
    params = merge_params(variables["params"], loaded)
    j_out = model.apply(
        {"params": params, "batch_stats": stats}, img_j, proj_j,
        train=False,
    )
    return t_out, j_out, (loaded, stats), params, variables


def test_combined_state_dict_covers_every_family(stack):
    _, _, (loaded, stats), merged, variables = stack
    assert set(loaded) >= {"img_backbone", "img_neck", "head",
                           "depth_branch"}
    assert "img_backbone" in stats
    # the merged tree must retain the init tree's structure exactly
    assert jax.tree_util.tree_structure(merged) == (
        jax.tree_util.tree_structure(variables["params"])
    )


def test_detector_3d_outputs_match_torch(stack):
    t_out, j_out, *_ = stack
    for lyr in range(2):
        for key, atol in (
            ("prediction", 2e-3), ("classification", 2e-3),
            ("quality", 2e-3),
        ):
            np.testing.assert_allclose(
                np.asarray(j_out[key][lyr]),
                t_out[key][lyr].numpy(),
                atol=atol, rtol=1e-3, err_msg=f"{key} layer {lyr}",
            )


def test_detector_2d_outputs_match_torch(stack):
    t_out, j_out, *_ = stack
    groups = t_out["query_groups"][0]
    assert sum(qe - qs for qs, qe in groups) > NUM_ANCHOR  # non-trivial
    for key, atol in (
        ("prediction2d", 2e-3), ("classification2d", 2e-3),
        ("prediction_alpha2d", 2e-3),
    ):
        for cam, (qs, qe) in enumerate(groups):
            n = qe - qs
            ref = t_out[key][0][0, qs:qe].numpy()
            got = np.asarray(j_out[key][0])[0, cam * CAP : cam * CAP + n]
            np.testing.assert_allclose(
                got, ref, atol=atol, rtol=1e-3,
                err_msg=f"{key} cam{cam}",
            )
