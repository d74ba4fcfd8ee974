"""Checkpoint converter round-trip: flax -> torch layout -> flax."""
import jax
import jax.numpy as jnp
import numpy as np

from simpb_tpu.configs.base import HeadConfig, ModelConfig
from simpb_tpu.models.detector import SimPB
from simpb_tpu.utils.torch_convert import (
    build_mapping,
    flax_to_torch,
    merge_params,
    torch_to_flax,
)


def tiny_cfg():
    head = HeadConfig(
        embed_dims=64, num_groups=4, num_anchor=32, num_temp_instances=16,
        allocation_capacity=8, num_output=8,
    )
    return ModelConfig(backbone_remat=False, input_size=(64, 32), head=head)


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def test_roundtrip_covers_most_params():
    cfg = tiny_cfg()
    model = SimPB(cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 6, 32, 64, 3)).astype(np.float32))
    proj = jnp.asarray(
        np.tile(np.eye(4, dtype=np.float32), (1, 6, 1, 1)) * 50.0
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2), "sampling": jax.random.PRNGKey(3)},
        img, proj, train=True,
    )
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))

    sd = flax_to_torch(params, stats, cfg)
    assert len(sd) > 300  # backbone + head coverage
    back_p, back_s = torch_to_flax(sd, cfg)

    flat_orig = flatten(params)
    flat_back = flatten(back_p)
    # every converted leaf must round-trip exactly
    assert len(flat_back) > 300
    missing_shape = []
    for key, val in flat_back.items():
        assert key in flat_orig, f"unknown leaf {key}"
        np.testing.assert_allclose(
            val, flat_orig[key], atol=0, err_msg=str(key)
        )
    # coverage: converted leaves should be the vast majority of params
    coverage = len(flat_back) / len(flat_orig)
    assert coverage > 0.95, f"converter covers only {coverage:.2%}"

    # batch stats round trip
    flat_stats = flatten(stats)
    flat_back_s = flatten(back_s)
    assert len(flat_back_s) == len(flat_stats)

    # merge keeps base where checkpoint lacks leaves
    merged = merge_params(params, back_p)
    np.testing.assert_allclose(
        flatten(merged)[("head", "anchor")], flat_orig[("head", "anchor")]
    )


def test_mapping_has_no_duplicate_targets():
    cfg = tiny_cfg()
    mapping = build_mapping(cfg)
    torch_keys = [t for t, _, _ in mapping]
    assert len(torch_keys) == len(set(torch_keys))
    flax_paths = ["/".join(f) + ":" + k for _, f, k in mapping]
    assert len(flax_paths) == len(set(flax_paths))


def test_load_pretrained_backbone_naming_variants(tmp_path):
    """torchvision / mmdet / img_backbone key layouts all load the
    backbone; classifier-head keys are ignored."""
    import torch

    from simpb_tpu.utils.torch_convert import load_pretrained_backbone

    cfg = tiny_cfg()
    model = SimPB(cfg)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(size=(1, 6, 32, 64, 3)).astype(np.float32))
    proj = jnp.asarray(
        np.tile(np.eye(4, dtype=np.float32), (1, 6, 1, 1)) * 50.0
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2), "sampling": jax.random.PRNGKey(3)},
        img, proj, train=True,
    )
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))
    sd = flax_to_torch(params, stats, cfg)
    backbone_sd = {
        k[len("img_backbone."):]: torch.from_numpy(np.array(v))
        for k, v in sd.items() if k.startswith("img_backbone.")
    }
    n_backbone_leaves = len(flatten(params["img_backbone"]))

    for layout in ("torchvision", "mmdet", "img_backbone"):
        prefix = {"torchvision": "", "mmdet": "backbone.",
                  "img_backbone": "img_backbone."}[layout]
        torch_sd = {prefix + k: v for k, v in backbone_sd.items()}
        # torchvision classifier head must be silently dropped
        torch_sd["fc.weight"] = torch.zeros((1000, 2048))
        torch_sd["fc.bias"] = torch.zeros((1000,))
        path = tmp_path / f"{layout}.pth"
        torch.save({"state_dict": torch_sd} if layout == "mmdet"
                   else torch_sd, path)

        loaded_p, loaded_s = load_pretrained_backbone(str(path), cfg)
        assert set(loaded_p) == {"img_backbone"}, layout
        flat = flatten(loaded_p["img_backbone"])
        assert len(flat) == n_backbone_leaves, layout
        for key, val in flat.items():
            np.testing.assert_allclose(
                val, flatten(params["img_backbone"])[key], atol=0,
                err_msg=f"{layout}:{key}")
        assert set(loaded_s) == {"img_backbone"}, layout


def test_load_pretrained_backbone_rejects_unknown_layout(tmp_path):
    """A checkpoint whose keys match no known layout must raise, not
    silently return empty trees (which would train a random backbone
    while the user believes it is pretrained). DataParallel 'module.'
    wrappers are stripped, not rejected."""
    import pytest
    import torch

    from simpb_tpu.utils.torch_convert import load_pretrained_backbone

    cfg = tiny_cfg()
    bad = tmp_path / "bad.pth"
    torch.save({"encoder.stem.weight": torch.zeros(1)}, bad)
    with pytest.raises(ValueError, match="no backbone parameters"):
        load_pretrained_backbone(str(bad), cfg)

    good = tmp_path / "dp.pth"
    torch.save(
        {"module.backbone.conv1.weight": torch.zeros(64, 3, 7, 7)}, good
    )
    p, _ = load_pretrained_backbone(str(good), cfg)
    assert "conv1" in p["img_backbone"]
