"""Numeric equivalence vs hand-built torch modules.

The converter round-trip (test_torch_convert) proves the *mapping* is
self-consistent; these tests prove the *semantics* match: torch modules
built exactly like the reference's (Linear/ReLU/LayerNorm stacks, torch
nn.MultiheadAttention, the AsymmetricFFN layout), random torch weights
converted through the torch->flax key mapping, then outputs compared.
This is what guarantees released-checkpoint behavior transfers.
"""
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from simpb_tpu.models.layers import (
    AsymmetricFFN,
    MLPStack,
    MultiheadAttention,
    pos2posemb2d,
)


def to_flax_linear(mod: nn.Linear):
    out = {"kernel": mod.weight.detach().numpy().T}
    if mod.bias is not None:
        out["bias"] = mod.bias.detach().numpy()
    return out


def to_flax_ln(mod: nn.LayerNorm):
    return {
        "scale": mod.weight.detach().numpy(),
        "bias": mod.bias.detach().numpy(),
    }


def linear_relu_ln_torch(embed, in_loops, out_loops, input_dims=None):
    """Reference models/blocks.py:32-42 structure."""
    if input_dims is None:
        input_dims = embed
    layers = []
    for _ in range(out_loops):
        for _ in range(in_loops):
            layers.append(nn.Linear(input_dims, embed))
            layers.append(nn.ReLU())
            input_dims = embed
        layers.append(nn.LayerNorm(embed))
    return nn.Sequential(*layers)


def test_mlp_stack_matches_linear_relu_ln():
    torch.manual_seed(0)
    seq = linear_relu_ln_torch(32, 2, 2, input_dims=16)
    x = torch.randn(4, 16)
    ref = seq(x).detach().numpy()

    params = {}
    fc = 0
    for mod in seq:
        if isinstance(mod, nn.Linear):
            params[f"fc{fc}"] = to_flax_linear(mod)
            fc += 1
        elif isinstance(mod, nn.LayerNorm):
            params[f"ln{fc - 1}"] = to_flax_ln(mod)
    model = MLPStack(embed_dims=32, in_loops=2, out_loops=2)
    out = model.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_mha_matches_torch():
    torch.manual_seed(1)
    e, h = 32, 4
    mha = nn.MultiheadAttention(e, h, batch_first=True)
    q = torch.randn(2, 6, e)
    k = torch.randn(2, 9, e)
    v = torch.randn(2, 9, e)
    ref = mha(q, k, v)[0].detach().numpy()

    w = mha.in_proj_weight.detach().numpy()
    b = mha.in_proj_bias.detach().numpy()
    params = {}
    for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
        params[name] = {
            "kernel": w[j * e : (j + 1) * e].T,
            "bias": b[j * e : (j + 1) * e],
        }
    params["out_proj"] = {
        "kernel": mha.out_proj.weight.detach().numpy().T,
        "bias": mha.out_proj.bias.detach().numpy(),
    }
    model = MultiheadAttention(embed_dims=e, num_heads=h)
    out = model.apply(
        {"params": params},
        jnp.asarray(q.numpy()), jnp.asarray(k.numpy()), jnp.asarray(v.numpy()),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_mha_attn_mask_matches_torch():
    torch.manual_seed(2)
    e, h = 16, 2
    mha = nn.MultiheadAttention(e, h, batch_first=True)
    q = torch.randn(1, 5, e)
    mask = torch.zeros(5, 5, dtype=torch.bool)
    mask[:, 3:] = True  # block keys 3,4
    ref = mha(q, q, q, attn_mask=mask)[0].detach().numpy()

    w = mha.in_proj_weight.detach().numpy()
    b = mha.in_proj_bias.detach().numpy()
    params = {
        name: {
            "kernel": w[j * e : (j + 1) * e].T,
            "bias": b[j * e : (j + 1) * e],
        }
        for j, name in enumerate(("q_proj", "k_proj", "v_proj"))
    }
    params["out_proj"] = {
        "kernel": mha.out_proj.weight.detach().numpy().T,
        "bias": mha.out_proj.bias.detach().numpy(),
    }
    model = MultiheadAttention(embed_dims=e, num_heads=h)
    out = model.apply(
        {"params": params}, jnp.asarray(q.numpy()),
        attn_mask=jnp.asarray(mask.numpy()),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_asymmetric_ffn_matches_reference_structure():
    """Reference models/blocks.py:325-393 with the released config:
    pre_norm LN, in 2E, hidden 4E, identity projection."""
    torch.manual_seed(3)
    e = 32
    pre = nn.LayerNorm(2 * e)
    fc1 = nn.Linear(2 * e, 4 * e)
    fc2 = nn.Linear(4 * e, e)
    ident = nn.Linear(2 * e, e)
    x = torch.randn(2, 5, 2 * e)
    xn = pre(x)
    ref = (ident(xn) + fc2(torch.relu(fc1(xn)))).detach().numpy()

    params = {
        "pre_norm": to_flax_ln(pre),
        "fc1": to_flax_linear(fc1),
        "fc2": to_flax_linear(fc2),
        "identity_fc": to_flax_linear(ident),
    }
    model = AsymmetricFFN(
        embed_dims=e, in_channels=2 * e, feedforward_channels=4 * e,
        ffn_drop=0.0,
    )
    out = model.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_pos2posemb2d_matches_torch_reference():
    """Reference models/utils.py:44-63 sine embedding."""
    import math

    pos_np = np.random.default_rng(4).uniform(0, 1, (3, 4, 2)).astype(
        np.float32
    )
    pos = torch.from_numpy(pos_np)
    scale = 2 * math.pi
    p = pos * scale
    dim_t = torch.arange(128, dtype=torch.float32)
    dim_t = 10000 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / 128)
    px = p[..., 0, None] / dim_t
    py = p[..., 1, None] / dim_t
    px = torch.stack(
        (px[..., 0::2].sin(), px[..., 1::2].cos()), dim=-1
    ).flatten(-2)
    py = torch.stack(
        (py[..., 0::2].sin(), py[..., 1::2].cos()), dim=-1
    ).flatten(-2)
    ref = torch.cat((py, px), dim=-1).numpy()

    out = np.asarray(pos2posemb2d(jnp.asarray(pos_np)))
    np.testing.assert_allclose(out, ref, atol=1e-5)
