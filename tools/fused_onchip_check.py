"""Per-op on-chip check of the redesigned fused kernels vs the XLA
module path, bf16 + f32, tiny-but-representative shapes.

Run from the repo root: `python tools/fused_onchip_check.py`.
Expected: all bf16 rows OK; f32 rows sit at rel~1e-3 (MXU default
precision vs XLA's conv lowering), which is fine — the serving path
is bf16."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from simpb_tpu.models.backbone import Bottleneck
from simpb_tpu.ops.conv_fused import (
    bottleneck_down_fused_infer, bottleneck_fused_infer,
    conv3x3_bias_fused, fold_block_params, fold_downsample_params,
    maxpool_3x3_s2_fused,
)


def check(name, got, ref, tol):
    g = np.asarray(got, np.float32)
    r = np.asarray(ref, np.float32)
    err = float(np.max(np.abs(g - r)))
    rel = err / (float(np.max(np.abs(r))) + 1e-9)
    status = "OK" if rel < tol else "MISMATCH"
    print(f"{name}: {status} maxabs={err:.5f} rel={rel:.5f}")


def run(dtype, tol):
    tag = jnp.dtype(dtype).name
    rng = np.random.default_rng(0)

    # stride-1 bottleneck
    x = jnp.asarray(rng.normal(size=(1, 16, 44, 256)), dtype)
    blk = Bottleneck(planes=64, stride=1, downsample=False, dtype=dtype)
    v = blk.init(jax.random.PRNGKey(0), x)
    ref = jax.jit(lambda x: blk.apply(v, x, False))(x)
    folded = fold_block_params(v["params"], v["batch_stats"])
    got = jax.jit(lambda x: bottleneck_fused_infer(x, folded))(x)
    check(f"bottleneck_s1[{tag}]", got, ref, tol)

    # stage-head stride-2 bottleneck
    blk2 = Bottleneck(planes=128, stride=2, downsample=True, dtype=dtype)
    v2 = blk2.init(jax.random.PRNGKey(1), x)
    ref2 = jax.jit(lambda x: blk2.apply(v2, x, False))(x)
    got2 = jax.jit(
        lambda x: bottleneck_down_fused_infer(
            x,
            fold_block_params(v2["params"], v2["batch_stats"]),
            fold_downsample_params(v2["params"], v2["batch_stats"]),
            2,
        )
    )(x)
    check(f"bottleneck_down_s2[{tag}]", got2, ref2, tol)

    # stage-head stride-1 (stage1 head)
    blk1 = Bottleneck(planes=64, stride=1, downsample=True, dtype=dtype)
    v1 = blk1.init(jax.random.PRNGKey(2), x)
    ref1 = jax.jit(lambda x: blk1.apply(v1, x, False))(x)
    got1 = jax.jit(
        lambda x: bottleneck_down_fused_infer(
            x,
            fold_block_params(v1["params"], v1["batch_stats"]),
            fold_downsample_params(v1["params"], v1["batch_stats"]),
            1,
        )
    )(x)
    check(f"bottleneck_down_s1[{tag}]", got1, ref1, tol)

    # FPN 3x3 conv
    k = jnp.asarray(rng.normal(size=(3, 3, 256, 256)) * 0.05, dtype)
    bia = jnp.asarray(rng.normal(size=(256,)) * 0.1, jnp.float32)
    refc = jax.jit(
        lambda x: jax.lax.conv_general_dilated(
            x.astype(jnp.float32), k.astype(jnp.float32),
            (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bia
    )(x).astype(dtype)
    gotc = jax.jit(lambda x: conv3x3_bias_fused(x, k, bia))(x)
    check(f"conv3x3[{tag}]", gotc, refc, tol)

    # stem max-pool
    xp = jnp.asarray(rng.normal(size=(1, 32, 88, 64)), dtype)
    refp = jax.jit(
        lambda x: jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)],
        )
    )(xp)
    gotp = jax.jit(maxpool_3x3_s2_fused)(xp)
    check(f"maxpool[{tag}]", gotp, refp, tol)


if __name__ == "__main__":
    print("devices:", jax.devices())
    run(jnp.float32, 1e-4)
    run(jnp.bfloat16, 3e-2)
