"""Per-op on-chip A/B: fused Pallas serving kernels vs the XLA module
path, at the real r50/704x256 bench shapes (6 cams folded, bf16).

End-to-end the fused trunk measured SLOWER (62.3 vs 76.9 fps); this
study localises which kernel variants lose so the flag can be applied
selectively (or retired with evidence). Methodology per CLAUDE.md:
device-side scan with varied inputs, value-fetch sync, no-op control
subtracted.
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from simpb_tpu.models.backbone import Bottleneck
from simpb_tpu.ops.conv_fused import (
    bottleneck_down_fused_infer, bottleneck_fused_infer,
    conv3x3_bias_fused, fold_block_params, fold_downsample_params,
    maxpool_3x3_s2_fused,
)

STEPS = 50
DT = jnp.bfloat16


def timed(fn, x0, label):
    fn = jax.jit(fn)

    def scan_fn(x):
        def body(s, _):
            y = fn((x * s).astype(x.dtype))
            return s + jnp.float32(1e-3), jnp.sum(
                (y[-1] if isinstance(y, (list, tuple)) else y)
                .astype(jnp.float32)
            )
        s, outs = jax.lax.scan(body, jnp.float32(1.0), None, length=STEPS)
        return outs

    sf = jax.jit(scan_fn)
    np.asarray(sf(x0))
    t0 = time.perf_counter()
    np.asarray(sf(x0))
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{label:44s} {dt:7.3f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    noop = timed(lambda x: x * 2.0, jnp.ones((8, 128), DT), "no-op control")

    # (stage, planes, H, W) at 704x256 input, 6 cams folded
    shapes = [
        ("s1", 64, 64, 176),
        ("s2", 128, 32, 88),
        ("s3", 256, 16, 44),
        ("s4", 512, 8, 22),
    ]
    for tag, planes, h, w in shapes:
        c = planes * 4
        x = jnp.asarray(rng.normal(size=(6, h, w, c)), DT)
        blk = Bottleneck(planes=planes, stride=1, downsample=False, dtype=DT)
        v = blk.init(jax.random.PRNGKey(0), x)
        folded = fold_block_params(v["params"], v["batch_stats"])
        a = timed(lambda y: blk.apply(v, y, False), x, f"{tag} s1-block XLA")
        b = timed(
            lambda y: bottleneck_fused_infer(y, folded), x,
            f"{tag} s1-block fused",
        )
        print(f"  -> delta {b - a:+.3f} ms (net of control {noop:.3f})")

    # stage heads (stride-2 downsample), input at previous stage's res
    for tag, planes, h, w in [
        ("s2h", 128, 64, 176),
        ("s3h", 256, 32, 88),
        ("s4h", 512, 16, 44),
    ]:
        cin = planes * 2
        x = jnp.asarray(rng.normal(size=(6, h, w, cin)), DT)
        blk = Bottleneck(planes=planes, stride=2, downsample=True, dtype=DT)
        v = blk.init(jax.random.PRNGKey(1), x)
        folded = fold_block_params(v["params"], v["batch_stats"])
        fd = fold_downsample_params(v["params"], v["batch_stats"])
        a = timed(lambda y: blk.apply(v, y, False), x, f"{tag} head XLA")
        b = timed(
            lambda y: bottleneck_down_fused_infer(y, folded, fd, 2), x,
            f"{tag} head fused",
        )
        print(f"  -> delta {b - a:+.3f} ms")

    # stem max-pool at 128x352x64
    from simpb_tpu.models.backbone import maxpool_3x3_s2
    x = jnp.asarray(rng.normal(size=(6, 128, 352, 64)), DT)
    a = timed(maxpool_3x3_s2, x, "maxpool XLA (shipped sep-slice)")
    b = timed(maxpool_3x3_s2_fused, x, "maxpool fused")
    print(f"  -> delta {b - a:+.3f} ms")

    # FPN 3x3 output conv at the P3 level (32x88x256)
    x = jnp.asarray(rng.normal(size=(6, 32, 88, 256)), DT)
    k = jnp.asarray(rng.normal(size=(3, 3, 256, 256)) * 0.05, DT)
    bias = jnp.zeros((256,), jnp.float32)

    def conv_xla(y):
        o = jax.lax.conv_general_dilated(
            y, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return o + bias.astype(DT)

    a = timed(conv_xla, x, "fpn conv3x3 XLA")
    b = timed(lambda y: conv3x3_bias_fused(y, k, bias), x, "fpn conv3x3 fused")
    print(f"  -> delta {b - a:+.3f} ms")


if __name__ == "__main__":
    main()
