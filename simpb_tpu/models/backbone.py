"""ResNet backbone + FPN neck, TPU-native (Flax linen, NHWC, bf16-ready).

Capability equivalent of the reference's mmdet `ResNet` (depth 50/101,
style="pytorch", norm BN, out_indices (0,1,2,3), with_cp — see
projects/configs/simpb_nus_r50_img_704x256.py:79-90) and mmdet `FPN`
(in [256,512,1024,2048] -> 256 x 4 levels, add_extra_convs="on_output",
relu_before_extra_convs — config:91-99). Parameter structure mirrors the
torchvision layout so released torch checkpoints convert 1:1
(see simpb_tpu/utils/torch_convert.py).

TPU notes: channels-last, convolutions hit the MXU directly; stages can
be rematerialised (`remat=True`) to mirror the reference's `with_cp=True`
activation checkpointing.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

ModuleDef = Any

RESNET_STAGE_BLOCKS = {
    # depth 26 = one bottleneck per stage: not a reference config —
    # exists for sharding dryruns/CI where compile time matters and the
    # trunk only needs to produce the 4-level pyramid (same structure,
    # 1/4 the blocks; see __graft_entry__.py::dryrun_multichip)
    26: (1, 1, 1, 1),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
}

# 1x1 convs with at least this many output rows (N*H*W) take the
# reshape-matmul path in Conv1x1 (see its docstring for measurements).
MATMUL_MIN_ROWS = 128 * 1024


def conv1x1_apply(
    x: jnp.ndarray,
    kernel: jnp.ndarray,  # [1, 1, C, Co]
    bias: jnp.ndarray | None = None,
    min_rows: int | None = None,
) -> jnp.ndarray:
    """1x1 conv with the measured matmul/conv routing — the single
    implementation behind both the Conv1x1 module and the fused
    serving FPN (see Conv1x1's docstring for the measurements)."""
    n, h, w, c = x.shape
    mr = MATMUL_MIN_ROWS if min_rows is None else min_rows
    if n * h * w >= mr:
        y = (x.reshape(n * h * w, c) @ kernel[0, 0]).reshape(
            n, h, w, kernel.shape[-1]
        )
    else:
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    if bias is not None:
        y = y + bias
    return y


class Conv1x1(nn.Module):
    """1x1 conv that may lower as a matmul (param-compatible `nn.Conv`).

    XLA:TPU's conv lowering runs LARGE-spatial 1x1 convs 3-4.6x slower
    than the equivalent flat matmul at the same bytes (tools/conv_study.py
    `--part stage1`: 1x1 256->64 @[6,352,128] 0.71 ms conv vs 0.15 ms
    matmul, i.e. the matmul sits on the HBM floor). BUT a dot op placed
    INSIDE the conv trunk makes XLA's layout assignment insert large
    relayout copies around it and the whole trunk measures 3-7 ms SLOWER
    (r101 trunk A/B: conv 12.9 ms, any 1x1-as-dot 15.5-19.5 ms, whole
    stage1 as dots 20.2 ms) — so this module is used ONLY at the trunk
    boundary (FPN laterals, where lateral_0-as-matmul measured -0.4 ms
    at r101 with zero trunk impact), and only above a row-count
    threshold that keeps r50-sized maps on the conv lowering. The
    kernel param keeps the `[1, 1, in, out]` conv layout so torch
    checkpoint conversion and `fuse_bn` are unchanged.
    """

    features: int
    stride: int = 1
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    matmul_min_rows: int | None = None  # None -> MATMUL_MIN_ROWS global

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, x.shape[-1], self.features),
        )
        x = x.astype(self.dtype)
        if self.stride != 1:
            x = x[:, :: self.stride, :: self.stride]
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            .astype(self.dtype)
            if self.use_bias
            else None
        )
        return conv1x1_apply(
            x, kernel.astype(self.dtype), bias, self.matmul_min_rows
        )


class Bottleneck(nn.Module):
    """Torch-style bottleneck: 1x1 -> 3x3(stride) -> 1x1(4x), residual."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # NOTE: every trunk conv stays on the nn.Conv lowering — 1x1-as-
        # matmul wins in isolation but poisons trunk-wide layout
        # assignment (see Conv1x1 docstring); measured, do not "fix".
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=False, dtype=self.dtype, name=name,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        identity = x
        out = nn.relu(bn("bn1")(conv(self.planes, 1, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.planes, 3, self.stride, "conv2")(out)))
        out = bn("bn3")(conv(self.planes * 4, 1, 1, "conv3")(out))
        if self.downsample:
            identity = bn("downsample_bn")(
                conv(self.planes * 4, 1, self.stride, "downsample_conv")(x)
            )
        return nn.relu(out + identity)


class StemConv(nn.Module):
    """7x7 stride-2 stem conv with an optional space-to-depth fast path.

    The plain 7x7/s2 stem is the single largest non-gather kernel on TPU
    (PERF.md lever #4): 3 input channels starve the MXU and the stride
    defeats tiling. The s2d path computes the IDENTICAL function —
    space-to-depth(2) rearranges the image to 12 channels at half
    resolution, and the 7x7/s2 kernel folds exactly into a 4x4/s1 kernel
    with asymmetric (2,1) padding (tap k of the 7-tap window lands in
    s2d cell floor((k-3)/2) at parity (k-3) mod 2; the one missing
    (cell -2, parity 0) position carries zero weight). Exactness is
    tested in tests/test_backbone.py; the param keeps the torchvision
    conv1 7x7 layout so checkpoint conversion is unchanged.
    """

    features: int = 64
    s2d: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, x.shape[-1], self.features),
        )
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        if not self.s2d or x.shape[1] % 2 or x.shape[2] % 2:
            return jax.lax.conv_general_dilated(
                x, kernel, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        b, h, w, c = x.shape
        xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        w2 = jnp.zeros((4, 4, 4 * c, self.features), kernel.dtype)
        for ty in range(7):
            ay, by = (ty - 3) // 2 + 2, (ty - 3) % 2
            for tx in range(7):
                ax, bx = (tx - 3) // 2 + 2, (tx - 3) % 2
                ch = (by * 2 + bx) * c
                w2 = w2.at[ay, ax, ch : ch + c].set(kernel[ty, tx])
        return jax.lax.conv_general_dilated(
            xs, w2, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


def maxpool_3x3_s2(y: jnp.ndarray) -> jnp.ndarray:
    """3x3/s2/p1 max-pool via separable 3-tap maxes over stride-2 slices.

    Forward exactly equals `nn.max_pool(y, (3,3), (2,2), p1)` (asserted
    in tests/test_backbone.py) but avoids XLA:TPU's reduce_window
    lowering, which measured 0.56 ms/frame vs 0.30 ms for this
    formulation at the stem's [6,128,352,64] (tools/pool_study.py,
    no-op-control-corrected). Gradient caveat: at exactly-tied window
    maxima `jnp.maximum` splits the cotangent 50/50 while
    select-and-scatter (and torch) route it to one element — so the
    TRAIN path keeps nn.max_pool (ResNet.__call__) and this formulation
    serves inference, where forwards are bit-identical.

    Formulation is shape-adaptive: at the r50 stem shape [6,128,352,64]
    the stride-2-slice separable maxes win (0.30 vs 0.56 ms for
    reduce_window, tools/pool_study.py), but at the r101 stem shape
    [6,256,704,64] the ordering FLIPS (slice-max 2.23 vs reduce_window
    1.37 ms net, tools/conv_study.py --part stage1) — so large inputs
    take the reduce_window lowering. Both are exact.
    """
    if y.shape[1] * y.shape[2] >= 256 * 704:
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)),
        )
    neg = jnp.asarray(-jnp.inf, y.dtype)
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    n, hp, wp, c = yp.shape
    oh = (hp - 3) // 2 + 1
    h = jnp.maximum(
        jnp.maximum(yp[:, 0 : 2 * oh : 2], yp[:, 1 : 2 * oh : 2]),
        yp[:, 2 : 2 * oh + 1 : 2],
    )
    ow = (wp - 3) // 2 + 1
    return jnp.maximum(
        jnp.maximum(h[:, :, 0 : 2 * ow : 2], h[:, :, 1 : 2 * ow : 2]),
        h[:, :, 2 : 2 * ow + 1 : 2],
    )


def upsample2x_nearest(x: jnp.ndarray, tgt_hw) -> jnp.ndarray:
    """Nearest-neighbour upsample to `tgt_hw`; exact-2x targets take a
    broadcast-reshape (no gather), others fall back to jax.image.resize."""
    n, h, w, c = x.shape
    if tgt_hw == (2 * h, 2 * w):
        return jnp.broadcast_to(
            x[:, :, None, :, None, :], (n, h, 2, w, 2, c)
        ).reshape(n, 2 * h, 2 * w, c)
    return jax.image.resize(x, (n,) + tuple(tgt_hw) + (c,), method="nearest")


class ResNet(nn.Module):
    """ResNet-50/101 trunk returning C2..C5 feature maps (NHWC)."""

    depth: int = 50
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # reference with_cp=True (config:86)
    stem_s2d: bool = False  # exact-equivalent s2d stem (see configs/base.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        stage_blocks = RESNET_STAGE_BLOCKS[self.depth]
        x = StemConv(
            features=64, s2d=self.stem_s2d, dtype=self.dtype, name="conv1"
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(x)
        x = nn.relu(x)
        if train:
            # gradient parity with torch/reduce_window at tied maxima
            # (see maxpool_3x3_s2 docstring); forwards are identical
            x = nn.max_pool(
                x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
            )
        else:
            x = maxpool_3x3_s2(x)

        block_cls = Bottleneck
        if self.remat:
            block_cls = nn.remat(Bottleneck, static_argnums=(2,))

        outs = []
        for stage, num_blocks in enumerate(stage_blocks):
            planes = 64 * (2**stage)
            for i in range(num_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = block_cls(
                    planes=planes,
                    stride=stride,
                    downsample=(i == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x, train)
            outs.append(x)
        return outs


def fused_resnet_infer(
    variables,
    x: jnp.ndarray,
    depth: int = 50,
    dtype: jnp.dtype = jnp.float32,
    interpret: bool = False,
):
    """Serving-path trunk: ResNet inference over the SAME variable tree
    as `ResNet.apply(..., train=False)`, with every stride-1 bottleneck
    executed by the fused Pallas kernel (`ops/conv_fused.py`) — one HBM
    read + one write per block instead of XLA's ~6 passes. Stem, pool,
    and the 4 stride/downsample blocks reuse the exact module code, so
    outputs match `ResNet.apply` to f32-fold rounding
    (tests/test_conv_fused.py).
    """
    from ..ops.conv_fused import (
        bottleneck_down_fused_infer, bottleneck_fused_infer, fold_bn,
        fold_block_params, fold_downsample_params, maxpool_3x3_s2_fused,
    )

    params, stats = variables["params"], variables["batch_stats"]

    x = x.astype(dtype)
    k = params["conv1"]["kernel"].astype(dtype)
    x = jax.lax.conv_general_dilated(
        x, k, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    f, b = fold_bn(params["bn1"], stats["bn1"])
    x = nn.relu((x.astype(jnp.float32) * f + b).astype(dtype))
    if x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        x = maxpool_3x3_s2_fused(x, interpret=interpret)
    else:
        x = maxpool_3x3_s2(x)

    outs = []
    for stage, num_blocks in enumerate(RESNET_STAGE_BLOCKS[depth]):
        for i in range(num_blocks):
            name = f"layer{stage + 1}_{i}"
            folded = fold_block_params(params[name], stats[name])
            if i == 0:  # stage head: downsample skip (+stride 2 off s1)
                x = bottleneck_down_fused_infer(
                    x, folded,
                    fold_downsample_params(params[name], stats[name]),
                    2 if stage > 0 else 1,
                    interpret=interpret,
                )
            else:
                x = bottleneck_fused_infer(
                    x, folded, interpret=interpret
                )
        outs.append(x)
    return outs


def fused_fpn_infer(
    variables,
    inputs,
    dtype: jnp.dtype = jnp.float32,
    interpret: bool = False,
):
    """Serving-path FPN over the same variable tree as `FPN.apply` for
    the released 4-in/4-out configuration: laterals (Conv1x1 routing
    preserved), top-down broadcast upsample adds, and the 3x3 output
    convs via the fused Pallas kernel (`ops/conv_fused.py`)."""
    from ..ops.conv_fused import conv3x3_bias_fused

    p = variables["params"]
    laterals = [
        conv1x1_apply(
            x.astype(dtype),
            p[f"lateral_{i}"]["kernel"].astype(dtype),
            p[f"lateral_{i}"]["bias"].astype(dtype),
        )
        for i, x in enumerate(inputs)
    ]
    for i in range(len(laterals) - 1, 0, -1):
        up = upsample2x_nearest(laterals[i], laterals[i - 1].shape[1:3])
        laterals[i - 1] = laterals[i - 1] + up
    return [
        conv3x3_bias_fused(
            lat, p[f"fpn_{i}"]["kernel"], p[f"fpn_{i}"]["bias"],
            interpret=interpret,
        )
        for i, lat in enumerate(laterals)
    ]


class FPN(nn.Module):
    """mmdet-equivalent FPN: laterals + top-down nearest upsample + 3x3."""

    out_channels: int = 256
    num_outs: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        laterals = [
            Conv1x1(
                self.out_channels, use_bias=True, dtype=self.dtype,
                name=f"lateral_{i}",
            )(x)
            for i, x in enumerate(inputs)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = upsample2x_nearest(
                laterals[i], laterals[i - 1].shape[1:3]
            )
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(
                self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                use_bias=True, dtype=self.dtype, name=f"fpn_{i}",
            )(lat)
            for i, lat in enumerate(laterals)
        ]
        # num_outs == len(inputs) for the released configs (4 levels); the
        # "on_output" extra-conv path (mmdet FPN) kicks in only when more
        # outputs than inputs are requested.
        num_inputs = len(outs)
        for i in range(num_inputs, self.num_outs):
            # mmdet applies relu_before_extra_convs only from the SECOND
            # extra conv onward; the first takes outs[-1] un-activated
            src = outs[-1] if i == num_inputs else nn.relu(outs[-1])
            outs.append(
                nn.Conv(
                    self.out_channels, (3, 3), strides=(2, 2),
                    padding=[(1, 1), (1, 1)], use_bias=True, dtype=self.dtype,
                    name=f"fpn_extra_{i}",
                )(src)
            )
        return outs


class DenseDepthNet(nn.Module):
    """Auxiliary per-level 1x1-conv depth head.

    Mirrors reference models/blocks.py:264-301: `exp()` activation scaled
    by focal/equal_focal; used for training-time supervision only.
    """

    num_depth_layers: int = 3
    equal_focal: float = 100.0
    max_depth: float = 60.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feature_maps: Sequence[jnp.ndarray], focal=None):
        """feature_maps: per-level [bs, cams, H, W, C]; focal: [bs, cams]."""
        depths = []
        for i, feat in enumerate(feature_maps[: self.num_depth_layers]):
            bs, cams = feat.shape[:2]
            d = nn.Conv(
                1, (1, 1), use_bias=True, dtype=jnp.float32,
                name=f"depth_layer_{i}",
            )(feat.astype(jnp.float32))
            d = jnp.exp(d)[..., 0]  # [bs, cams, H, W]
            if focal is not None:
                d = d * (focal[:, :, None, None] / self.equal_focal)
            depths.append(d)
        return depths


def dense_depth_loss(
    depth_preds: Sequence[jnp.ndarray],
    gt_depths: Sequence[jnp.ndarray],
    max_depth: float = 60.0,
    loss_weight: float = 0.2,
) -> jnp.ndarray:
    """Sparse L1 depth loss (reference models/blocks.py:303-322).

    gt_depths: per-level [bs, cams, H, W], zero where unsupervised.
    """
    total = 0.0
    num_levels = len(depth_preds)
    for pred, gt in zip(depth_preds, gt_depths):
        pred = pred.astype(jnp.float32).reshape(-1)
        gt = gt.astype(jnp.float32).reshape(-1)
        fg = (gt > 0.0) & jnp.isfinite(pred)
        pred = jnp.clip(pred, 0.0, max_depth)
        err = jnp.where(fg, jnp.abs(pred - gt), 0.0).sum()
        denom = jnp.maximum(fg.sum().astype(jnp.float32) * num_levels, 1.0)
        total = total + err / denom * loss_weight
    return total
