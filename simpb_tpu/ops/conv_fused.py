"""Fused ResNet-bottleneck inference kernel (Pallas, TPU).

Why: at serving time the trunk is bandwidth-bound — XLA lowers each
bottleneck as 3 conv customs plus elementwise fusions, so the [N,H,W,C]
activation makes ~6 HBM round trips per block. This kernel computes a
whole stride-1 bottleneck (1x1 -> 3x3 -> 1x1 with BN folded, ReLUs, and
the residual add) in ONE pass: a (tile_h+2)-row halo tile of the input
is DMA'd to VMEM, the 64/128/256/512-channel intermediates never leave
VMEM, and only the final [tile_h, W, C] tile is written back — the
theoretical floor of one read + one write of the block's activation.

Semantics match `models/backbone.py::Bottleneck` in inference mode with
BatchNorm folded (capability parity with the reference's mmdet ResNet
bottleneck, mmdet/models/backbones/resnet.py; the reference fuses
conv+BN for deploy via tools/fuse_conv_bn.py:10-48 — here the fold
happens at trace time from the live BN statistics, so both raw and
pre-fused checkpoints hit the same kernel).

Layout notes (see /opt/skills/guides/pallas_guide.md): the channel dim
rides the 128-wide lane axis, the 3x3 taps become 9 shifted
`dot_general`s on the MXU (no im2col materialisation), halo rows come
from `pl.Element` block dims with (1, 1) padding, and out-of-image halo
positions (undefined memory) are masked to zero — exactly the zero
padding the reference convs use. Stage-head blocks (downsample skip
projection, stride-2 off stage 1) run in the `_kernel_down` variant —
stride-2 selection must slice REFS, not values (values lower as
unsupported >2D gathers) — and the stem max-pool has its own
single-pass kernel, so the whole post-stem trunk is Pallas.

The train path is untouched: gradients still flow through the flax
Bottleneck; this kernel is inference-only, like
`backbone.py::maxpool_3x3_s2`.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN_EPS = 1e-5  # torch parity (CLAUDE.md)


def fold_bn(bn: Dict, st: Dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trace-time BN fold: returns (scale f, bias b) in float32 such
    that BN(x) == x * f + b at inference. The single source of the
    fold formula for every fused-path call site (numerically the fold
    of `utils/fuse_bn.py::_fold_pair`)."""
    f = bn["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        st["var"].astype(jnp.float32) + BN_EPS
    )
    return f, bn["bias"].astype(jnp.float32) - st["mean"].astype(
        jnp.float32
    ) * f


def fold_block_params(params: Dict, stats: Dict) -> Tuple[jnp.ndarray, ...]:
    """Fold BN into conv weights for one bottleneck block.

    Returns (w1 [C, Cm], b1 [Cm], w2 [3, 3, Cm, Cm], b2 [Cm],
    w3 [Cm, C], b3 [C]) in float32.
    """

    def fold(conv_name, bn_name):
        k = params[conv_name]["kernel"].astype(jnp.float32)
        f, b = fold_bn(params[bn_name], stats[bn_name])
        return k * f, b

    k1, b1 = fold("conv1", "bn1")
    k2, b2 = fold("conv2", "bn2")
    k3, b3 = fold("conv3", "bn3")
    return k1[0, 0], b1, k2, b2, k3[0, 0], b3


def _kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, o_ref, y1_ref,
    *, tile_h: int, width: int, height: int, cdt,
):
    """One [tile_h, W] output tile of a stride-1 bottleneck.

    x_ref: [tile_h+2, W, C] H-halo tile (OOB rows undefined — the TPU
    lowering requires the last two block dims full, so only H carries
    the halo; the W halo is zero-padded in VMEM below),
    y1_ref: [tile_h+2, W+2, Cm] VMEM scratch, o_ref: [tile_h, W, C].
    """
    i = pl.program_id(1)
    x = x_ref[0]

    # conv1 1x1 + BN + relu over the whole halo tile, then zero the
    # rows that lie outside the image: that is exactly conv2's zero
    # padding (and it also kills the undefined OOB halo rows).
    y1 = jax.lax.dot_general(
        x.astype(cdt), w1_ref[:],
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y1 = jax.nn.relu(y1 + b1_ref[:][None, None, :])
    # 3-D iota: older Mosaic builds reject minor-dim-inserting mask
    # broadcasts on non-32-bit selects, so never broadcast a 2-D mask.
    gr = i * tile_h - 1 + jax.lax.broadcasted_iota(
        jnp.int32, y1.shape, 0
    )
    valid = (gr >= 0) & (gr < height)
    y1 = jnp.where(valid, y1, 0.0).astype(cdt)
    # conv2's W zero-padding, materialised in VMEM scratch
    y1_ref[:, 0, :] = jnp.zeros_like(y1_ref[:, 0, :])
    y1_ref[:, width + 1, :] = jnp.zeros_like(y1_ref[:, width + 1, :])
    y1_ref[:, 1 : width + 1, :] = y1

    # conv2 3x3: 9 shifted MXU contractions accumulated in f32
    acc = jnp.zeros((tile_h, width, w2_ref.shape[-1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            v = y1_ref[dy : dy + tile_h, dx : dx + width, :]
            acc = acc + jax.lax.dot_general(
                v, w2_ref[dy, dx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    y2 = jax.nn.relu(acc + b2_ref[:][None, None, :]).astype(cdt)

    # conv3 1x1 + BN, residual add, relu
    y3 = jax.lax.dot_general(
        y2, w3_ref[:],
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y3 = (y3 + b3_ref[:][None, None, :]).astype(x.dtype)
    xc = x_ref[0, 1 : tile_h + 1, :, :]
    o_ref[:] = jax.nn.relu(y3 + xc)


def fold_downsample_params(params: Dict, stats: Dict):
    """BN-fold of the downsample (skip-projection) conv of a stage-head
    bottleneck; returns (wd [C, Co], bd [Co]) in float32."""
    k = params["downsample_conv"]["kernel"].astype(jnp.float32)
    f, b = fold_bn(params["downsample_bn"], stats["downsample_bn"])
    return k[0, 0] * f, b


def _kernel_down(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, wd_ref,
    bd_ref, o_ref, y1_ref,
    *, tile_h: int, width: int, height: int, stride: int, cdt,
):
    """One [tile_h, W//stride] output tile of a stage-head bottleneck
    (1x1 -> 3x3/stride -> 1x1 plus a strided 1x1 skip projection).

    x_ref: [1, stride*tile_h+2, W, C] H-halo tile of the INPUT
    resolution; y1_ref: [stride*tile_h+2, W+2, Cm] scratch;
    o_ref: [tile_h, W//stride, Co]. Stride-2 W selection uses
    sublane-strided slices; stride-2 rows are outer-dim strides.
    """
    i = pl.program_id(1)
    s = stride
    rows = s * tile_h + 2
    out_w = width // s
    x = x_ref[0]

    y1 = jax.lax.dot_general(
        x.astype(cdt), w1_ref[:],
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y1 = jax.nn.relu(y1 + b1_ref[:][None, None, :])
    gr = i * s * tile_h - 1 + jax.lax.broadcasted_iota(
        jnp.int32, y1.shape, 0
    )
    valid = (gr >= 0) & (gr < height)
    y1 = jnp.where(valid, y1, 0.0).astype(cdt)
    y1_ref[:, 0, :] = jnp.zeros_like(y1_ref[:, 0, :])
    y1_ref[:, width + 1, :] = jnp.zeros_like(y1_ref[:, width + 1, :])
    y1_ref[:, 1 : width + 1, :] = y1

    acc = jnp.zeros((tile_h, out_w, w2_ref.shape[-1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            v = y1_ref[
                dy : dy + s * tile_h : s,
                dx : dx + s * (out_w - 1) + 1 : s,
                :,
            ]
            acc = acc + jax.lax.dot_general(
                v, w2_ref[dy, dx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    y2 = jax.nn.relu(acc + b2_ref[:][None, None, :]).astype(cdt)

    y3 = jax.lax.dot_general(
        y2, w3_ref[:],
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y3 = y3 + b3_ref[:][None, None, :]

    # skip projection: 1x1/stride on the raw input (no padding).
    # NOTE: slice the REF, not the loaded value — strided slices lower
    # as strided VMEM loads on refs but as (unsupported >2D) gathers on
    # values.
    xs = x_ref[0, 1 : 1 + s * tile_h : s, 0 : s * (out_w - 1) + 1 : s, :]
    xd = jax.lax.dot_general(
        xs.astype(cdt), wd_ref[:],
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xd = xd + bd_ref[:][None, None, :]
    o_ref[:] = jax.nn.relu(y3 + xd).astype(cdt)


def bottleneck_down_fused_infer(
    x: jnp.ndarray,
    folded: Tuple[jnp.ndarray, ...],
    folded_down: Tuple[jnp.ndarray, jnp.ndarray],
    stride: int,
    *,
    tile_h: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Apply one stage-head bottleneck (downsample skip, stride 1 or 2)."""
    b, h, w, c = x.shape
    w1, b1, w2, b2, w3, b3 = folded
    wd, bd = folded_down
    cm, co = w1.shape[1], w3.shape[1]
    cdt = x.dtype
    w1, w2, w3, wd = (
        w1.astype(cdt), w2.astype(cdt), w3.astype(cdt), wd.astype(cdt)
    )
    oh, ow = h // stride, w // stride
    it = jnp.dtype(cdt).itemsize
    row_bytes = (
        2 * stride * w * c * it  # input tile, double-buffered
        + 2 * ow * co * it  # output tile, double-buffered
        + stride * (w + 2) * _lane(cm) * it  # y1 scratch
        + ow * _lane(cm) * 4  # f32 accumulator
    )
    fixed = (c * cm + 9 * cm * cm + cm * co + c * co) * it + 2 * (
        2 * w * c * it + (w + 2) * _lane(cm) * it
    )
    th = tile_h or pick_tile_h(oh, row_bytes, fixed)
    rows = stride * th + 2

    const = lambda a: pl.BlockSpec(
        a.shape, lambda bi, hi: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    kern = functools.partial(
        _kernel_down, tile_h=th, width=w, height=h, stride=stride,
        cdt=cdt,
    )
    return pl.pallas_call(
        kern,
        grid=(b, oh // th),
        in_specs=[
            pl.BlockSpec(
                (
                    pl.Element(1, (0, 0)),
                    pl.Element(rows, (1, 1)),
                    pl.Element(w, (0, 0)),
                    pl.Element(c, (0, 0)),
                ),
                lambda bi, hi, s=stride, t=th: (bi, hi * s * t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            const(w1), const(b1), const(w2), const(b2), const(w3),
            const(b3), const(wd), const(bd),
        ],
        out_specs=pl.BlockSpec(
            (pl.Squeezed(), th, ow, co),
            lambda bi, hi: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, co), cdt),
        scratch_shapes=[pltpu.VMEM((rows, w + 2, cm), cdt)],
        interpret=interpret,
    )(x, w1, b1, w2, b2, w3, b3, wd, bd)


def _conv3x3_kernel(
    x_ref, w_ref, b_ref, o_ref, xp_ref,
    *, tile_h: int, width: int, height: int, cdt,
):
    """One [tile_h, W] tile of a same-padding 3x3 conv + bias.

    x_ref: [1, tile_h+2, W, C] H-halo tile; xp_ref: [tile_h+2, W+2, C]
    VMEM scratch holding the W-zero-padded tile; o_ref: [tile_h, W, Co]
    (batch dim squeezed).
    """
    i = pl.program_id(1)
    gr = i * tile_h - 1 + jax.lax.broadcasted_iota(
        jnp.int32, x_ref.shape[1:], 0
    )
    valid = (gr >= 0) & (gr < height)
    x = jnp.where(valid, x_ref[0], 0).astype(cdt)
    xp_ref[:, 0, :] = jnp.zeros_like(xp_ref[:, 0, :])
    xp_ref[:, width + 1, :] = jnp.zeros_like(xp_ref[:, width + 1, :])
    xp_ref[:, 1 : width + 1, :] = x
    acc = jnp.zeros((tile_h, width, w_ref.shape[-1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            v = xp_ref[dy : dy + tile_h, dx : dx + width, :]
            acc = acc + jax.lax.dot_general(
                v, w_ref[dy, dx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[:] = (acc + b_ref[:][None, None, :]).astype(cdt)


def conv3x3_bias_fused(
    x: jnp.ndarray,
    kernel: jnp.ndarray,  # [3, 3, C, Co]
    bias: jnp.ndarray,  # [Co]
    *,
    tile_h: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Same-padding 3x3 conv + bias as a halo-tiled Pallas kernel
    (serving path for the FPN output convs, see
    `backbone.py::fused_fpn_infer`)."""
    b, h, w, c = x.shape
    co = kernel.shape[-1]
    cdt = x.dtype
    it = jnp.dtype(cdt).itemsize
    row_bytes = (
        2 * w * c * it + 2 * w * co * it
        + (w + 2) * _lane(c) * it + w * _lane(co) * 4
    )
    fixed = 9 * c * co * it + 2 * (w * c * it + (w + 2) * _lane(c) * it)
    th = tile_h or pick_tile_h(h, row_bytes, fixed)
    const = lambda a: pl.BlockSpec(
        a.shape, lambda bi, hi: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    kern = functools.partial(
        _conv3x3_kernel, tile_h=th, width=w, height=h, cdt=cdt
    )
    return pl.pallas_call(
        kern,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(
                (
                    pl.Element(1, (0, 0)),
                    pl.Element(th + 2, (1, 1)),
                    pl.Element(w, (0, 0)),
                    pl.Element(c, (0, 0)),
                ),
                lambda bi, hi: (bi, hi * th, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            const(kernel.astype(cdt)),
            const(bias.astype(jnp.float32)),
        ],
        out_specs=pl.BlockSpec(
            (pl.Squeezed(), th, w, co),
            lambda bi, hi: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), cdt),
        scratch_shapes=[pltpu.VMEM((th + 2, w + 2, c), cdt)],
        interpret=interpret,
    )(x, kernel.astype(cdt), bias.astype(jnp.float32))


def _maxpool_kernel(x_ref, o_ref, xp_ref, *, tile_h, width, height, cdt):
    """One [tile_h, W//2] tile of a 3x3/s2/p1 max-pool.

    x_ref: [1, 2*tile_h+1, W, C] H-halo tile; xp_ref:
    [2*tile_h+1, W+2, C] scratch with -inf W borders; o_ref:
    [tile_h, W//2, C].
    """
    i = pl.program_id(1)
    neg = jnp.asarray(-jnp.inf, cdt)
    gr = 2 * i * tile_h - 1 + jax.lax.broadcasted_iota(
        jnp.int32, x_ref.shape[1:], 0
    )
    valid = (gr >= 0) & (gr < height)
    xp_ref[:, 0, :] = jnp.full_like(xp_ref[:, 0, :], neg)
    xp_ref[:, width + 1, :] = jnp.full_like(xp_ref[:, width + 1, :], neg)
    xp_ref[:, 1 : width + 1, :] = jnp.where(
        valid, x_ref[0], neg
    ).astype(cdt)
    out_w = width // 2
    acc = None
    for dy in range(3):
        for dx in range(3):
            v = xp_ref[
                dy : dy + 2 * tile_h : 2,
                dx : dx + 2 * (out_w - 1) + 1 : 2,
                :,
            ]
            acc = v if acc is None else jnp.maximum(acc, v)
    o_ref[:] = acc


def maxpool_3x3_s2_fused(
    x: jnp.ndarray, *, tile_h: int | None = None, interpret: bool = False
) -> jnp.ndarray:
    """3x3/s2/p1 max-pool as one halo-tiled Pallas pass (serving path;
    forward-identical to `backbone.py::maxpool_3x3_s2`, which measures
    0.30 ms (r50 stem shape) / 1.4+ ms (r101) against a ~0.01-0.05 ms
    bandwidth floor)."""
    b, h, w, c = x.shape
    cdt = x.dtype
    oh, ow = h // 2, w // 2
    it = jnp.dtype(cdt).itemsize
    row_bytes = (
        4 * w * c * it  # 2 input rows per output row, double-buffered
        + 2 * ow * c * it + 2 * (w + 2) * _lane(c) * it
    )
    th = tile_h or pick_tile_h(oh, row_bytes, (w + 2) * _lane(c) * it)
    kern = functools.partial(
        _maxpool_kernel, tile_h=th, width=w, height=h, cdt=cdt
    )
    return pl.pallas_call(
        kern,
        grid=(b, oh // th),
        in_specs=[
            pl.BlockSpec(
                (
                    pl.Element(1, (0, 0)),
                    pl.Element(2 * th + 1, (1, 1)),
                    pl.Element(w, (0, 0)),
                    pl.Element(c, (0, 0)),
                ),
                lambda bi, hi, t=th: (bi, 2 * hi * t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (pl.Squeezed(), th, ow, c),
            lambda bi, hi: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, c), cdt),
        scratch_shapes=[pltpu.VMEM((2 * th + 1, w + 2, c), cdt)],
        interpret=interpret,
    )(x)


VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom in ~16 MB/core


def _lane(c: int) -> int:
    return max(c, 128)  # lane-dim padding in VMEM


def pick_tile_h(
    height: int, row_bytes: int, fixed_bytes: int = 0, cap: int = 64
) -> int:
    """Largest power-of-two divisor of `height` (<= cap) such that
    `row_bytes * th + fixed_bytes` fits the VMEM budget. `row_bytes`
    must already include double-buffering on the in/out blocks;
    `fixed_bytes` covers weights and halo rows."""
    th = 1
    while (
        th * 2 <= min(height, cap)
        and height % (th * 2) == 0
        and row_bytes * (th * 2) + fixed_bytes <= VMEM_BUDGET
    ):
        th *= 2
    return th


def bottleneck_fused_infer(
    x: jnp.ndarray,
    folded: Tuple[jnp.ndarray, ...],
    *,
    tile_h: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Apply one stride-1, non-downsample bottleneck block.

    x: [B, H, W, C] activations (any float dtype; compute runs in
    x.dtype with f32 accumulation). Returns [B, H, W, C].
    """
    b, h, w, c = x.shape
    w1, b1, w2, b2, w3, b3 = folded
    cm = w1.shape[1]
    cdt = x.dtype
    w1, w2, w3 = w1.astype(cdt), w2.astype(cdt), w3.astype(cdt)
    it = jnp.dtype(cdt).itemsize
    row_bytes = (
        4 * w * c * it  # in + out tiles, double-buffered
        + (w + 2) * _lane(cm) * it  # y1 scratch
        + w * _lane(cm) * 4  # f32 accumulator
    )
    fixed = (2 * c * cm + 9 * cm * cm) * it + 2 * (
        w * c * it + (w + 2) * _lane(cm) * it
    )
    th = tile_h or pick_tile_h(h, row_bytes, fixed)

    const = lambda a: pl.BlockSpec(
        a.shape, lambda bi, hi: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    kern = functools.partial(
        _kernel, tile_h=th, width=w, height=h, cdt=cdt
    )
    return pl.pallas_call(
        kern,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(
                # the TPU lowering requires all-Element (or no-Element)
                # block dims; only H actually carries a halo
                (
                    pl.Element(1, (0, 0)),
                    pl.Element(th + 2, (1, 1)),
                    pl.Element(w, (0, 0)),
                    pl.Element(c, (0, 0)),
                ),
                lambda bi, hi: (bi, hi * th, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            const(w1), const(b1), const(w2), const(b2), const(w3),
            const(b3),
        ],
        out_specs=pl.BlockSpec(
            (pl.Squeezed(), th, w, c),
            lambda bi, hi: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((th + 2, w + 2, cm), cdt)],
        interpret=interpret,
    )(x, w1, b1, w2, b2, w3, b3)
