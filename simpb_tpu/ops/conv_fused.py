"""Fused ResNet-bottleneck inference kernel (Pallas, TPU).

Why: each kernel computes a whole stride-1 bottleneck (1x1 -> 3x3 ->
1x1 with BN folded, ReLUs, and the residual add) in ONE pass: a tile
of the input plus its two halo rows is DMA'd to VMEM, the
64/128/256/512-channel intermediates never leave VMEM, and only the
final [tile_h, W, C] tile is written back — the theoretical floor of
one read + one write of the block's activation.

MEASURED OUTCOME (on-chip A/B, tools/fused_study.py + bench, PERF.md):
XLA's own conv+BN+relu+residual fusion already sits at that floor on
this toolchain — stride-1 blocks and FPN convs tie, and the stride-2
variants LOSE to the parity-plane destride overhead the deployment
Mosaic forces (fused trunk end-to-end 62.3 vs 76.9 fps control). The
`backbone_fused_infer` flag therefore stays OFF by default; the file
is kept as a tested capability and as the repo's worked example of
deployment-Mosaic-compatible kernel authoring.

Semantics match `models/backbone.py::Bottleneck` in inference mode with
BatchNorm folded (capability parity with the reference's mmdet ResNet
bottleneck, mmdet/models/backbones/resnet.py; the reference fuses
conv+BN for deploy via tools/fuse_conv_bn.py:10-48 — here the fold
happens at trace time from the live BN statistics, so both raw and
pre-fused checkpoints hit the same kernel).

Layout notes (see /opt/skills/guides/pallas_guide.md): the channel dim
rides the 128-wide lane axis and the 3x3 taps become 9 shifted
`dot_general`s on the MXU (no im2col materialisation).

Deployment-Mosaic compatibility (the axon remote compiler is older
than the local lowering; every construct below is probe-verified
on-chip): `pl.Element` halo block specs fail with "Failed to set
window params", so halos are carried by TWO extra 1-row Blocked inputs
whose index maps clamp at the image edges (the kernel masks the
out-of-image rows itself — that is exactly the convs' zero padding /
the pool's -inf padding). Strided VMEM loads are unsupported for
sub-32-bit data and demand a 128-lane base memref even for f32, so
every stride-2 selection (stage-head conv2/skip, max-pool) instead
loads the full contiguous window and destrides it with a
sublane-splitting reshape + unit middle-dim index (`_destride`),
which lowers fine at any dtype/width.

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


def _halo_specs(block_h: int, w: int, c: int, h: int):
    """Input specs for one H-tiled array read with a 1-row halo on each
    side: (top-halo-row, main tile, bottom-halo-row). Index maps clamp
    at the image edges; the kernel must mask the clamped rows (they
    hold in-image data then, not the conv's zero padding)."""
    nh = h  # rows; block-H 1 => block index == row index
    top = pl.BlockSpec(
        (1, 1, w, c),
        lambda bi, hi, bh=block_h: (bi, jnp.maximum(hi * bh - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    main = pl.BlockSpec(
        (1, block_h, w, c),
        lambda bi, hi: (bi, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    bot = pl.BlockSpec(
        (1, 1, w, c),
        lambda bi, hi, bh=block_h, last=nh - 1: (
            bi, jnp.minimum(hi * bh + bh, last), 0, 0,
        ),
        memory_space=pltpu.VMEM,
    )
    return [top, main, bot]


def _kernel(
    top_ref, x_ref, bot_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
    b3_ref, o_ref, y1_ref,
    *, tile_h: int, width: int, height: int, cdt,
):
    """One [tile_h, W] output tile of a stride-1 bottleneck.

    x_ref: [1, tile_h, W, C] main tile; top_ref/bot_ref: [1, 1, W, C]
    halo rows (edge-clamped — masked below); y1_ref:
    [tile_h+2, W+2, Cm] VMEM scratch; o_ref: [1, tile_h, W, C].
    """
    i = pl.program_id(1)
    x = x_ref[0]

    def conv1(v):  # 1x1 + folded BN + relu, f32 out
        y = jax.lax.dot_general(
            v.astype(cdt), w1_ref[:],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.nn.relu(y + b1_ref[:][None, None, :])

    # conv2's W zero-padding columns, then the three row bands. The
    # halo rows are zeroed when they fall outside the image — that IS
    # conv2's zero padding (masks act on f32: 32-bit selects only).
    y1_ref[:, 0, :] = jnp.zeros_like(y1_ref[:, 0, :])
    y1_ref[:, width + 1, :] = jnp.zeros_like(y1_ref[:, width + 1, :])
    y1_ref[1 : tile_h + 1, 1 : width + 1, :] = conv1(x).astype(cdt)
    y1t = jnp.where(i * tile_h - 1 >= 0, conv1(top_ref[0]), 0.0)
    y1_ref[0:1, 1 : width + 1, :] = y1t.astype(cdt)
    y1b = jnp.where(
        i * tile_h + tile_h < height, conv1(bot_ref[0]), 0.0
    )
    y1_ref[tile_h + 1 : tile_h + 2, 1 : width + 1, :] = y1b.astype(cdt)

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
    o_ref[0] = jax.nn.relu(y3 + x)


def fold_downsample_params(params: Dict, stats: Dict):
    """BN-fold of the downsample (skip-projection) conv of a stage-head
    bottleneck; returns (wd [C, Co], bd [Co]) in float32."""
    k = params["downsample_conv"]["kernel"].astype(jnp.float32)
    f, b = fold_bn(params["downsample_bn"], stats["downsample_bn"])
    return k[0, 0] * f, b


def _destride(v, s: int, th: int, ow: int):
    """Stride-`s` selection of rows/cols of a loaded [s*th, s*ow, C]
    value via reshape + unit middle-dim select. The deployment Mosaic
    has no general strided VMEM loads (bf16 unsupported; f32 only with
    a 128-lane base memref), but sublane-splitting reshapes plus a
    unit index on the new dims lower fine (probe-verified on-chip)."""
    if s == 1:
        return v
    c = v.shape[-1]
    return v.reshape(th, s, ow, s, c)[:, 0, :, 0, :]


def _fill_parity_planes(src_ref, pp_ref, th: int, ow: int):
    """Deinterleave a [2*th+2, 2*ow+2, C] padded tile into its four
    stride-2 parity planes: pp[pr, pc, j, k] = src[pr + 2j, pc + 2k].

    A 3x3/s2 tap (dy, dx) then reads the contiguous ref slice
    pp[dy%2, dx%2, dy//2 : dy//2+th, dx//2 : dx//2+ow] — materialising
    the planes once keeps the Mosaic vector stack small (nine live
    full-window reshape temporaries blow the 16 MB scoped-vmem limit
    at stem shapes)."""
    c = src_ref.shape[-1]
    for pr in range(2):
        nr = th + 1 - pr  # parity-0 rows serve dy=2's +1 offset
        for pc in range(2):
            nc = ow + 1 - pc
            win = src_ref[pr : pr + 2 * nr, pc : pc + 2 * nc, :]
            pp_ref[pr, pc, :nr, :nc, :] = win.reshape(
                nr, 2, nc, 2, c
            )[:, 0, :, 0, :]


def _kernel_down(
    top_ref, x_ref, bot_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
    b3_ref, wd_ref, bd_ref, o_ref, y1_ref, pp_ref,
    *, tile_h: int, width: int, height: int, stride: int, cdt,
):
    """One [tile_h, W//stride] output tile of a stage-head bottleneck
    (1x1 -> 3x3/stride -> 1x1 plus a strided 1x1 skip projection).

    x_ref: [1, stride*tile_h, W, C] main tile at the INPUT resolution;
    top/bot: 1-row edge-clamped halos. y1_ref:
    [stride*tile_h+2, W+2, Cm] scratch; pp_ref (stride 2 only):
    [2, 2, tile_h+1, W//2+1, Cm] parity planes of y1. Stride-2
    selection goes through parity planes / `_destride` (contiguous
    load + reshape), never strided loads. o_ref:
    [1, tile_h, W//stride, Co].
    """
    i = pl.program_id(1)
    s = stride
    out_w = width // s
    x = x_ref[0]

    def conv1(v):
        y = jax.lax.dot_general(
            v.astype(cdt), w1_ref[:],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.nn.relu(y + b1_ref[:][None, None, :])

    y1_ref[:, 0, :] = jnp.zeros_like(y1_ref[:, 0, :])
    y1_ref[:, width + 1, :] = jnp.zeros_like(y1_ref[:, width + 1, :])
    y1_ref[1 : s * tile_h + 1, 1 : width + 1, :] = conv1(x).astype(cdt)
    y1t = jnp.where(i * s * tile_h - 1 >= 0, conv1(top_ref[0]), 0.0)
    y1_ref[0:1, 1 : width + 1, :] = y1t.astype(cdt)
    y1b = jnp.where(
        i * s * tile_h + s * tile_h < height, conv1(bot_ref[0]), 0.0
    )
    y1_ref[s * tile_h + 1 : s * tile_h + 2, 1 : width + 1, :] = (
        y1b.astype(cdt)
    )

    if s == 2:
        _fill_parity_planes(y1_ref, pp_ref, tile_h, out_w)
    acc = jnp.zeros((tile_h, out_w, w2_ref.shape[-1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            if s == 2:
                v = pp_ref[
                    dy % 2, dx % 2,
                    dy // 2 : dy // 2 + tile_h,
                    dx // 2 : dx // 2 + out_w, :,
                ]
            else:
                v = y1_ref[dy : dy + tile_h, dx : dx + out_w, :]
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

    # skip projection: 1x1/stride on the raw input (no padding). The
    # strided rows/cols all live in the MAIN tile (global rows
    # i*s*th, +s, ...).
    xs = _destride(x, s, tile_h, out_w)
    xd = jax.lax.dot_general(
        xs.astype(cdt), wd_ref[:],
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xd = xd + bd_ref[:][None, None, :]
    o_ref[0] = jax.nn.relu(y3 + xd).astype(cdt)


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
        + (stride - 1) * (
            4 * ow * _lane(cm) * it  # parity-plane scratch
            + 4 * w * c * it  # skip-destride vector temporaries
        )
    )
    fixed = (c * cm + 9 * cm * cm + cm * co + c * co) * it + 2 * (
        (w + 2) * _lane(cm) * it  # y1 halo rows
        + 2 * 2 * w * c * it  # the two 1-row halo inputs, double-buffered
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
        in_specs=_halo_specs(stride * th, w, c, h) + [
            const(w1), const(b1), const(w2), const(b2), const(w3),
            const(b3), const(wd), const(bd),
        ],
        out_specs=pl.BlockSpec(
            (1, th, ow, co),
            lambda bi, hi: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, co), cdt),
        scratch_shapes=[
            pltpu.VMEM((rows, w + 2, cm), cdt),
            pltpu.VMEM(
                (2, 2, th + 1, ow + 1, cm) if stride == 2
                else (2, 2, 2, 2, cm),
                cdt,
            ),
        ],
        interpret=interpret,
    )(x, x, x, w1, b1, w2, b2, w3, b3, wd, bd)


def _conv3x3_kernel(
    top_ref, x_ref, bot_ref, w_ref, b_ref, o_ref, xp_ref,
    *, tile_h: int, width: int, height: int, cdt,
):
    """One [tile_h, W] tile of a same-padding 3x3 conv + bias.

    x_ref: [1, tile_h, W, C] main tile; top/bot: 1-row halos;
    xp_ref: [tile_h+2, W+2, C] VMEM scratch holding the zero-padded
    tile; o_ref: [1, tile_h, W, Co].
    """
    i = pl.program_id(1)
    xp_ref[:, 0, :] = jnp.zeros_like(xp_ref[:, 0, :])
    xp_ref[:, width + 1, :] = jnp.zeros_like(xp_ref[:, width + 1, :])
    xp_ref[1 : tile_h + 1, 1 : width + 1, :] = x_ref[0]
    topf = jnp.where(
        i * tile_h - 1 >= 0, top_ref[0].astype(jnp.float32), 0.0
    )
    xp_ref[0:1, 1 : width + 1, :] = topf.astype(cdt)
    botf = jnp.where(
        i * tile_h + tile_h < height, bot_ref[0].astype(jnp.float32), 0.0
    )
    xp_ref[tile_h + 1 : tile_h + 2, 1 : width + 1, :] = botf.astype(cdt)
    acc = jnp.zeros((tile_h, width, w_ref.shape[-1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            v = xp_ref[dy : dy + tile_h, dx : dx + width, :]
            acc = acc + jax.lax.dot_general(
                v, w_ref[dy, dx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[0] = (acc + b_ref[:][None, None, :]).astype(cdt)


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
    fixed = 9 * c * co * it + 2 * (
        (w + 2) * _lane(c) * it + 2 * 2 * w * c * it
    )
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
        in_specs=_halo_specs(th, w, c, h) + [
            const(kernel.astype(cdt)),
            const(bias.astype(jnp.float32)),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, co),
            lambda bi, hi: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), cdt),
        scratch_shapes=[pltpu.VMEM((th + 2, w + 2, c), cdt)],
        interpret=interpret,
    )(x, x, x, kernel.astype(cdt), bias.astype(jnp.float32))


def _maxpool_kernel(
    top_ref, x_ref, o_ref, xp_ref, pp_ref, *, tile_h, width, cdt
):
    """One [tile_h, W//2] tile of a 3x3/s2/p1 max-pool.

    x_ref: [1, 2*tile_h, W, C] main tile; top_ref: [1, 1, W, C]
    edge-clamped top halo row; xp_ref: [2*tile_h+2, W+2, C] scratch
    with -inf borders; o_ref: [1, tile_h, W//2, C].

    The window for output row j spans input rows 2j-1..2j+1, so the
    tile needs global rows [2*i*th-1, 2*i*th+2*th-1]: one top halo row
    plus the 2*th-row main tile — no bottom halo (stride 2 never reads
    past the main tile's last row; same for the W axis with W even).
    The scratch carries one extra garbage row/col so `_destride`'s
    full-window loads stay in bounds (the garbage lands in discarded
    reshape slots only).
    """
    i = pl.program_id(1)
    neg = jnp.asarray(-jnp.inf, cdt)
    xp_ref[:, 0, :] = jnp.full_like(xp_ref[:, 0, :], neg)
    xp_ref[:, width + 1, :] = jnp.full_like(xp_ref[:, width + 1, :], neg)
    xp_ref[1 : 2 * tile_h + 1, 1 : width + 1, :] = x_ref[0]
    topf = jnp.where(
        2 * i * tile_h - 1 >= 0, top_ref[0].astype(jnp.float32), -jnp.inf
    )
    xp_ref[0:1, 1 : width + 1, :] = topf.astype(cdt)
    xp_ref[2 * tile_h + 1, 1 : width + 1, :] = jnp.full_like(
        xp_ref[2 * tile_h + 1, 1 : width + 1, :], neg
    )
    out_w = width // 2
    _fill_parity_planes(xp_ref, pp_ref, tile_h, out_w)
    acc = None
    for dy in range(3):
        for dx in range(3):
            v = pp_ref[
                dy % 2, dx % 2,
                dy // 2 : dy // 2 + tile_h,
                dx // 2 : dx // 2 + out_w, :,
            ]
            acc = v if acc is None else jnp.maximum(acc, v)
    o_ref[0] = acc


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
        + 4 * ow * _lane(c) * it  # parity-plane scratch
        + 4 * w * c * it  # plane-fill vector temporaries
    )
    th = tile_h or pick_tile_h(
        oh, row_bytes, 2 * (w + 2) * _lane(c) * it + 2 * w * c * it
    )
    kern = functools.partial(
        _maxpool_kernel, tile_h=th, width=w, cdt=cdt
    )
    return pl.pallas_call(
        kern,
        grid=(b, oh // th),
        in_specs=_halo_specs(2 * th, w, c, h)[:2],  # top halo + main
        out_specs=pl.BlockSpec(
            (1, th, ow, c),
            lambda bi, hi: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, c), cdt),
        scratch_shapes=[
            pltpu.VMEM((2 * th + 2, w + 2, c), cdt),
            pltpu.VMEM((2, 2, th + 1, ow + 1, c), cdt),
        ],
        interpret=interpret,
    )(x, x)


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
        (w + 2) * _lane(cm) * it + 2 * 2 * w * c * it
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
        in_specs=_halo_specs(th, w, c, h) + [
            const(w1), const(b1), const(w2), const(b2), const(w3),
            const(b3),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, c),
            lambda bi, hi: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((th + 2, w + 2, cm), cdt)],
        interpret=interpret,
    )(x, x, x, w1, b1, w2, b2, w3, b3)
