"""Backbone conv-efficiency study: where do trunk+FPN ms go vs the MXU?

Measures (no-op-control-corrected, on-device scan, varied inputs):
  1. an MXU ceiling reference (big bf16 matmul),
  2. cumulative trunk stages + FPN at bench shapes (deltas per stage),
  3. BN folded vs live (is inference paying for normalisation?),
  4. isolated per-conv costs vs their FLOP lower bound.

Usage: python tools/conv_study.py [--depth 50] [--hw 256 704] [--part all]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 50  # overridden by --steps
PEAK_TFLOPS = 197.0  # v5e bf16


def timed(fn, x0, label, flops=None):
    """ms/frame for fn(x) with per-step input variation (tunnel-cache
    safe) minus nothing — print raw; callers subtract the no-op row."""
    fn = jax.jit(fn)

    def scan_fn(x):
        def body(s, _):
            y = fn((x * s).astype(x.dtype))
            leaves = jax.tree_util.tree_leaves(y)
            return s + jnp.float32(1e-3), sum(jnp.sum(l) for l in leaves)

        s, outs = jax.lax.scan(body, jnp.float32(1.0), None, length=STEPS)
        return outs

    sf = jax.jit(scan_fn)
    np.asarray(sf(x0))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(sf(x0))
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    sol = f"  SoL {flops / PEAK_TFLOPS / 1e9:6.3f} ms" if flops else ""
    print(f"{label:44s} {dt:7.3f} ms/frame{sol}", flush=True)
    return dt


def conv_flops(h, w, cin, cout, k, batch=6, stride=1):
    return 2.0 * (h // stride) * (w // stride) * batch * cin * cout * k * k


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--depth", type=int, default=50)
    p.add_argument("--hw", type=int, nargs=2, default=[256, 704])
    p.add_argument(
        "--part", default="all",
        choices=["all", "ceiling", "stages", "bn", "convs", "stage1",
                 "trunkab", "fused"],
    )
    p.add_argument("--steps", type=int, default=50)
    args = p.parse_args()
    global STEPS
    STEPS = args.steps
    H, W = args.hw

    from simpb_tpu.models.backbone import FPN, ResNet
    from simpb_tpu.utils.fuse_bn import fuse_backbone_bn

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(6, H, W, 3)), dt)

    # no-op control: the scan itself + one dispatch RTT
    noop = timed(lambda x: x, img, "no-op control")

    if args.part in ("all", "ceiling"):
        a = jnp.asarray(rng.normal(size=(8192, 2048)), dt)
        b = jnp.asarray(rng.normal(size=(2048, 2048)), dt)
        fl = 2.0 * 8192 * 2048 * 2048
        t = timed(lambda x: (a * x[0, 0, 0, 0]) @ b, img,
                  "MXU ceiling: [8192,2048]@[2048,2048]", fl)
        print(f"  -> measured {fl / (t - noop) / 1e9:.0f} GFLOP/ms "
              f"({fl / (t - noop) / 1e9 / PEAK_TFLOPS * 100:.0f}% of peak)")

    trunk = ResNet(depth=args.depth, dtype=dt)
    neck = FPN(out_channels=256, num_outs=4, dtype=dt)
    tv = jax.jit(lambda: trunk.init(jax.random.PRNGKey(0), img))()
    c_shapes = jax.eval_shape(
        lambda v: trunk.apply(v, img, train=False), tv
    )
    feats0 = [jnp.zeros(s.shape, dt) for s in c_shapes]
    nv = jax.jit(lambda: neck.init(jax.random.PRNGKey(1), feats0))()

    if args.part == "trunkab":
        # same-process A/B: FPN lateral 1x1s on the conv lowering vs the
        # reshape-matmul path (Conv1x1 routes on the MATMUL_MIN_ROWS
        # threshold at trace time; params are layout-identical so the
        # same `nv` serves both rows)
        import simpb_tpu.models.backbone as _bb

        orig_min_rows = _bb.MATMUL_MIN_ROWS
        try:
            for min_rows, tag in ((1 << 60, "conv"), (1024, "matmul")):
                _bb.MATMUL_MIN_ROWS = min_rows
                timed(
                    lambda x: neck.apply(
                        nv, trunk.apply(tv, x, train=False)
                    ),
                    img, f"trunk+FPN laterals={tag}",
                )
        finally:
            _bb.MATMUL_MIN_ROWS = orig_min_rows

    if args.part == "fused":
        # Pallas fused-bottleneck trunk (ops/conv_fused.py) vs the
        # module path, plus trunk+FPN for the end-to-end delta.
        from simpb_tpu.models.backbone import fused_resnet_infer

        tv_d = {"params": tv["params"], "batch_stats": tv["batch_stats"]}
        timed(lambda x: trunk.apply(tv, x, train=False), img,
              "trunk module (XLA)")
        timed(
            lambda x: fused_resnet_infer(
                tv_d, x, depth=args.depth, dtype=dt
            ),
            img, "trunk fused-pallas",
        )
        timed(
            lambda x: neck.apply(nv, trunk.apply(tv, x, train=False)),
            img, "trunk+FPN (XLA)",
        )
        timed(
            lambda x: neck.apply(
                nv, fused_resnet_infer(tv_d, x, depth=args.depth, dtype=dt)
            ),
            img, "trunk+FPN (fused trunk, XLA FPN)",
        )
        from simpb_tpu.models.backbone import fused_fpn_infer

        timed(
            lambda x: fused_fpn_infer(
                nv, fused_resnet_infer(tv_d, x, depth=args.depth, dtype=dt),
                dtype=dt,
            ),
            img, "trunk+FPN (both fused)",
        )
        ref = jax.jit(lambda x: trunk.apply(tv, x, train=False))(img)
        got = jax.jit(
            lambda x: fused_resnet_infer(tv_d, x, depth=args.depth, dtype=dt)
        )(img)
        for s, (r, g) in enumerate(zip(ref, got)):
            r = np.asarray(r, np.float32)
            g = np.asarray(g, np.float32)
            print(f"  stage{s+1} max|d| {np.abs(r - g).max():.4g} "
                  f"(scale {np.abs(r).max():.4g})")

    if args.part in ("all", "stages"):
        print("-- cumulative stages (subtract previous row for deltas) --")
        blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[args.depth]

        def through(n_stages):
            def f(x):
                outs = trunk.apply(tv, x, train=False)
                return outs[n_stages - 1] if n_stages else outs
            return f

        # stem-only: call the module internals via a sliced apply is
        # intrusive; approximate with stage-1 row minus its blocks below.
        for n in (1, 2, 3, 4):
            timed(through(n), img, f"trunk through stage{n}")
        t_trunk = timed(lambda x: trunk.apply(tv, x, train=False), img,
                        "trunk (all outputs)")
        timed(
            lambda x: neck.apply(nv, trunk.apply(tv, x, train=False)),
            img, "trunk + FPN",
        )
        fl = sum(
            conv_flops(H // (4 * 2 ** i), W // (4 * 2 ** i), 256 * 2 ** i,
                       256, 1) +
            conv_flops(H // (4 * 2 ** i), W // (4 * 2 ** i), 256, 256, 3)
            for i in range(4)
        )
        print(f"  FPN FLOP lower bound: {fl / PEAK_TFLOPS / 1e9:.3f} ms")

    if args.part in ("all", "bn"):
        print("-- BN folded vs live --")
        p_f, s_f = fuse_backbone_bn(
            {"img_backbone": tv["params"]},
            {"img_backbone": tv["batch_stats"]},
        )
        tv_f = {"params": p_f["img_backbone"],
                "batch_stats": s_f["img_backbone"]}
        timed(lambda x: trunk.apply(tv, x, train=False), img, "trunk BN live")
        timed(lambda x: trunk.apply(tv_f, x, train=False), img,
              "trunk BN folded")

    if args.part == "stage1":
        # Anatomy of the bandwidth-bound stem/stage1 band at bench shapes:
        # is each conv near its HBM floor (=> waste is the unfused
        # BN/relu/residual passes) or individually slow (=> XLA conv
        # inefficiency; a fused Pallas bottleneck pays either way)?
        from simpb_tpu.models.backbone import Bottleneck, maxpool_3x3_s2

        h1, w1 = H // 4, W // 4  # stage1 spatial
        bw = 819.0  # v5e HBM GB/s

        def bwfloor(nbytes):
            return nbytes / bw / 1e6  # ms

        x_s = jnp.asarray(rng.normal(size=(6, H, W, 3)), dt)
        k_s = jnp.asarray(rng.normal(size=(7, 7, 3, 64)) * 0.05, dt)
        t = timed(
            lambda x: jax.lax.conv_general_dilated(
                x, k_s, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ),
            x_s, "stem 7x7/2 3->64",
        )
        x_p = jnp.asarray(
            rng.normal(size=(6, H // 2, W // 2, 64)), dt
        )
        print(f"  pool in+out floor {bwfloor(x_p.nbytes * 1.25):.3f} ms")
        timed(maxpool_3x3_s2, x_p, "maxpool 3x3/s2 (slice-max)")

        x64 = jnp.asarray(rng.normal(size=(6, h1, w1, 64)), dt)
        x256 = jnp.asarray(rng.normal(size=(6, h1, w1, 256)), dt)
        k11a = jnp.asarray(rng.normal(size=(1, 1, 256, 64)) * 0.05, dt)
        k11b = jnp.asarray(rng.normal(size=(1, 1, 64, 256)) * 0.05, dt)
        k33 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, dt)

        def conv(x, k, s=1):
            p = ((k.shape[0] // 2,) * 2,) * 2
            return jax.lax.conv_general_dilated(
                x, k, (s, s), p, dimension_numbers=("NHWC", "HWIO", "NHWC")
            )

        print(f"  1x1 256->64 floor {bwfloor(x256.nbytes + x64.nbytes):.3f}")
        timed(lambda x: conv(x, k11a), x256, "1x1 256->64")
        print(f"  3x3 64->64 floor {bwfloor(2 * x64.nbytes):.3f}")
        timed(lambda x: conv(x, k33), x64, "3x3 64->64")
        print(f"  1x1 64->256 floor {bwfloor(x256.nbytes + x64.nbytes):.3f}")
        timed(lambda x: conv(x, k11b), x64, "1x1 64->256")

        def chain(x):
            y = jax.nn.relu(conv(x, k11a))
            y = jax.nn.relu(conv(y, k33))
            y = conv(y, k11b)
            return jax.nn.relu(y + x)

        print(f"  chain floor (r in + w out) {bwfloor(2 * x256.nbytes):.3f}")
        timed(chain, x256, "bottleneck chain (no BN, fused relu)")

        def mm(x, k):
            n, h, w, c = x.shape
            return (x.reshape(-1, c) @ k[0, 0]).reshape(
                n, h, w, k.shape[-1]
            )

        def chain_mm(x):
            y = jax.nn.relu(mm(x, k11a))
            y = jax.nn.relu(conv(y, k33))
            y = mm(y, k11b)
            return jax.nn.relu(y + x)

        timed(chain_mm, x256, "bottleneck chain, 1x1 as matmul")

        def chain_mm_flat(x):
            # stay flat [NHW, C] across the 1x1s; only the 3x3 sees 4-D
            n, h, w, c = x.shape
            xf = x.reshape(-1, c)
            y = jax.nn.relu(xf @ k11a[0, 0])
            y = jax.nn.relu(conv(y.reshape(n, h, w, 64), k33))
            y = y.reshape(-1, 64) @ k11b[0, 0]
            return jax.nn.relu(y + xf).reshape(n, h, w, c)

        timed(chain_mm_flat, x256, "bottleneck chain, flat residual")

        def conv3x3_shift_e(x, k):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            n, h, w, _ = x.shape
            acc = None
            for dy in range(3):
                for dx in range(3):
                    v = xp[:, dy : dy + h, dx : dx + w, :]
                    t = jnp.einsum("nhwc,cf->nhwf", v, k[dy, dx])
                    acc = t if acc is None else acc + t
            return acc

        def block_conv(x):
            y = jax.nn.relu(conv(x, k11a))
            y = jax.nn.relu(conv(y, k33))
            y = conv(y, k11b)
            return jax.nn.relu(y + x)

        def block_dot(x):
            y = jax.nn.relu(jnp.einsum("nhwc,cf->nhwf", x, k11a[0, 0]))
            y = jax.nn.relu(conv3x3_shift_e(y, k33))
            y = jnp.einsum("nhwc,cf->nhwf", y, k11b[0, 0])
            return jax.nn.relu(y + x)

        timed(lambda x: block_conv(block_conv(block_conv(x))), x256,
              "3-block chain all-conv")
        timed(lambda x: block_dot(block_dot(block_dot(x))), x256,
              "3-block chain all-dot")

        def block_mixed(x):
            y = jax.nn.relu(jnp.einsum("nhwc,cf->nhwf", x, k11a[0, 0]))
            y = jax.nn.relu(conv(y, k33))
            y = jnp.einsum("nhwc,cf->nhwf", y, k11b[0, 0])
            return jax.nn.relu(y + x)

        timed(lambda x: block_mixed(block_mixed(block_mixed(x))), x256,
              "3-block chain dot-1x1/conv-3x3")

        blk = Bottleneck(planes=64, stride=1, downsample=False, dtype=dt)
        bv = jax.jit(lambda: blk.init(jax.random.PRNGKey(2), x256))()
        timed(lambda x: blk.apply(bv, x, False), x256,
              "Bottleneck module (live BN)")

        # --- reformulations ---
        timed(
            lambda x: (x.reshape(-1, 256) @ k11a[0, 0]).reshape(
                x.shape[:3] + (64,)
            ),
            x256, "1x1 256->64 as reshape-matmul",
        )
        timed(
            lambda x: (x.reshape(-1, 64) @ k11b[0, 0]).reshape(
                x.shape[:3] + (256,)
            ),
            x64, "1x1 64->256 as reshape-matmul",
        )

        def conv3x3_shift(x, k):
            # 9 shifted matmuls accumulated; pad once, slice views
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            n, h, w, c = x.shape
            acc = jnp.zeros((n, h, w, k.shape[-1]), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    v = xp[:, dy : dy + h, dx : dx + w, :]
                    acc = acc + jnp.einsum(
                        "nhwc,cf->nhwf", v, k[dy, dx],
                        preferred_element_type=jnp.float32,
                    )
            return acc.astype(x.dtype)

        timed(lambda x: conv3x3_shift(x, k33), x64,
              "3x3 64->64 as 9 shifted matmuls")

        def pool_rw(y):
            return jax.lax.reduce_window(
                y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                ((0, 0), (1, 1), (1, 1), (0, 0)),
            )

        def pool_reshape(y):
            neg = jnp.asarray(-jnp.inf, y.dtype)
            n, h, w, c = y.shape
            yr = y.reshape(n, h // 2, 2, w // 2, 2, c)
            e_h, o_h = yr[:, :, 0], yr[:, :, 1]
            prev_o_h = jnp.concatenate(
                [jnp.full_like(o_h[:, :1], neg), o_h[:, :-1]], axis=1
            )
            mh = jnp.maximum(jnp.maximum(e_h, o_h), prev_o_h)
            e_w, o_w = mh[..., 0, :], mh[..., 1, :]
            prev_o_w = jnp.concatenate(
                [jnp.full_like(o_w[:, :, :1], neg), o_w[:, :, :-1]],
                axis=2,
            )
            return jnp.maximum(jnp.maximum(e_w, o_w), prev_o_w)

        timed(pool_rw, x_p, "maxpool reduce_window")
        timed(pool_reshape, x_p, "maxpool reshape-evenodd")

        def pool_lane(y):
            # W-stride-2 via a FREE reshape into doubled lanes ([..,W,C]
            # -> [..,W/2,2C] is contiguous), so the only W-axis motion
            # is a single roll; H-stride-2 stays major-axis addressing.
            neg = jnp.asarray(-jnp.inf, y.dtype)
            n, h, w, c = y.shape
            yp = jnp.pad(
                y, ((0, 0), (1, 1), (0, 0), (0, 0)), constant_values=neg
            )
            oh = h // 2
            m = jnp.maximum(
                jnp.maximum(yp[:, 0 : 2 * oh : 2], yp[:, 1 : 2 * oh : 2]),
                yp[:, 2 : 2 * oh + 1 : 2],
            )  # [n, oh, w, c]
            p = m.reshape(n, oh, w // 2, 2 * c)
            a, b = p[..., :c], p[..., c:]
            bprev = jnp.concatenate(
                [jnp.full_like(b[:, :, :1], neg), b[:, :, :-1]], axis=2
            )
            return jnp.maximum(jnp.maximum(a, b), bprev)

        t = timed(pool_lane, x_p, "maxpool lane-packed")
        ref = jax.jit(pool_rw)(x_p)
        got = jax.jit(pool_lane)(x_p)
        print("  pool_lane exact:",
              bool(jnp.all(ref == got)))

        def pool_lane2(y):
            # no strided slices at all: W-stride-2 via lane doubling
            # (free reshape), H-stride-2 via a major-axis pair reshape.
            neg = jnp.asarray(-jnp.inf, y.dtype)
            n, h, w, c = y.shape
            p = y.reshape(n, h, w // 2, 2 * c)
            a, b = p[..., :c], p[..., c:]
            bprev = jnp.concatenate(
                [jnp.full_like(b[:, :, :1], neg), b[:, :, :-1]], axis=2
            )
            m = jnp.maximum(jnp.maximum(a, b), bprev)  # [n, h, w/2, c]
            q = m.reshape(n, h // 2, 2, w // 2, c)
            e, o = q[:, :, 0], q[:, :, 1]
            oprev = jnp.concatenate(
                [jnp.full_like(o[:, :1], neg), o[:, :-1]], axis=1
            )
            return jnp.maximum(jnp.maximum(e, o), oprev)

        timed(pool_lane2, x_p, "maxpool lane2 (no strided slices)")
        got2 = jax.jit(pool_lane2)(x_p)
        print("  pool_lane2 exact:", bool(jnp.all(ref == got2)))

        # stem variants
        timed(
            lambda x: jax.lax.conv_general_dilated(
                jnp.transpose(x, (0, 3, 1, 2)),
                jnp.transpose(k_s, (3, 2, 0, 1)), (2, 2),
                ((3, 3), (3, 3)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ),
            x_s, "stem NCHW",
        )
        k_pad = jnp.pad(k_s, ((0, 0), (0, 0), (0, 5), (0, 0)))
        timed(
            lambda x: jax.lax.conv_general_dilated(
                jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5))), k_pad,
                (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ),
            x_s, "stem 8-ch padded input",
        )

    if args.part in ("all", "convs"):
        print("-- isolated convs (bench shapes, batch 6) --")
        cases = [
            ("stem 7x7/2 3->64 @%dx%d" % (H, W), H, W, 3, 64, 7, 2),
            ("s1 3x3 64->64 @%dx%d" % (H // 4, W // 4), H // 4, W // 4,
             64, 64, 3, 1),
            ("s1 1x1 64->256", H // 4, W // 4, 64, 256, 1, 1),
            ("s1 1x1 256->64", H // 4, W // 4, 256, 64, 1, 1),
            ("s2 3x3 128->128", H // 8, W // 8, 128, 128, 3, 1),
            ("s2 1x1 512->128", H // 8, W // 8, 512, 128, 1, 1),
            ("s3 3x3 256->256", H // 16, W // 16, 256, 256, 3, 1),
            ("s3 1x1 1024->256", H // 16, W // 16, 1024, 256, 1, 1),
            ("s4 3x3 512->512", H // 32, W // 32, 512, 512, 3, 1),
            ("fpn 3x3 256->256 @L0", H // 4, W // 4, 256, 256, 3, 1),
        ]
        for label, h, w, cin, cout, k, s in cases:
            x0 = jnp.asarray(rng.normal(size=(6, h, w, cin)), dt)
            kern = jnp.asarray(
                rng.normal(size=(k, k, cin, cout)) * 0.05, dt
            )
            pad = ((k // 2, k // 2),) * 2

            def f(x, kern=kern, s=s, pad=pad):
                return jax.lax.conv_general_dilated(
                    x, kern, (s, s), pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )

            fl = conv_flops(h, w, cin, cout, k, stride=s)
            t = timed(f, x0, label, fl)
            eff = fl / max(t - noop, 1e-6) / 1e9 / PEAK_TFLOPS * 100
            print(f"    eff ~{eff:5.1f}% of peak")


if __name__ == "__main__":
    main()
