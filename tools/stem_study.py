"""Microbenchmark of stem-conv formulations on the real TPU.

The 7x7/s2 3-channel stem is MXU-starved (PERF.md backbone bisection:
stem+pool 2.27 ms of the 4.5 ms backbone+FPN). Candidates:
  a) plain conv_general_dilated 7x7/s2 (current default)
  b) s2d + 4x4/s1 conv (round-1 reformulation, measured slower r2)
  c) s2d + im2col (16 shifted slices) + one [P,192]x[192,64] matmul
  d) maxpool alone (to split the stem+pool 2.27 ms)
All compute identical functions (b/c up to padding-zero taps).
Methodology: device-side lax.scan over varied inputs, value-fetch sync
(CLAUDE.md bench rules).
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

CAMS, H, W = 6, 256, 704
F = 64
STEPS = 50


def timed(fn, x0, label):
    fn = jax.jit(fn)
    r = fn(x0)
    np.asarray(jax.tree_util.tree_leaves(r)[0][0, 0])

    # scan with input variation: feed output back is shape-mismatched for
    # convs; instead scan over a per-step scale applied to the same input
    def scan_fn(x):
        # fp32 carry: a bf16 carry makes s + 1e-3 a no-op (bf16 eps at
        # 1.0 is ~4e-3), which would repeat bit-identical inputs every
        # step — the tunnel-cache hazard CLAUDE.md warns about
        def body(s, _):
            y = fn((x * s).astype(x.dtype))
            return s + jnp.float32(1e-3), jnp.sum(
                y[-1] if isinstance(y, (list, tuple)) else y
            )
        s, outs = jax.lax.scan(body, jnp.float32(1.0), None, length=STEPS)
        return outs

    sf = jax.jit(scan_fn)
    o = sf(x0); np.asarray(o)  # warm
    t0 = time.perf_counter()
    o = sf(x0)
    np.asarray(o)
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{label:32s} {dt:7.3f} ms/frame")
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(CAMS, H, W, 3)).astype(np.float32), jnp.bfloat16
    )
    k7 = jnp.asarray(
        rng.normal(size=(7, 7, 3, F)).astype(np.float32) * 0.05, jnp.bfloat16
    )

    def conv_plain(x):
        return jax.lax.conv_general_dilated(
            x, k7, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def s2d(x):
        b, h, w, c = x.shape
        xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
        return xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)

    def fold_kernel():
        c = 3
        w2 = np.zeros((4, 4, 4 * c, F), np.float32)
        kn = np.asarray(k7, np.float32)
        for ty in range(7):
            ay, by = (ty - 3) // 2 + 2, (ty - 3) % 2
            for tx in range(7):
                ax, bx = (tx - 3) // 2 + 2, (tx - 3) % 2
                ch = (by * 2 + bx) * c
                w2[ay, ax, ch : ch + c] = kn[ty, tx]
        return jnp.asarray(w2, jnp.bfloat16)

    k4 = fold_kernel()

    def conv_s2d(x):
        xs = s2d(x)
        return jax.lax.conv_general_dilated(
            xs, k4, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    kmat = k4.reshape(16 * 12, F)  # [4,4,12,F] -> [192,F] (ty,tx,major ch)

    def conv_im2col(x):
        xs = s2d(x)  # [N, 128, 352, 12]
        n, h, w, c = xs.shape
        xp = jnp.pad(xs, ((0, 0), (2, 1), (2, 1), (0, 0)))
        cols = [
            jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (n, h, w, c))
            for dy in range(4)
            for dx in range(4)
        ]
        patches = jnp.concatenate(cols, axis=-1)  # [N,h,w,192]
        out = patches.reshape(n * h * w, 16 * c) @ kmat
        return out.reshape(n, h, w, F)

    def pool(y):
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)),
        )

    y0 = conv_plain(x)

    # numeric check im2col vs plain
    a = np.asarray(conv_plain(x), np.float32)
    b = np.asarray(conv_im2col(x), np.float32)
    print("max|plain-im2col| =", np.abs(a - b).max())

    # every timed call pays ONE dispatch RTT (~26 ms / STEPS ~ 0.5
    # ms/step): subtract this no-op control from every row below
    timed(lambda v: v * 1.0, x, "no-op control (mul+sum only)")
    timed(conv_plain, x, "a) plain 7x7/s2")
    timed(conv_s2d, x, "b) s2d + 4x4 conv")
    timed(conv_im2col, x, "c) s2d + im2col matmul")
    timed(pool, y0, "d) maxpool 3x3/s2 alone")
    timed(lambda x: pool(conv_plain(x)), x, "a+pool")
    timed(lambda x: pool(conv_im2col(x)), x, "c+pool")


if __name__ == "__main__":
    main()
