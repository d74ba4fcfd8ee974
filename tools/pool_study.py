"""Microbenchmark: maxpool 3x3/s2 and FPN nearest-upsample alternatives.

reduce_window maxpool measured 1.03 ms/frame (tools/stem_study.py) —
10x the memory-bound floor (~35 MB in + 9 MB out at 819 GB/s ~ 55 us).
Candidates here keep identical semantics.
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 50


def timed(fn, x0, label):
    fn = jax.jit(fn)

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
    np.asarray(sf(x0))
    t0 = time.perf_counter()
    o = sf(x0)
    np.asarray(o)
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{label:40s} {dt:7.3f} ms/frame")
    return dt


def pool_rw(y):
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def pool_sep(y):
    # pad by 1, separable 3-tap max at full res, then stride-2 subsample
    neg = jnp.asarray(-jnp.inf, y.dtype)
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    h = jnp.maximum(jnp.maximum(yp[:, :-2], yp[:, 1:-1]), yp[:, 2:])
    v = jnp.maximum(jnp.maximum(h[:, :, :-2], h[:, :, 1:-1]), h[:, :, 2:])
    return v[:, ::2, ::2]


def pool_sep2(y):
    # subsample-first: stride-2 slices of the 3 taps (3 slices per axis)
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


def pool_reshape(y):
    # stride-2 via reshape to expose even/odd lanes as a static axis,
    # avoiding strided slices entirely: [N,H,W,C]->[N,H/2,2,W/2,2,C]
    neg = jnp.asarray(-jnp.inf, y.dtype)
    n, h, w, c = y.shape
    yr = y.reshape(n, h // 2, 2, w // 2, 2, c)
    # window rows {2i-1,2i,2i+1}: even row 2i = yr[:,i,0], odd 2i+1 =
    # yr[:,i,1], and 2i-1 = previous block's odd row shifted
    e_h, o_h = yr[:, :, 0], yr[:, :, 1]  # [N,H/2,W/2,2,C]
    prev_o_h = jnp.concatenate(
        [jnp.full_like(o_h[:, :1], neg), o_h[:, :-1]], axis=1
    )
    mh = jnp.maximum(jnp.maximum(e_h, o_h), prev_o_h)  # [N,H/2,W/2,2,C]
    e_w, o_w = mh[..., 0, :], mh[..., 1, :]  # [N,H/2,W/2,C]
    prev_o_w = jnp.concatenate(
        [jnp.full_like(o_w[:, :, :1], neg), o_w[:, :, :-1]], axis=2
    )
    return jnp.maximum(jnp.maximum(e_w, o_w), prev_o_w)


def up_resize(x, tgt_hw):
    return jax.image.resize(
        x, x.shape[:1] + tgt_hw + x.shape[3:], method="nearest"
    )


def up_bcast(x, tgt_hw):
    n, h, w, c = x.shape
    x2 = jnp.broadcast_to(
        x[:, :, None, :, None, :], (n, h, 2, w, 2, c)
    ).reshape(n, 2 * h, 2 * w, c)
    return x2


def main():
    rng = np.random.default_rng(0)
    y = jnp.asarray(
        rng.normal(size=(6, 128, 352, 64)).astype(np.float32), jnp.bfloat16
    )
    ref = np.asarray(pool_rw(y), np.float32)
    for f, name in [(pool_sep, "sep"), (pool_sep2, "sep2"),
                    (pool_reshape, "reshape")]:
        got = np.asarray(f(y), np.float32)
        assert got.shape == ref.shape, (name, got.shape, ref.shape)
        print(f"max|rw-{name}| =", np.abs(ref - got).max())

    # every timed call pays ONE dispatch RTT (~26 ms / STEPS ~ 0.5
    # ms/step): subtract this no-op control from every row below
    timed(lambda v: v * 1.0, y, "no-op control (mul+sum only)")
    timed(pool_rw, y, "pool: reduce_window")
    timed(pool_sep, y, "pool: separable full-res + subsample")
    timed(pool_sep2, y, "pool: separable stride-2 slices")
    timed(pool_reshape, y, "pool: reshape even/odd")

    # FPN upsample: level1 [6,16,44,256] -> (32,88) etc.
    for shp in [(6, 16, 44, 256), (6, 32, 88, 256)]:
        x = jnp.asarray(
            rng.normal(size=shp).astype(np.float32), jnp.bfloat16
        )
        tgt = (shp[1] * 2, shp[2] * 2)
        a = np.asarray(up_resize(x, tgt), np.float32)
        b = np.asarray(up_bcast(x, tgt), np.float32)
        print("up diff", np.abs(a - b).max())
        timed(lambda v, t=tgt: up_resize(v, t), x, f"up resize {shp}")
        timed(lambda v, t=tgt: up_bcast(v, t), x, f"up bcast  {shp}")


if __name__ == "__main__":
    main()
