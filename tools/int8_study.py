"""Microbenchmark: int8 vs bf16 convs at backbone shapes (v5e).

v5e's MXU runs int8 at 2x the bf16 MACs/clock. If XLA lowers
int8xint8->int32 `conv_general_dilated` onto that path, a
post-training-quantized serving backbone could roughly halve the
~4 ms/frame backbone+FPN cost (PERF.md bisection). This probe answers
whether the lowering exists on the deployment toolchain and what the
measured speedup is at the real shapes, before we invest in a PTQ path.

Methodology: pool_study.py's scan-timing with varied inputs (tunnel
cache hazard) and a no-op control row (one dispatch RTT per timed
call amortises to ~0.5 ms/step at STEPS=50 — subtract the control).
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 50


def timed(fn, x0, label, int_input=False):
    fn = jax.jit(fn)

    def scan_fn(x):
        def body(s, _):
            if int_input:
                xi = (x.astype(jnp.int32) + s.astype(jnp.int32)).astype(
                    x.dtype
                )
            else:
                xi = (x * s).astype(x.dtype)
            y = fn(xi)
            return s + jnp.float32(1e-3) if not int_input else s + 1, (
                jnp.sum(y[-1] if isinstance(y, (list, tuple)) else y)
            )

        init = jnp.int32(0) if int_input else jnp.float32(1.0)
        _, outs = jax.lax.scan(body, init, None, length=STEPS)
        return outs

    sf = jax.jit(scan_fn)
    np.asarray(sf(x0))
    t0 = time.perf_counter()
    o = sf(x0)
    np.asarray(o)
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{label:52s} {dt:7.3f} ms/step", flush=True)
    return dt


def conv(x, w, stride=1, pet=None):
    return jax.lax.conv_general_dilated(
        x,
        w,
        (stride, stride),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet,
    )


def main():
    rng = np.random.default_rng(0)
    # (shape NHWC, kh/kw, Cout, stride, label) — r50/704x256 trunk shapes,
    # 6 cameras folded into N
    cases = [
        ((6, 64, 176, 64), 3, 64, 1, "stage1 3x3 64->64 @176x64"),
        ((6, 64, 176, 256), 1, 64, 1, "stage1 1x1 256->64"),
        ((6, 32, 88, 128), 3, 128, 1, "stage2 3x3 128->128 @88x32"),
        ((6, 16, 44, 256), 3, 256, 1, "stage3 3x3 256->256 @44x16"),
        ((6, 8, 22, 512), 3, 512, 1, "stage4 3x3 512->512 @22x8"),
        ((6, 8, 22, 2048), 1, 512, 1, "stage4 1x1 2048->512"),
        ((6, 64, 176, 256), 3, 256, 1, "fpn out 3x3 256->256 @176x64"),
    ]
    ctrl_b = None
    ctrl_i = None
    for shp, k, cout, s, label in cases:
        cin = shp[-1]
        xb = jnp.asarray(
            rng.normal(size=shp).astype(np.float32), jnp.bfloat16
        )
        wb = jnp.asarray(
            rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.05,
            jnp.bfloat16,
        )
        xi = jnp.asarray(rng.integers(-100, 100, shp), jnp.int8)
        wi = jnp.asarray(
            rng.integers(-100, 100, (k, k, cin, cout)), jnp.int8
        )
        if ctrl_b is None:
            ctrl_b = timed(lambda v: v * 1.0, xb, "no-op control bf16")
            ctrl_i = timed(
                lambda v: v.astype(jnp.int32) * 2,
                xi,
                "no-op control int8",
                int_input=True,
            )
        tb = timed(lambda v, w=wb, st=s: conv(v, w, st), xb, f"bf16 {label}")
        ti = timed(
            lambda v, w=wi, st=s: conv(v, w, st, pet=jnp.int32),
            xi,
            f"int8 {label}",
            int_input=True,
        )
        print(
            f"   -> net bf16 {tb - ctrl_b:6.3f}  int8 {ti - ctrl_i:6.3f}  "
            f"ratio {max(tb - ctrl_b, 1e-6) / max(ti - ctrl_i, 1e-6):5.2f}x",
            flush=True,
        )

    # quantized-bottleneck pattern: int8 conv -> int32 -> per-channel
    # rescale (fp32) -> relu -> requantize to int8 (the elementwise tail
    # rides the VPU; question is whether it stays fused)
    shp, k, cin, cout = (6, 32, 88, 128), 3, 128, 128
    xi = jnp.asarray(rng.integers(-100, 100, shp), jnp.int8)
    wi = jnp.asarray(rng.integers(-100, 100, (k, k, cin, cout)), jnp.int8)
    scale = jnp.asarray(rng.uniform(1e-4, 2e-4, (cout,)), jnp.float32)

    def qblock(v):
        y = conv(v, wi, 1, pet=jnp.int32).astype(jnp.float32) * scale
        y = jnp.maximum(y, 0.0)
        return jnp.clip(jnp.round(y * 127.0), -127, 127).astype(jnp.int8)

    timed(qblock, xi, "int8 qblock (conv+rescale+relu+requant)", True)


if __name__ == "__main__":
    main()
