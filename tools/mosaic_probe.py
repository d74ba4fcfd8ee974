"""Probe deployment-Mosaic strided-load constraints on the real chip.

Run from the repo root when the remote toolchain changes; findings are
recorded in PERF.md ("Mosaic facts learned") and conv_fused.py. As of
round 2: strided VMEM loads need 32-bit data AND a 128-lane base
memref; sublane-splitting reshape + unit middle-dim index lowers at
any dtype/width; `pl.Element` block specs fail window-param setting.
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def report(name, fn):
    try:
        out, ref = fn()
        err = float(
            np.max(
                np.abs(
                    np.asarray(out, np.float32) - np.asarray(ref, np.float32)
                )
            )
        )
        print(f"{name}: {'OK' if err < 1e-2 else f'WRONG {err}'}")
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")


def mk(shape, dtype=jnp.float32):
    x = jnp.arange(int(np.prod(shape)), dtype=jnp.float32).reshape(shape)
    return (x / x.size).astype(dtype)


# P1: f32 strided load, lane dim != 128 (64 and 256)
def p_lane(c):
    H, W = 16, 16

    def k(x_ref, o_ref, s_ref):
        s_ref[:] = x_ref[0].astype(jnp.float32)
        o_ref[0] = s_ref[0:H:2, 0:W:2, :].astype(o_ref.dtype)

    x = mk((1, H, W, c), jnp.bfloat16)
    out = pl.pallas_call(
        k,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, H, W, c), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H // 2, W // 2, c), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H // 2, W // 2, c), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((H, W, c), jnp.float32)],
    )(x)
    return out, x[:, 0:H:2, 0:W:2, :]


# P2: 4D chunked scratch (G, H, W, 128), strided load [g, ::2, ::2, :]
def p_chunk():
    H, W, C, G = 16, 16, 256, 2

    def k(x_ref, o_ref, s_ref):
        for g in range(G):
            s_ref[g] = x_ref[0, :, :, 128 * g : 128 * (g + 1)].astype(
                jnp.float32
            )
        for g in range(G):
            o_ref[0, :, :, 128 * g : 128 * (g + 1)] = s_ref[
                g, 0:H:2, 0:W:2, :
            ].astype(o_ref.dtype)

    x = mk((1, H, W, C), jnp.bfloat16)
    out = pl.pallas_call(
        k,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H // 2, W // 2, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H // 2, W // 2, C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((G, H, W, 128), jnp.float32)],
    )(x)
    return out, x[:, 0:H:2, 0:W:2, :]


# P4: value reshape splitting the sublane dim, unit middle-dim select
def p_reshape():
    H, W, C = 16, 16, 256

    def k(x_ref, o_ref):
        v = x_ref[0]  # [H, W, C]
        vr = v.reshape(H // 2, 2, W // 2, 2, C)
        o_ref[0] = vr[:, 0, :, 0, :]

    x = mk((1, H, W, C), jnp.bfloat16)
    out = pl.pallas_call(
        k,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H // 2, W // 2, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H // 2, W // 2, C), jnp.bfloat16),
    )(x)
    return out, x[:, 0:H:2, 0:W:2, :]


# P5: outer-dim-only strided load on bf16 (rows strided, rest full)
def p_outer_bf16():
    H, W, C = 16, 16, 256

    def k(x_ref, o_ref):
        o_ref[0] = x_ref[0, 0:H:2, :, :]

    x = mk((1, H, W, C), jnp.bfloat16)
    out = pl.pallas_call(
        k,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H // 2, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H // 2, W, C), jnp.bfloat16),
    )(x)
    return out, x[:, 0:H:2]


# P6: ref reshape: scratch declared (H, W//2, 2, C); write a reshaped
# value into it; read unit-index middle dim (contiguous view select).
def p_refshape():
    H, W, C = 16, 16, 256

    def k(x_ref, o_ref, s_ref):
        v = x_ref[0].astype(jnp.float32)  # [H, W, C]
        s_ref[:] = v.reshape(H, W // 2, 2, C)
        o_ref[0] = s_ref[:, :, 0, :].astype(o_ref.dtype)

    x = mk((1, H, W, C), jnp.bfloat16)
    out = pl.pallas_call(
        k,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W // 2, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H, W // 2, C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((H, W // 2, 2, C), jnp.float32)],
    )(x)
    return out, x[:, :, 0:W:2, :]


# P7: f32 strided load from 3-D scratch whose lane dim is 128 but the
# strided axes are outer+sublane and G rides outer (flattened chunks):
# scratch (G*H, W, 128), load [g*H + a : g*H + H : 2, ::2, :]
def p_chunk_flat():
    H, W, C, G = 16, 16, 256, 2

    def k(x_ref, o_ref, s_ref):
        for g in range(G):
            s_ref[g * H : (g + 1) * H] = x_ref[
                0, :, :, 128 * g : 128 * (g + 1)
            ].astype(jnp.float32)
        for g in range(G):
            o_ref[0, :, :, 128 * g : 128 * (g + 1)] = s_ref[
                g * H : (g + 1) * H : 2, 0:W:2, :
            ].astype(o_ref.dtype)

    x = mk((1, H, W, C), jnp.bfloat16)
    out = pl.pallas_call(
        k,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H // 2, W // 2, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H // 2, W // 2, C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((G * H, W, 128), jnp.float32)],
    )(x)
    return out, x[:, 0:H:2, 0:W:2, :]


if __name__ == "__main__":
    print("devices:", jax.devices())
    report("P1_lane64", functools.partial(p_lane, 64))
    report("P1_lane256", functools.partial(p_lane, 256))
    report("P2_chunk4d", p_chunk)
    report("P4_value_reshape", p_reshape)
    report("P5_outer_stride_bf16", p_outer_bf16)
    report("P6_ref_reshape_unit_select", p_refshape)
    report("P7_chunk_flat3d", p_chunk_flat)
