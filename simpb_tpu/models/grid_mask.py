"""GridMask image augmentation, in-graph on device.

TPU-native equivalent of reference models/grid_mask.py:75-138 with the
released settings (use_h, use_w, rotate=1 => no rotation since
`np.random.randint(1) == 0`, offset=False, ratio=0.5, mode=1, prob=0.7 —
simpb.py:58-61). The strip pattern is computed with iota arithmetic
instead of a host-side numpy mask, so it fuses into the input pipeline.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_mask(
    rng: jax.Array,
    images: jnp.ndarray,  # [..., H, W, C]
    ratio: float = 0.5,
    prob: float = 0.7,
) -> jnp.ndarray:
    h, w = images.shape[-3], images.shape[-2]
    k_apply, k_d, k_sh, k_sw = jax.random.split(rng, 4)
    apply = jax.random.uniform(k_apply) <= prob
    d = jax.random.randint(k_d, (), 2, h)
    l = jnp.clip((d * ratio + 0.5).astype(jnp.int32), 1, d - 1)
    st_h = jax.random.randint(k_sh, (), 0, d)
    st_w = jax.random.randint(k_sw, (), 0, d)

    # reference builds the mask on a 1.5x canvas and center-crops
    off_h = (int(1.5 * h) - h) // 2
    off_w = (int(1.5 * w) - w) // 2
    ys = jnp.arange(h) + off_h
    xs = jnp.arange(w) + off_w

    def strip(idx, st):
        rel = idx - st
        return (rel >= 0) & (rel % d < l)

    zeroed = strip(ys, st_h)[:, None] | strip(xs, st_w)[None, :]
    # mode=1: invert — the strip cells are *kept*
    keep = zeroed.astype(images.dtype)
    keep = jnp.where(apply, keep, jnp.ones_like(keep))
    return images * keep[..., None]
