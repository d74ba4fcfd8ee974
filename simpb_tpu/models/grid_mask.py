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


def keep_mask(h: int, w: int, d, l, st_h, st_w) -> jnp.ndarray:
    """[h, w] mode-1 keep mask for given strip parameters (pure; the
    parameter draws live in `grid_mask` so this is oracle-testable)."""
    # reference builds the mask on a 1.5x canvas and center-crops
    hh, ww = int(1.5 * h), int(1.5 * w)
    ys = jnp.arange(h) + (hh - h) // 2
    xs = jnp.arange(w) + (ww - w) // 2

    def strip(idx, st, canvas):
        # reference strips are s = d*i + st for i in range(canvas // d)
        # ONLY (grid_mask.py:104-113) — the strip count is finite, so a
        # plain `rel % d < l` would add extra strips near the crop edge
        # whenever d*(canvas//d) + st < crop end
        rel = idx - st
        return (rel >= 0) & (rel % d < l) & (rel // d < canvas // d)

    # mode=1: invert — the strip cells are *kept*
    return strip(ys, st_h, hh)[:, None] | strip(xs, st_w, ww)[None, :]


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

    keep = keep_mask(h, w, d, l, st_h, st_w).astype(images.dtype)
    keep = jnp.where(apply, keep, jnp.ones_like(keep))
    return images * keep[..., None]
