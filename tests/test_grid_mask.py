"""GridMask strip-pattern parity vs a numpy oracle of the reference.

Oracle mirrors reference models/grid_mask.py:95-126 at the released
settings (mode=1, rotate=1 -> no rotation, offset=False): finite strip
loops on a 1.5x canvas, center crop, inversion.
"""
import numpy as np

from simpb_tpu.models.grid_mask import grid_mask, keep_mask


def oracle_keep(h, w, d, l, st_h, st_w):
    hh, ww = int(1.5 * h), int(1.5 * w)
    mask = np.ones((hh, ww), np.float32)
    for i in range(hh // d):  # reference: finite strip count
        s = d * i + st_h
        t = min(s + l, hh)
        mask[s:t, :] = 0
    for i in range(ww // d):
        s = d * i + st_w
        t = min(s + l, ww)
        mask[:, s:t] = 0
    mask = mask[(hh - h) // 2:(hh - h) // 2 + h,
                (ww - w) // 2:(ww - w) // 2 + w]
    return 1 - mask  # mode=1 inversion: strip cells are kept


def test_keep_mask_matches_reference_oracle():
    h, w = 64, 96
    rng = np.random.default_rng(0)
    for _ in range(200):
        d = int(rng.integers(2, h))
        l = min(max(int(d * 0.5 + 0.5), 1), d - 1)
        st_h = int(rng.integers(0, d))
        st_w = int(rng.integers(0, d))
        ours = np.asarray(keep_mask(h, w, d, l, st_h, st_w))
        np.testing.assert_array_equal(
            ours.astype(np.float32), oracle_keep(h, w, d, l, st_h, st_w),
            err_msg=f"d={d} l={l} st_h={st_h} st_w={st_w}",
        )


def test_grid_mask_applies_and_skips():
    import jax

    imgs = np.ones((2, 16, 24, 3), np.float32)
    out = grid_mask(jax.random.PRNGKey(0), imgs, prob=1.0)
    assert np.asarray(out).min() == 0.0  # some cells dropped
    out = grid_mask(jax.random.PRNGKey(0), imgs, prob=0.0)
    np.testing.assert_array_equal(np.asarray(out), imgs)
