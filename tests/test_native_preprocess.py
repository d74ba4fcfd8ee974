"""Native C++ preprocessing vs numpy oracle."""
import numpy as np
import pytest

from simpb_tpu.data import native_preprocess as npz
from simpb_tpu.data.transforms import IMG_MEAN, IMG_STD


@pytest.mark.skipif(not npz.available(), reason="no C++ toolchain")
def test_matches_numpy_bilinear():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (60, 100, 3)).astype(np.uint8)
    aug = {"resize": 0.5, "crop": (4, 2, 44, 26), "flip": True}
    out = npz.preprocess_image(img, aug)
    assert out.shape == (24, 40, 3)

    # numpy oracle: same bilinear + crop + flip + normalise math
    oh, ow = 24, 40
    ys = (np.arange(oh) + aug["crop"][1] + 0.5) / 0.5 - 0.5
    xs_o = np.arange(ow)
    xs_src = ow - 1 - xs_o  # flip
    xs = (xs_src + aug["crop"][0] + 0.5) / 0.5 - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, 59)
    y1 = np.clip(y0 + 1, 0, 59)
    ly = np.clip(ys - np.floor(ys), 0, 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, 99)
    x1 = np.clip(x0 + 1, 0, 99)
    lx = np.clip(xs - np.floor(xs), 0, 1)
    f = img.astype(np.float32)
    interp = (
        f[y0][:, x0] * ((1 - ly)[:, None] * (1 - lx)[None, :])[..., None]
        + f[y0][:, x1] * ((1 - ly)[:, None] * lx[None, :])[..., None]
        + f[y1][:, x0] * (ly[:, None] * (1 - lx)[None, :])[..., None]
        + f[y1][:, x1] * (ly[:, None] * lx[None, :])[..., None]
    )
    expected = (interp - IMG_MEAN) / IMG_STD
    np.testing.assert_allclose(out, expected, atol=1e-3)


@pytest.mark.skipif(not npz.available(), reason="no C++ toolchain")
def test_faster_or_equal_functional():
    # smoke: full-size camera frame produces finite output
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (900, 1600, 3)).astype(np.uint8)
    aug = {"resize": 0.44, "crop": (0, 140, 704, 396), "flip": False}
    out = npz.preprocess_image(img, aug)
    assert out.shape == (256, 704, 3)
    assert np.isfinite(out).all()
