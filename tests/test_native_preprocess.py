"""Native C++ preprocessing vs numpy oracle."""
import numpy as np
import pytest

from simpb_tpu.data import native_preprocess as npz
from simpb_tpu.data.transforms import IMG_MEAN, IMG_STD

pytestmark = pytest.mark.medium


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


@pytest.mark.skipif(not npz.available(), reason="no C++ toolchain")
def test_draft_decode_engages_and_matches(tmp_path):
    """DCT-domain scaled decode (dataset draft_decode=True): on a
    1600x900-style JPEG with resize < 0.5, the loader must decode at
    the 1/2 libjpeg scale (both dims exact), and the resulting network
    input must closely match the full-res pipeline on smooth imagery
    (the DCT box prefilter differs from pure bilinear — content-level
    agreement, not bitwise)."""
    from PIL import Image

    from simpb_tpu.data.dataset import NuScenesDataset

    # smooth gradient content (noise images make the filter-chain
    # difference look worse than real camera imagery)
    h0, w0 = 180, 320
    yy, xx = np.mgrid[0:h0, 0:w0]
    img = np.stack(
        [
            (xx * 255 / w0),
            (yy * 255 / h0),
            ((xx + yy) * 255 / (w0 + h0)),
        ],
        -1,
    ).astype(np.uint8)
    p = tmp_path / "cam.jpg"
    Image.fromarray(img).save(str(p), quality=95)

    aug = {"resize": 0.45, "crop": (0, 10, 128, 74), "flip": False}

    ds = NuScenesDataset.__new__(NuScenesDataset)  # loader-only usage
    ds.draft_decode = True
    ds.data_aug_conf = {"H": h0, "W": w0}

    # draft decode: half-size source
    [arr_d] = ds.load_images([str(p)], dtype=np.uint8, scale_hint=0.45)
    assert arr_d.shape == (h0 // 2, w0 // 2, 3)
    [arr_f] = ds.load_images([str(p)], dtype=np.uint8)
    assert arr_f.shape == (h0, w0, 3)

    out_d = npz.preprocess_image(arr_d, dict(aug, resize=aug["resize"] * 2))
    out_f = npz.preprocess_image(arr_f, aug)
    assert out_d.shape == out_f.shape == (64, 128, 3)
    # normalised units (std ~58 gray levels): mean agreement well
    # under one gray level, worst pixel under ~6
    assert np.abs(out_d - out_f).mean() < 0.02
    assert np.abs(out_d - out_f).max() < 0.12


@pytest.mark.skipif(not npz.available(), reason="no C++ toolchain")
def test_draft_decode_falls_back_on_uneven_dims(tmp_path):
    """Dims where no n/8 scale divides both axes exactly must decode
    full-res (geometry would drift otherwise)."""
    from PIL import Image

    from simpb_tpu.data.dataset import NuScenesDataset

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (101, 257, 3)).astype(np.uint8)
    p = tmp_path / "odd.jpg"
    Image.fromarray(img).save(str(p), quality=90)

    ds = NuScenesDataset.__new__(NuScenesDataset)
    ds.draft_decode = True
    ds.data_aug_conf = {"H": 101, "W": 257}
    [arr] = ds.load_images([str(p)], dtype=np.uint8, scale_hint=0.45)
    assert arr.shape == (101, 257, 3)
