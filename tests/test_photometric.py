"""Exact HSV photometric distortion (reference
pipelines/augment.py:309-413): conversions must match cv2's float path
(what mmcv.bgr2hsv/hsv2bgr call) and draws must be per-image."""
import numpy as np
import pytest

from simpb_tpu.data.transforms import (
    hsv_to_rgb,
    photometric_distortion,
    rgb_to_hsv,
)

cv2 = pytest.importorskip("cv2")


def test_rgb_hsv_matches_cv2_float():
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 255, (32, 24, 3)).astype(np.float32)
    ours = rgb_to_hsv(rgb)
    ref = cv2.cvtColor(rgb[..., ::-1].copy(), cv2.COLOR_BGR2HSV)
    np.testing.assert_allclose(ours, ref, atol=1e-3)
    back = hsv_to_rgb(ours)
    np.testing.assert_allclose(back, rgb, atol=1e-3)
    # brightness shifts push pixels negative before the HSV leg —
    # conversions must still match cv2 there
    rgbn = rgb - 64.0
    np.testing.assert_allclose(
        rgb_to_hsv(rgbn),
        cv2.cvtColor(rgbn[..., ::-1].copy(), cv2.COLOR_BGR2HSV),
        atol=1e-3,
    )
    # saturation jitter can exceed 1 on the float path (no clamp)
    scaled = ours.copy()
    scaled[..., 1] *= 1.5
    np.testing.assert_allclose(
        hsv_to_rgb(scaled),
        cv2.cvtColor(scaled, cv2.COLOR_HSV2BGR)[..., ::-1],
        atol=1e-3,
    )


def test_distortion_draws_are_per_image():
    rng = np.random.default_rng(1)
    imgs = [np.full((8, 8, 3), 128.0, np.float32) for _ in range(6)]
    out = photometric_distortion(rng, imgs)
    means = [float(o.mean()) for o in out]
    # 6 cameras with independent draws: means must not all coincide
    assert len({round(m, 3) for m in means}) > 1, means


def test_distortion_channel_statistics():
    """With p=0.5 gates, roughly half of many frames keep their mean
    brightness exactly; jittered ones stay within the documented
    envelope (|brightness| <= 32, contrast in [0.5, 1.5])."""
    rng = np.random.default_rng(2)
    base = rng.uniform(64, 192, (16, 16, 3)).astype(np.float32)
    ratios = []
    for _ in range(200):
        out = photometric_distortion(rng, [base.copy()])[0]
        ratios.append(float(out.mean() / base.mean()))
    ratios = np.asarray(ratios)
    # identity applications exist (all gates off ~ (1/2)^6 of frames)
    assert (np.abs(ratios - 1) < 1e-3).sum() > 0
    # bounded: mean scale within contrast x (brightness/mean) envelope
    assert ratios.max() < 1.5 * (1 + 32 / base.mean()) + 0.05
    assert ratios.min() > 0.5 * (1 - 32 / base.mean()) - 0.05
