"""Loss formula checks vs torch/manual oracles."""
import jax.numpy as jnp
import numpy as np
import torch

from simpb_tpu.training import losses as L


def test_sigmoid_focal_loss_matches_torch_formula():
    rng = np.random.default_rng(0)
    n, c = 40, 10
    logits = rng.normal(size=(n, c)).astype(np.float32)
    labels = rng.integers(0, c + 1, size=(n,))  # c == background
    onehot = np.zeros((n, c), np.float32)
    for i, l in enumerate(labels):
        if l < c:
            onehot[i, l] = 1.0
    # standard sigmoid focal loss (RetinaNet definition), torch oracle
    lt = torch.from_numpy(logits)
    tt = torch.from_numpy(onehot)
    p = torch.sigmoid(lt)
    ce = torch.nn.functional.binary_cross_entropy_with_logits(
        lt, tt, reduction="none"
    )
    p_t = p * tt + (1 - p) * (1 - tt)
    alpha_t = 0.25 * tt + 0.75 * (1 - tt)
    ref = (alpha_t * (1 - p_t) ** 2.0 * ce).sum().item()
    ours = float(
        L.sigmoid_focal_loss(
            jnp.asarray(logits), jnp.asarray(labels), avg_factor=jnp.asarray(1.0)
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_giou_matches_manual():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 50, (20, 2)).astype(np.float32)
    boxes1 = np.concatenate([a, a + rng.uniform(1, 30, (20, 2))], -1).astype(
        np.float32
    )
    b = rng.uniform(0, 50, (20, 2)).astype(np.float32)
    boxes2 = np.concatenate([b, b + rng.uniform(1, 30, (20, 2))], -1).astype(
        np.float32
    )
    # manual aligned GIoU oracle
    lt = np.maximum(boxes1[:, :2], boxes2[:, :2])
    rb = np.minimum(boxes1[:, 2:], boxes2[:, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    a1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    a2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    union = a1 + a2 - inter
    ltc = np.minimum(boxes1[:, :2], boxes2[:, :2])
    rbc = np.maximum(boxes1[:, 2:], boxes2[:, 2:])
    area_c = (rbc - ltc).prod(-1)
    ref = inter / union - (area_c - union) / area_c
    ours = np.asarray(L.giou(jnp.asarray(boxes1), jnp.asarray(boxes2)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_gaussian_focal_matches_mmdet_formula():
    rng = np.random.default_rng(2)
    pred = rng.uniform(0.01, 0.99, (30,)).astype(np.float32)
    target = (rng.uniform(size=(30,)) > 0.5).astype(np.float32)
    # mmdet GaussianFocalLoss: pos: -(1-p)^2 log p; neg: -(1-t)^4 p^2 log(1-p)
    pos = target == 1
    ref = (
        -(np.log(pred[pos] + 1e-12) * (1 - pred[pos]) ** 2).sum()
        - (
            np.log(1 - pred[~pos] + 1e-12)
            * pred[~pos] ** 2
            * (1 - target[~pos]) ** 4
        ).sum()
    )
    ours = float(
        L.gaussian_focal_loss(jnp.asarray(pred), jnp.asarray(target))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_box_conversions_roundtrip():
    rng = np.random.default_rng(3)
    cxcywh = rng.uniform(0.1, 0.9, (10, 4)).astype(np.float32)
    xyxy = L.bbox_cxcywh_to_xyxy(jnp.asarray(cxcywh))
    back = L.bbox_xyxy_to_cxcywh(xyxy)
    np.testing.assert_allclose(np.asarray(back), cxcywh, atol=1e-6)
