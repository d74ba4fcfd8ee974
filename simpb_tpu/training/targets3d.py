"""3D target assignment and denoising anchor generation (on-device).

TPU-native rebuild of reference detection3d/target.py
(`SparseBox3DTarget(+With2D)`): focal-style classification cost + masked
weighted-L1 box cost -> exact Hungarian assignment (on device,
simpb_tpu/training/matching.py) -> scattered fixed-shape targets. Ground
truth arrives padded to a static `max_gt` with a validity mask (the data
pipeline's contract), so every shape is known at trace time and the whole
thing lives inside the jitted train step.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from ..core import box3d
from .losses import focal_match_cost
from .matching import batched_assignment

# class labels encoding in dn_cls_target (reference target.py:251, 671):
#   >= 0: positive-matched class; -1: padded GT; -3: negative DN sample
DN_NEG_LABEL = -3
DN_PAD_LABEL = -1


class TargetConfig(NamedTuple):
    cls_weight: float = 2.0
    box_weight: float = 0.25
    alpha: float = 0.25
    gamma: float = 2.0
    eps: float = 1e-12
    reg_weights: Tuple[float, ...] = (2.0,) * 3 + (0.5,) * 3 + (0.0,) * 4
    # per-class reg-weight override {class_idx: weights} (config:269-282)
    cls_wise_reg_weights: Tuple[Tuple[int, Tuple[float, ...]], ...] = (
        (9, (2.0, 2.0, 2.0, 1.0, 1.0, 1.0, 0.0, 0.0, 1.0, 1.0)),
    )


def encode_gt(gt_boxes: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Decoded padded GT [bs, G, 9] (nuScenes: 2D velocity) -> 10-dim
    anchor parameterisation, zeroing padded rows
    (reference target.py:90-106, 222-224)."""
    enc = box3d.encode_box(gt_boxes, vel_dims=gt_boxes.shape[-1] - 7)
    return jnp.where(valid[..., None], enc, 0.0)


def _cls_cost(
    cls_pred: jnp.ndarray,  # [bs, N, C] logits
    gt_labels: jnp.ndarray,  # [bs, G] int (any value where invalid)
    cfg: TargetConfig,
) -> jnp.ndarray:
    """Focal matching cost [bs, N, G] (reference target.py:158-180)."""
    return focal_match_cost(
        cls_pred, gt_labels, cfg.alpha, cfg.gamma, cfg.eps, cfg.cls_weight
    )


def _reg_weights(
    gt_enc: jnp.ndarray, gt_labels: jnp.ndarray, cfg: TargetConfig
) -> jnp.ndarray:
    """Per-GT reg weights: nan-mask plus class-wise overrides
    (reference target.py:121-132)."""
    w = (~jnp.isnan(gt_enc)).astype(jnp.float32)
    for cls_idx, weights in cfg.cls_wise_reg_weights:
        w = jnp.where(
            (gt_labels == cls_idx)[..., None],
            jnp.asarray(weights, jnp.float32),
            w,
        )
    return w


def _box_cost(
    box_pred: jnp.ndarray,  # [bs, N, D]
    gt_enc: jnp.ndarray,  # [bs, G, D]
    inst_weights: jnp.ndarray,  # [bs, G, D]
    cfg: TargetConfig,
) -> jnp.ndarray:
    """Weighted L1 cost [bs, N, G] (reference target.py:182-198)."""
    d = len(cfg.reg_weights)
    diff = jnp.abs(
        box_pred[:, :, None, :d] - jnp.nan_to_num(gt_enc[:, None, :, :d])
    )
    w = inst_weights[:, None, :, :d] * jnp.asarray(
        cfg.reg_weights, jnp.float32
    )
    return (diff * w).sum(-1) * cfg.box_weight


def sample_targets3d(
    cls_pred: jnp.ndarray,  # [bs, N, C] logits
    box_pred: jnp.ndarray,  # [bs, N, 10] (trimmed to len(reg_weights))
    gt_boxes: jnp.ndarray,  # [bs, G, 9] decoded (x,y,z,w,l,h,yaw,vx,vy)
    gt_labels: jnp.ndarray,  # [bs, G] int
    gt_valid: jnp.ndarray,  # [bs, G] bool
    cfg: TargetConfig = TargetConfig(),
):
    """Hungarian label assignment (reference target.py:108-156).

    Returns (cls_target [bs,N] with num_cls=background, box_target
    [bs,N,10], reg_weights [bs,N,10]).
    """
    bs, n, num_cls = cls_pred.shape
    gt_enc = encode_gt(gt_boxes, gt_valid)
    inst_w = _reg_weights(gt_enc, gt_labels, cfg)
    cost = _cls_cost(cls_pred, gt_labels, cfg) + _box_cost(
        box_pred, gt_enc, inst_w, cfg
    )
    cost = jnp.nan_to_num(cost, nan=1e8, neginf=1e8, posinf=1e8)
    # assignment over rows=GT (padded rows matched but masked out after)
    col = batched_assignment(
        jnp.swapaxes(cost, 1, 2), gt_valid, 1e6
    )  # [bs, G] query index per GT

    cls_target = jnp.full((bs, n), num_cls, jnp.int32)
    box_target = jnp.zeros_like(box_pred)
    reg_weights = jnp.zeros_like(box_pred)

    safe_col = jnp.where(gt_valid, col, n)  # out-of-range drops scatter
    cls_target = cls_target.at[
        jnp.arange(bs)[:, None], safe_col
    ].set(gt_labels.astype(jnp.int32), mode="drop")
    box_target = box_target.at[jnp.arange(bs)[:, None], safe_col].set(
        jnp.nan_to_num(gt_enc)[..., : box_pred.shape[-1]], mode="drop"
    )
    reg_weights = reg_weights.at[jnp.arange(bs)[:, None], safe_col].set(
        inst_w[..., : box_pred.shape[-1]], mode="drop"
    )
    return cls_target, box_target, reg_weights


# ---------------------------------------------------------------------------
# Denoising anchors
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class DnBundle:
    """Fixed-shape denoising inputs for the head (training only).

    num_dn = num_dn_groups * num_gt_per_group, where num_gt_per_group =
    2 * max_dn_gt when add_neg_dn (positive + negative noise,
    reference target.py:238-245). Layout along the dn axis is
    group-major: [g0 pos | g0 neg | g1 pos | ...] (target.py:269-271).
    """

    dn_anchor: jnp.ndarray  # [bs, num_dn, 11]
    box_target: jnp.ndarray  # [bs, num_dn, 11]
    cls_target: jnp.ndarray  # [bs, num_dn] (>=0 pos, -3 neg, -1 pad)
    valid_mask: jnp.ndarray  # [bs, num_dn] (not from padding)
    id_target: jnp.ndarray  # [bs, num_dn] instance ids (-1 none)
    attn_mask: jnp.ndarray  # [num_dn, num_dn] bool True=blocked
    # 2D extensions (SparseBox3DTargetWith2D, target.py:610-766)
    trans_mask2d: jnp.ndarray  # [bs, num_dn, cams] GT camera visibility
    cls_target2d: jnp.ndarray  # [bs, num_dn, cams]
    box_target2d: jnp.ndarray  # [bs, num_dn, cams, 4] xyxy pixels
    alpha_target2d: jnp.ndarray  # [bs, num_dn, cams]
    valid_mask2d: jnp.ndarray  # [bs, num_dn, cams]


def get_dn_anchors(
    rng: jax.Array,
    gt_boxes: jnp.ndarray,  # [bs, G, 9] decoded (2-D vel), G >= max_dn_gt
    gt_labels: jnp.ndarray,  # [bs, G]
    gt_valid: jnp.ndarray,  # [bs, G]
    gt_instance_id: Optional[jnp.ndarray] = None,  # [bs, G]
    gt_vis2d: Optional[jnp.ndarray] = None,  # [bs, G, cams] bool
    gt_boxes2d: Optional[jnp.ndarray] = None,  # [bs, G, cams, 4]
    gt_labels2d: Optional[jnp.ndarray] = None,  # [bs, G, cams]
    gt_alphas2d: Optional[jnp.ndarray] = None,  # [bs, G, cams]
    num_dn_groups: int = 5,
    max_dn_gt: int = 32,
    add_neg_dn: bool = True,
    noise_scale: Tuple[float, ...] = (2.0,) * 3 + (0.5,) * 7,
    num_cams: int = 6,
    cfg: TargetConfig = TargetConfig(),
) -> DnBundle:
    """Build noised GT anchor groups + matched targets
    (reference target.py:579-766, fixed shapes).

    The 2D GT arrives already scattered per 3D-GT slot (the pipeline
    resolves `gt_2d_3d_map` on host — reference target.py:619-636).
    """
    bs = gt_boxes.shape[0]
    g = max_dn_gt
    gt_boxes = gt_boxes[:, :g]
    gt_labels = jnp.where(gt_valid[:, :g], gt_labels[:, :g], DN_PAD_LABEL)
    gt_valid = gt_valid[:, :g]
    enc = encode_gt(gt_boxes, gt_valid)  # [bs, g, 10]

    if gt_instance_id is None:
        gt_instance_id = jnp.full((bs, g), -1, jnp.int32)
    else:
        gt_instance_id = jnp.where(gt_valid, gt_instance_id[:, :g], -1)
    if gt_vis2d is None:
        gt_vis2d = jnp.zeros((bs, g, num_cams), bool)
        gt_boxes2d = jnp.zeros((bs, g, num_cams, 4), jnp.float32)
        gt_labels2d = jnp.full((bs, g, num_cams), -1, jnp.int32)
        gt_alphas2d = jnp.zeros((bs, g, num_cams), jnp.float32)
    gt_vis2d = gt_vis2d[:, :g] & gt_valid[..., None]
    gt_labels2d = jnp.where(gt_vis2d, gt_labels2d[:, :g], -1)
    gt_boxes2d = jnp.where(gt_vis2d[..., None], gt_boxes2d[:, :g], 0.0)
    gt_alphas2d = jnp.where(gt_vis2d, gt_alphas2d[:, :g], 0.0)

    # tile per group; flatten groups into the batch for matching
    def tile_g(x):
        return jnp.tile(x, (num_dn_groups,) + (1,) * (x.ndim - 1))

    enc_t = tile_g(enc)  # [G*bs, g, 11]
    labels_t = tile_g(gt_labels)
    scale = jnp.asarray(noise_scale, jnp.float32)
    k1, k2, k3 = jax.random.split(rng, 3)
    noise = (jax.random.uniform(k1, enc_t.shape) * 2 - 1) * scale
    dn_anchor = enc_t + noise
    num_per = g
    if add_neg_dn:
        noise_neg = (jax.random.uniform(k2, enc_t.shape) + 1) * scale
        flag = jnp.where(jax.random.uniform(k3, enc_t.shape) > 0.5, 1.0, -1.0)
        dn_anchor = jnp.concatenate(
            [dn_anchor, enc_t + noise_neg * flag], axis=1
        )
        num_per = g * 2

    # match noised anchors back to GT with the plain L1 box cost
    # (uniform reg weights, reference target.py:668)
    cost = _box_cost(dn_anchor, enc_t, jnp.ones_like(enc_t), cfg)
    valid_t = tile_g(gt_valid)
    col = batched_assignment(
        jnp.swapaxes(cost, 1, 2), valid_t, 1e6
    )  # [G*bs, g] anchor index per GT

    gb, _ = col.shape
    rows = jnp.arange(gb)[:, None]
    safe_col = jnp.where(valid_t, col, num_per)

    def scatter(shape_src, fill, dtype=None):
        tgt = jnp.full(
            (gb, num_per) + shape_src.shape[2:],
            fill,
            dtype or shape_src.dtype,
        )
        return tgt.at[rows, safe_col].set(shape_src, mode="drop")

    dn_box_target = scatter(jnp.nan_to_num(enc_t), 0.0)
    dn_cls_target = scatter(labels_t.astype(jnp.int32), DN_NEG_LABEL)
    dn_id_target = scatter(tile_g(gt_instance_id).astype(jnp.int32), -1)
    dn_trans2d = scatter(tile_g(gt_vis2d), False)
    dn_cls2d = scatter(
        tile_g(gt_labels2d).astype(jnp.int32), -4
    )
    dn_box2d = scatter(tile_g(gt_boxes2d), 0.0)
    dn_alpha2d = scatter(tile_g(gt_alphas2d), 0.0)

    # valid = matched-to-real-GT OR (negative sample of a real GT)
    # (reference target.py:731-741)
    pad_labels = (
        jnp.concatenate([labels_t, labels_t], axis=1)
        if add_neg_dn
        else labels_t
    )
    valid_mask = dn_cls_target >= 0
    if add_neg_dn:
        valid_mask = valid_mask | (
            (pad_labels >= 0) & (dn_cls_target == DN_NEG_LABEL)
        )
    pad_labels2d = (
        jnp.concatenate([tile_g(gt_labels2d), tile_g(gt_labels2d)], axis=1)
        if add_neg_dn
        else tile_g(gt_labels2d)
    )
    valid_mask2d = dn_cls2d >= 0
    if add_neg_dn:
        valid_mask2d = valid_mask2d | ((pad_labels2d >= 0) & (dn_cls2d == -4))

    # [G*bs, ...] -> [bs, G*num_per, ...] (group-major along dn axis)
    def regroup(x):
        x = x.reshape((num_dn_groups, bs) + x.shape[1:])
        x = jnp.moveaxis(x, 1, 0)
        return x.reshape((bs, num_dn_groups * num_per) + x.shape[3:])

    num_dn = num_dn_groups * num_per
    block = jnp.kron(
        jnp.eye(num_dn_groups, dtype=jnp.int32),
        jnp.ones((num_per, num_per), jnp.int32),
    )
    attn_mask = block == 0  # True = blocked across groups (target.py:743-749)

    # pad noised anchors (10-dim: 2-D GT velocity) to the 11-dim anchor
    # state (reference simpb_head.py:366-369)
    dn_anchor = jnp.concatenate(
        [
            dn_anchor,
            jnp.zeros(
                dn_anchor.shape[:-1]
                + (box3d.STATE_DIM - dn_anchor.shape[-1],),
                dn_anchor.dtype,
            ),
        ],
        axis=-1,
    )
    return DnBundle(
        dn_anchor=regroup(dn_anchor),
        box_target=regroup(dn_box_target),
        cls_target=regroup(dn_cls_target),
        valid_mask=regroup(valid_mask),
        id_target=regroup(dn_id_target),
        attn_mask=attn_mask,
        trans_mask2d=regroup(dn_trans2d),
        cls_target2d=regroup(dn_cls2d),
        box_target2d=regroup(dn_box2d),
        alpha_target2d=regroup(dn_alpha2d),
        valid_mask2d=regroup(valid_mask2d),
    )
