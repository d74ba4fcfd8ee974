"""Temporal denoising cache as explicit functional state.

The reference keeps `sampler.dn_metas` as Python attributes mutated in
the middle of the head forward (reference detection3d/target.py:302-429,
768-966). Here the cache is a `DnState` pytree and `update_dn` /
`cache_dn` are pure functions called from the jitted training step.
Shapes are fully static: num_dn_groups groups of `num_per` noised
instances each, `num_temp_dn_groups` of which stream across frames.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from .targets3d import DnBundle


@flax.struct.dataclass
class DnState:
    """Cached temporal DN groups (reference cache_dn, target.py:919-966)."""

    feature: jnp.ndarray  # [bs, Gt, num_per, C]
    anchor: jnp.ndarray  # [bs, Gt, num_per, 11]
    cls_target: jnp.ndarray  # [bs, Gt, num_per]
    valid_mask: jnp.ndarray  # [bs, Gt, num_per]
    id_target: jnp.ndarray  # [bs, Gt, num_per]
    trans_mask2d: jnp.ndarray  # [bs, Gt, num_per, cams]
    valid_mask2d: jnp.ndarray  # [bs, Gt, num_per, cams]
    cls_target2d: jnp.ndarray  # [bs, Gt, num_per, cams]
    alpha_target2d: jnp.ndarray  # [bs, Gt, num_per, cams]

    @staticmethod
    def init(bs, num_temp_groups, num_per, embed_dims, num_cams):
        z = jnp.zeros
        return DnState(
            feature=z((bs, num_temp_groups, num_per, embed_dims), jnp.float32),
            anchor=z((bs, num_temp_groups, num_per, 11), jnp.float32),
            cls_target=jnp.full((bs, num_temp_groups, num_per), -1, jnp.int32),
            valid_mask=z((bs, num_temp_groups, num_per), bool),
            id_target=jnp.full((bs, num_temp_groups, num_per), -1, jnp.int32),
            trans_mask2d=z((bs, num_temp_groups, num_per, num_cams), bool),
            valid_mask2d=z((bs, num_temp_groups, num_per, num_cams), bool),
            cls_target2d=jnp.full(
                (bs, num_temp_groups, num_per, num_cams), -1, jnp.int32
            ),
            alpha_target2d=z(
                (bs, num_temp_groups, num_per, num_cams), jnp.float32
            ),
        )


def update_dn(
    instance_feature: jnp.ndarray,  # [bs, A + num_dn, C]
    anchor: jnp.ndarray,  # [bs, A + num_dn, 11]
    bundle: DnBundle,
    state: Optional[DnState],
    temp_valid_mask: jnp.ndarray,  # [bs] instance-bank stream validity
    num_anchor3d: int,
    num_dn_groups: int,
    num_temp_dn_groups: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, DnBundle]:
    """Re-inject cached temporal DN groups matched by instance id.

    Mirrors reference update_dn (target.py:768-917): the first
    `num_temp_dn_groups` groups' features/anchors come from the cache;
    their reg/box2d targets are pulled from the *current* frame's targets
    of the same instance id; unmatched cached instances get cls -1 / zero
    masks. Returns (instance_feature, anchor, updated bundle) — the
    updated bundle is the "temp_" target set used for decoder layers
    >= num_single_frame_decoder.
    """
    if state is None:
        return instance_feature, anchor, bundle

    bs = instance_feature.shape[0]
    num_dn = instance_feature.shape[1] - num_anchor3d
    num_per = num_dn // num_dn_groups
    cams = bundle.trans_mask2d.shape[-1]
    gt_ = num_temp_dn_groups

    grp = lambda x: x.reshape((bs, num_dn_groups, num_per) + x.shape[2:])
    dn_feat = grp(instance_feature[:, num_anchor3d:])
    dn_anchor = grp(anchor[:, num_anchor3d:])
    dn_reg = grp(bundle.box_target)
    dn_cls = grp(bundle.cls_target)
    dn_valid = grp(bundle.valid_mask)
    dn_id = grp(bundle.id_target)
    dn_trans2d = grp(bundle.trans_mask2d)
    dn_valid2d = grp(bundle.valid_mask2d)
    dn_cls2d = grp(bundle.cls_target2d)
    dn_box2d = grp(bundle.box_target2d)
    dn_alpha2d = grp(bundle.alpha_target2d)

    # match cached ids to current ids: [bs, Gt, num_per(temp), num_per(cur)]
    match = (state.id_target[..., None] == dn_id[:, :gt_, None]) & (
        state.id_target[..., None] >= 0
    )
    no_match = ~match.any(-1)
    temp_reg = jnp.einsum(
        "bgtc,bgcd->bgtd", match.astype(dn_reg.dtype), dn_reg[:, :gt_]
    )
    temp_box2d = jnp.einsum(
        "bgtc,bgcnd->bgtnd", match.astype(dn_box2d.dtype), dn_box2d[:, :gt_]
    )
    temp_cls = jnp.where(no_match, -1, state.cls_target)
    nm = no_match[..., None]
    temp_trans2d = jnp.where(nm, False, state.trans_mask2d)
    temp_valid2d = jnp.where(nm, False, state.valid_mask2d)
    temp_cls2d = jnp.where(nm, -1, state.cls_target2d)
    temp_alpha2d = jnp.where(nm, 0.0, state.alpha_target2d)

    def merge(cur, temp):
        m = temp_valid_mask.reshape((bs,) + (1,) * (cur.ndim - 1))
        head_part = jnp.where(m, temp, cur[:, :gt_])
        out = jnp.concatenate([head_part, cur[:, gt_:]], axis=1)
        return out.reshape((bs, num_dn_groups * num_per) + out.shape[3:])

    new_feat = merge(dn_feat, state.feature)
    new_anchor = merge(dn_anchor, state.anchor)
    new_bundle = bundle.replace(
        box_target=merge(dn_reg, temp_reg),
        cls_target=merge(dn_cls, temp_cls),
        valid_mask=merge(dn_valid, state.valid_mask),
        id_target=merge(dn_id, state.id_target),
        trans_mask2d=merge(dn_trans2d, temp_trans2d),
        valid_mask2d=merge(dn_valid2d, temp_valid2d),
        cls_target2d=merge(dn_cls2d, temp_cls2d),
        box_target2d=merge(dn_box2d, temp_box2d),
        alpha_target2d=merge(dn_alpha2d, temp_alpha2d),
    )
    instance_feature = jnp.concatenate(
        [instance_feature[:, :num_anchor3d], new_feat], axis=1
    )
    anchor = jnp.concatenate([anchor[:, :num_anchor3d], new_anchor], axis=1)
    return instance_feature, anchor, new_bundle


def cache_dn(
    rng: jax.Array,
    dn_instance_feature: jnp.ndarray,  # [bs, num_dn, C]
    dn_anchor: jnp.ndarray,  # [bs, num_dn, 11]
    bundle: DnBundle,
    num_dn_groups: int,
    num_temp_dn_groups: int,
) -> DnState:
    """Cache a random subset of DN groups for the next frame
    (reference cache_dn, target.py:919-966)."""
    bs, num_dn = dn_instance_feature.shape[:2]
    num_per = num_dn // num_dn_groups

    scores = jax.random.uniform(rng, (num_dn_groups,))
    keep = jnp.sort(jnp.argsort(scores)[:num_temp_dn_groups])

    grp = lambda x: x.reshape((bs, num_dn_groups, num_per) + x.shape[2:])[
        :, keep
    ]
    return DnState(
        feature=jax.lax.stop_gradient(grp(dn_instance_feature)),
        anchor=jax.lax.stop_gradient(grp(dn_anchor)),
        cls_target=grp(bundle.cls_target),
        valid_mask=grp(bundle.valid_mask),
        id_target=grp(bundle.id_target),
        trans_mask2d=grp(bundle.trans_mask2d),
        valid_mask2d=grp(bundle.valid_mask2d),
        cls_target2d=grp(bundle.cls_target2d),
        alpha_target2d=grp(bundle.alpha_target2d),
    )
