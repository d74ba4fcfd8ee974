"""SimPB head: the interleaved 2D/3D decoder driven by `operation_order`.

TPU-native rebuild of the reference `SimPBHead`
(models/simpb_head.py:32-1123). The decoder remains a config-driven
program over named ops (ffn / norm / allocation / aggregation /
qg_self_attn / qg_cross_attn / refine2d / gnn / temp_gnn / deformable /
refine3d — simpb_head.py:164-186), but:

* all shapes are static — the ragged 2D query list becomes per-camera
  capacity-K slots (see simpb_tpu/models/allocation.py);
* the temporal instance bank is explicit functional state
  (simpb_tpu/models/instance_bank.py), as is the temporal denoising
  cache (simpb_tpu/training/dn.py);
* decoupled attention (concat query+pos, shared fc_before/fc_after
  projections — simpb_head.py:298-321) is preserved parameter-for-
  parameter for checkpoint conversion.

Denoising (DN) query blocks enter as a fixed-shape `DnBundle`; when
absent the head runs the pure inference program.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs.base import HeadConfig
from ..ops.sampling import make_pair_table
from ..ops.format import SpatialShapes
from ..training.dn import DnState, cache_dn, update_dn
from ..training.targets3d import DnBundle
from .aggregation import ReWeight
from .allocation import Allocation, allocate_queries, dispatch_to_2d
from .det2d_blocks import SparseBox2DEncoder, SparseBox2DRefinementModule
from .det3d_blocks import SparseBox3DEncoder, SparseBox3DRefinementModule
from .dfa import DeformableFeatureAggregation
from .encoder2d import DeformableEncoder2D
from .group_attn import QueryGroupMSDA, QueryGroupSelfAttention
from .instance_bank import InstanceBank, TemporalState
from .layers import AsymmetricFFN, ResidualAttention


def gather_dn_slot_targets(alloc: Allocation, bundle: DnBundle, num_cams: int):
    """Per-slot DN 2D targets from the bundle's per-(instance, cam) GT.

    Equivalent of Denoise2D's masked scatter of dn 2D targets into the
    slot layout (reference detection2d/denoise.py:105-145), expressed as
    a gather through the slot's (parent instance, camera) coordinates.
    """
    bs, q = alloc.parent_idx.shape
    k = q // num_cams
    cam_idx = jnp.repeat(jnp.arange(num_cams), k)[None].repeat(bs, 0)
    b_idx = jnp.arange(bs)[:, None]
    pick = lambda x: x[b_idx, alloc.parent_idx, cam_idx]
    valid = alloc.valid
    return {
        "cls": jnp.where(valid, pick(bundle.cls_target2d), -1),
        "box": jnp.where(valid[..., None], pick(bundle.box_target2d), 0.0),
        "alpha": jnp.where(valid, pick(bundle.alpha_target2d), 0.0),
        "valid": valid & pick(bundle.valid_mask2d),
    }


class SimPBHead(nn.Module):
    cfg: HeadConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        e = c.embed_dims
        self.bank = InstanceBank(
            num_anchor=c.num_anchor,
            num_temp_instances=c.num_temp_instances,
            embed_dims=e,
            confidence_decay=c.confidence_decay,
            default_time_interval=c.default_time_interval,
            max_time_interval=c.max_time_interval,
        )
        # learnable anchors (k-means-initialised via checkpoint utilities)
        # and the fixed-zero instance feature (feat_grad=False, config:127)
        self.anchor = self.param(
            "anchor",
            nn.initializers.uniform(scale=1.0),
            (c.num_anchor, 11),
        )
        self.instance_feature = self.param(
            "instance_feature", nn.initializers.zeros, (c.num_anchor, e)
        )

        # decoupled-attn component dims [e/2, e/8, e/8, e/4] sum to e
        # (released config: [128, 32, 32, 64] at e=256, config:136-144)
        self.anchor_encoder = SparseBox3DEncoder(
            embed_dims=(e // 2, e // 8, e // 8, e // 4), dtype=self.dtype
        )
        self.anchor_encoder2d = SparseBox2DEncoder(
            embed_dims=e, dtype=self.dtype
        )
        # optional deformable-DETR feature encoder (the reference's
        # encoder2d hook, simpb_head.py:214-276; off in released configs)
        if c.encoder2d_layers:
            self.encoder2d = DeformableEncoder2D(
                embed_dims=e,
                num_heads=c.num_groups,
                num_levels=c.num_levels,
                num_layers=c.encoder2d_layers,
                feedforward_channels=e * 4,
                dropout=c.drop_out,
                dtype=self.dtype,
                name="encoder2d",
            )

        dense = lambda f, name: nn.Dense(
            f, use_bias=False, dtype=self.dtype, name=name
        )
        if c.decouple_attn:
            self.fc_before = dense(e * 2, "fc_before")
            self.fc_after = dense(e, "fc_after")
        else:
            # reference falls back to nn.Identity (simpb_head.py:192-194)
            self.fc_before = lambda x: x
            self.fc_after = lambda x: x
        if c.decouple_attn2d:
            self.fc_before2d = dense(e * 2, "fc_before2d")
            self.fc_after2d = dense(e, "fc_after2d")

        attn_dims = e * 2 if c.decouple_attn else e
        attn2d_dims = e * 2 if c.decouple_attn2d else e

        layers: List[Any] = []
        reweights: Dict[int, Any] = {}
        for i, op in enumerate(c.operation_order):
            if op == "ffn":
                layers.append(
                    AsymmetricFFN(
                        embed_dims=e,
                        in_channels=e * 2,
                        feedforward_channels=e * 4,
                        ffn_drop=c.drop_out,
                        dtype=self.dtype,
                        name=f"op{i}_ffn",
                    )
                )
            elif op == "norm":
                layers.append(
                    nn.LayerNorm(
                        epsilon=1e-5, dtype=self.dtype, name=f"op{i}_norm"
                    )
                )
            elif op in ("gnn", "temp_gnn"):
                layers.append(
                    ResidualAttention(
                        embed_dims=attn_dims,
                        num_heads=c.num_groups,
                        attn_drop=c.drop_out,
                        out_drop=c.drop_out,
                        dtype=self.dtype,
                        name=f"op{i}_{op}",
                    )
                )
            elif op == "deformable":
                layers.append(
                    DeformableFeatureAggregation(
                        embed_dims=e,
                        num_groups=c.num_groups,
                        num_levels=c.num_levels,
                        num_cams=c.num_cams,
                        attn_drop=c.dfa_attn_drop,
                        num_learnable_pts=c.num_learnable_pts,
                        gather_capacity=c.dfa_gather_capacity,
                        sel_levels=c.dfa_sel_levels or None,
                        level_capacity=c.dfa_level_capacity or None,
                        guard=c.guard_sampling,
                        dtype=self.dtype,
                        name=f"op{i}_deformable",
                    )
                )
            elif op == "refine3d":
                layers.append(
                    SparseBox3DRefinementModule(
                        embed_dims=e,
                        num_cls=c.num_classes,
                        refine_yaw=True,
                        with_quality_estimation=c.with_quality_estimation,
                        dtype=self.dtype,
                        name=f"op{i}_refine3d",
                    )
                )
            elif op == "refine2d":
                layers.append(
                    SparseBox2DRefinementModule(
                        embed_dims=e,
                        num_cls=c.num_classes,
                        dtype=self.dtype,
                        name=f"op{i}_refine2d",
                    )
                )
            elif op == "qg_self_attn":
                layers.append(
                    QueryGroupSelfAttention(
                        embed_dims=attn2d_dims,
                        num_heads=c.num_groups,
                        num_cams=c.num_cams,
                        attn_drop=c.drop_out,
                        out_drop=0.1,
                        dtype=self.dtype,
                        name=f"op{i}_qg_self_attn",
                    )
                )
            elif op == "qg_cross_attn":
                layers.append(
                    QueryGroupMSDA(
                        embed_dims=e,
                        num_heads=c.num_groups,
                        num_levels=c.num_levels,
                        num_cams=c.num_cams,
                        dropout=c.drop_out,
                        patch_mode=c.msda_patch_mode,
                        gather_capacity=c.msda_gather_capacity,
                        sel_levels=c.msda_sel_levels or None,
                        patch_hw=c.msda_patch_hw,
                        hybrid_mode=c.msda_hybrid_mode,
                        clamp_capacity=c.msda_clamp_capacity,
                        guard=c.guard_sampling,
                        dtype=self.dtype,
                        name=f"op{i}_qg_cross_attn",
                    )
                )
            elif op == "aggregation":
                layers.append(
                    ResidualAttention(
                        embed_dims=attn_dims,
                        num_heads=c.num_groups,
                        attn_drop=c.drop_out,
                        out_drop=c.drop_out,
                        dtype=self.dtype,
                        name=f"op{i}_aggregation_attn",
                    )
                )
                reweights[i] = ReWeight(
                    f_dim=e, dtype=self.dtype, name=f"op{i}_reweight"
                )
            elif op == "allocation":
                layers.append(None)
            else:
                raise NotImplementedError(op)
        self.layers = layers
        self.reweight_modules = reweights

    # ------------------------------------------------------------------
    # decoupled attention helpers (simpb_head.py:298-321)
    # ------------------------------------------------------------------
    def graph_model(
        self, layer, query, key=None, value=None, query_pos=None,
        key_pos=None, attn_mask=None, deterministic=True,
    ):
        if self.cfg.decouple_attn:
            query = jnp.concatenate([query, query_pos], axis=-1)
            if key is not None:
                key = jnp.concatenate([key, key_pos], axis=-1)
            query_pos, key_pos = None, None
        if value is not None:
            value = self.fc_before(value)
        out = layer(
            query, key, value, query_pos=query_pos, key_pos=key_pos,
            attn_mask=attn_mask, deterministic=deterministic,
        )
        return self.fc_after(out)

    # ------------------------------------------------------------------
    def __call__(
        self,
        col_feats: jnp.ndarray,  # [bs, cams, ΣHW, C]
        spatial_shapes: SpatialShapes,
        projection_mat: jnp.ndarray,  # [bs, cams, 4, 4]
        image_wh: tuple,  # static (W, H)
        temporal: Optional[TemporalState] = None,
        time_interval: Optional[jnp.ndarray] = None,  # [bs]
        temp2cur: Optional[jnp.ndarray] = None,  # [bs, 4, 4]
        dn: Optional[DnBundle] = None,
        dn_state: Optional[DnState] = None,
        train: bool = False,
    ) -> Dict[str, Any]:
        c = self.cfg
        bs = col_feats.shape[0]
        image_wh_arr = jnp.tile(
            jnp.asarray(image_wh, jnp.float32)[None, None], (bs, c.num_cams, 1)
        )
        deterministic = not train

        # ========= instance fetch (simpb_head.py:332-338) =========
        (
            instance_feature,
            anchor,
            temp_instance_feature,
            temp_anchor,
            time_interval,
            temp_mask,
        ) = self.bank.get(
            self.anchor,
            self.instance_feature,
            bs,
            temporal,
            time_interval,
            temp2cur,
        )

        # ========= denoising concat (simpb_head.py:357-381) =========
        attn_mask = None
        num_anchor3d = c.num_anchor
        dn_cur = dn  # current-target bundle; replaced by update_dn
        if dn is not None:
            num_dn = dn.dn_anchor.shape[1]
            anchor = jnp.concatenate([anchor, dn.dn_anchor], axis=1)
            instance_feature = jnp.concatenate(
                [
                    instance_feature,
                    jnp.zeros((bs, num_dn, instance_feature.shape[-1]),
                              instance_feature.dtype),
                ],
                axis=1,
            )
            n = num_anchor3d + num_dn
            attn_mask = jnp.ones((n, n), dtype=bool)
            attn_mask = attn_mask.at[:num_anchor3d, :num_anchor3d].set(False)
            attn_mask = attn_mask.at[num_anchor3d:, num_anchor3d:].set(
                dn.attn_mask
            )

        anchor_embed = self.anchor_encoder(anchor)
        temp_anchor_embed = (
            self.anchor_encoder(temp_anchor) if temp_anchor is not None else None
        )

        # ========= decoder program (simpb_head.py:419-627) =========
        prediction, classification, quality = [], [], []
        prediction2d, classification2d = [], []
        prediction_alpha2d = []
        alloc_list: List[Allocation] = []
        dn_slot_targets: List[dict] = []

        # snapshot fed to `aggregation` as query3d; tracked separately from
        # instance_feature (even though no released op order mutates the
        # latter in between) because operation_order is user-configurable —
        # mirrors reference simpb_head.py:412,579
        temp_attn_instance = instance_feature
        alloc: Optional[Allocation] = None
        dn2d: Optional[Allocation] = None
        anchor2d = anchor_embed2d = None
        feat2d = None  # instance features while in the 2D branch

        # optional encoder2d: the 2D cross-attention samples the refined
        # memory; share_encoder2d also feeds it to the 3D DFA path
        # (reference simpb_head.py:414-417)
        memory2d = col_feats
        if c.encoder2d_layers:
            memory2d = self.encoder2d(
                col_feats, spatial_shapes, deterministic=deterministic
            )
            if c.share_encoder2d:
                col_feats = memory2d

        # shared raw pair table(s): ONE full-column-copy table build
        # serves every sampling call of the frame — DFA samples it
        # directly, patch-mode MSDA samples raw and applies its value
        # projection post-sampling (exact; ops/sampling.py). In training
        # each op instead rebuilds its table inside its remat so the
        # backward pass recomputes it rather than storing it.
        pair_feats = pair_memory = None
        if c.share_sampling_table and not train:
            pair_feats = make_pair_table(
                col_feats.reshape(-1, col_feats.shape[-1])
            )
            pair_memory = (
                pair_feats
                if memory2d is col_feats
                else make_pair_table(
                    memory2d.reshape(-1, memory2d.shape[-1])
                )
            )

        for i, op in enumerate(c.operation_order):
            layer = self.layers[i]
            if op == "norm":
                if feat2d is not None:
                    feat2d = layer(feat2d)
                else:
                    instance_feature = layer(instance_feature)
            elif op == "ffn":
                if feat2d is not None:
                    feat2d = layer(feat2d, deterministic=deterministic)
                else:
                    instance_feature = layer(
                        instance_feature, deterministic=deterministic
                    )
            elif op == "allocation":
                rng = (
                    self.make_rng("sampling")
                    if train and self.has_rng("sampling")
                    else None
                )
                alloc = allocate_queries(
                    anchor[:, :num_anchor3d],
                    projection_mat,
                    image_wh,
                    capacity=c.allocation_capacity,
                    limit_corners=c.limit_corners,
                    rng=rng,
                )
                feat2d = dispatch_to_2d(alloc, instance_feature[:, :num_anchor3d])
                anchor2d = alloc.anchor2d
                if dn_cur is not None:
                    dn2d = allocate_queries(
                        anchor[:, num_anchor3d:],
                        projection_mat,
                        image_wh,
                        capacity=c.dn_allocation_capacity,
                        visibility=dn_cur.trans_mask2d,
                    )
                    feat2d = jnp.concatenate(
                        [
                            feat2d,
                            dispatch_to_2d(
                                dn2d, instance_feature[:, num_anchor3d:]
                            ),
                        ],
                        axis=1,
                    )
                    anchor2d = jnp.concatenate(
                        [anchor2d, dn2d.anchor2d], axis=1
                    )
                anchor_embed2d = self.anchor_encoder2d(anchor2d)
            elif op == "qg_self_attn":
                feat2d = self._qg_self_attn(
                    layer, feat2d, anchor_embed2d, alloc, dn2d, deterministic
                )
            elif op == "qg_cross_attn":
                feat2d = self._qg_cross_attn(
                    layer, feat2d, anchor_embed2d, alloc, dn2d, memory2d,
                    spatial_shapes, deterministic, pair_memory,
                )
            elif op == "refine2d":
                box2d, cls2d, _, alpha2d = layer(
                    feat2d, anchor2d, anchor_embed2d, return_cls=True
                )
                prediction2d.append(box2d)
                classification2d.append(cls2d)
                prediction_alpha2d.append(alpha2d)
                alloc_list.append(alloc)
                if dn2d is not None:
                    dn_slot_targets.append(
                        gather_dn_slot_targets(dn2d, dn_cur, c.num_cams)
                    )
                anchor2d = box2d
            elif op == "aggregation":
                instance_feature, anchor_embed = self._aggregate(
                    i, layer, feat2d, anchor_embed2d, alloc, dn2d,
                    temp_attn_instance, anchor_embed, num_anchor3d,
                    attn_mask, deterministic,
                )
                feat2d = None
                dn2d = None
            elif op == "gnn":
                instance_feature = self.graph_model(
                    layer,
                    instance_feature,
                    value=instance_feature,
                    query_pos=anchor_embed,
                    attn_mask=attn_mask,
                    deterministic=deterministic,
                )
            elif op == "temp_gnn":
                if temp_instance_feature is None:
                    # cold start: the reference passes key=value=None, so
                    # the mmcv MHA falls back to value = key = the
                    # decoupled concat(query, pos) WITHOUT fc_before
                    # (simpb_head.py:298-310 + mmcv MultiheadAttention
                    # None-defaulting) — do the same here
                    instance_feature = self.graph_model(
                        layer,
                        instance_feature,
                        value=None,
                        query_pos=anchor_embed,
                        attn_mask=attn_mask,
                        deterministic=deterministic,
                    )
                else:
                    instance_feature = self.graph_model(
                        layer,
                        instance_feature,
                        temp_instance_feature,
                        temp_instance_feature,
                        query_pos=anchor_embed,
                        key_pos=temp_anchor_embed,
                        attn_mask=None,
                        deterministic=deterministic,
                    )
                temp_attn_instance = instance_feature
            elif op == "deformable":
                instance_feature = layer(
                    instance_feature,
                    anchor,
                    anchor_embed,
                    col_feats,
                    spatial_shapes,
                    projection_mat,
                    image_wh_arr,
                    deterministic=deterministic,
                    pair_table=pair_feats,
                )
            elif op == "refine3d":
                return_cls = (
                    train
                    or len(prediction) == c.num_single_frame_decoder - 1
                    or i == len(c.operation_order) - 1
                )
                anchor, cls, qt = layer(
                    instance_feature,
                    anchor,
                    anchor_embed,
                    time_interval=time_interval,
                    return_cls=return_cls,
                )
                prediction.append(anchor)
                classification.append(cls)
                quality.append(qt)
                if len(prediction) == c.num_single_frame_decoder:
                    if temporal is not None:
                        instance_feature, anchor = self.bank.update(
                            instance_feature,
                            anchor,
                            cls,
                            temp_instance_feature,
                            temp_anchor,
                            temp_mask,
                        )
                    # temporal denoising (simpb_head.py:608-620)
                    if dn_cur is not None and c.num_temp_dn_groups > 0:
                        tvm = (
                            temp_mask
                            if temp_mask is not None
                            else jnp.zeros((bs,), bool)
                        )
                        instance_feature, anchor, dn_cur = update_dn(
                            instance_feature,
                            anchor,
                            dn_cur,
                            dn_state,
                            tvm,
                            num_anchor3d,
                            c.num_dn_groups,
                            c.num_temp_dn_groups,
                        )
                if i != len(c.operation_order) - 1:
                    anchor_embed = self.anchor_encoder(anchor)
                if (
                    len(prediction) > c.num_single_frame_decoder
                    and temp_anchor_embed is not None
                ):
                    temp_anchor_embed = anchor_embed[
                        :, : c.num_temp_instances
                    ]
            else:
                raise NotImplementedError(op)

        output: Dict[str, Any] = {}
        if dn is not None:
            output["dn_prediction"] = [p[:, num_anchor3d:] for p in prediction]
            output["dn_classification"] = [
                x[:, num_anchor3d:] if x is not None else None
                for x in classification
            ]
            q2 = alloc_list[0].num_queries if alloc_list else 0
            output["dn_prediction2d"] = [p[:, q2:] for p in prediction2d]
            output["dn_classification2d"] = [p[:, q2:] for p in classification2d]
            output["dn_prediction_alpha2d"] = [
                p[:, q2:] for p in prediction_alpha2d
            ]
            output["dn_slot_targets"] = dn_slot_targets
            output["dn_bundle_first"] = dn
            output["dn_bundle_temp"] = dn_cur
            prediction = [p[:, :num_anchor3d] for p in prediction]
            classification = [
                x[:, :num_anchor3d] if x is not None else None
                for x in classification
            ]
            quality = [
                x[:, :num_anchor3d] if x is not None else None for x in quality
            ]
            prediction2d = [p[:, :q2] for p in prediction2d]
            classification2d = [p[:, :q2] for p in classification2d]
            prediction_alpha2d = [p[:, :q2] for p in prediction_alpha2d]
            dn_instance_feature = instance_feature[:, num_anchor3d:]
            dn_anchor_final = anchor[:, num_anchor3d:]
            instance_feature = instance_feature[:, :num_anchor3d]
            anchor = anchor[:, :num_anchor3d]
            # cache a random subset of DN groups for the next frame
            if c.num_temp_dn_groups > 0 and self.has_rng("sampling"):
                output["dn_state"] = cache_dn(
                    self.make_rng("sampling"),
                    dn_instance_feature,
                    dn_anchor_final,
                    dn_cur,
                    c.num_dn_groups,
                    c.num_temp_dn_groups,
                )

        output.update(
            prediction=prediction,
            classification=classification,
            quality=quality,
            prediction2d=prediction2d,
            classification2d=classification2d,
            prediction_alpha2d=prediction_alpha2d,
            allocations=alloc_list,
        )

        # ========= cache for next frame (simpb_head.py:739-746) =========
        cls_final = classification[-1]
        new_state, temp_confidence = self.bank.cache(
            instance_feature, anchor, cls_final, temporal, temp_mask
        )
        if not train:
            instance_id, new_state = self.bank.assign_instance_ids(
                cls_final,
                new_state,
                temp_confidence,
                threshold=c.score_threshold,
                temp_mask=temp_mask,
            )
            output["instance_id"] = instance_id
        output["temporal_state"] = new_state
        return output

    # ------------------------------------------------------------------
    def _qg_self_attn(
        self, layer, feat2d, anchor_embed2d, alloc, dn2d, deterministic
    ):
        """Per-camera-group 2D self-attention. Real and DN slots form
        separate camera blocks (reference get_self_dn_query_groups,
        denoise.py:177-183), so the layer runs once per block with shared
        parameters."""
        c = self.cfg
        q2 = alloc.num_queries

        def run(query_block, pos_block, valid_block):
            if c.decouple_attn2d:
                query = jnp.concatenate([query_block, pos_block], axis=-1)
                value = self.fc_before2d(query_block)
                identity = None
            else:
                # mmcv residual identity is the pos-free query
                query = query_block + pos_block
                value = query_block
                identity = query_block
            out = layer(
                query, value, valid_block, deterministic=deterministic,
                identity=identity,
            )
            return self.fc_after2d(out) if c.decouple_attn2d else out

        real = run(feat2d[:, :q2], anchor_embed2d[:, :q2], alloc.valid)
        if dn2d is None:
            return real
        dn_out = run(feat2d[:, q2:], anchor_embed2d[:, q2:], dn2d.valid)
        return jnp.concatenate([real, dn_out], axis=1)

    def _qg_cross_attn(
        self, layer, feat2d, anchor_embed2d, alloc, dn2d, col_feats,
        spatial_shapes, deterministic, pair_table=None,
    ):
        """Per-camera MSDA cross-attention. With DN, each camera's real
        and DN slots both sample that camera's features (the reference
        permutes them contiguous, denoise.py:194-228; here the slot
        blocks interleave along the camera fold axis)."""
        c = self.cfg
        q2 = alloc.num_queries
        if dn2d is None:
            return layer(
                feat2d, anchor_embed2d, alloc.anchor2d[..., :2],
                alloc.ref_depth, col_feats, spatial_shapes,
                deterministic=deterministic, pair_table=pair_table,
            )
        bs = feat2d.shape[0]
        k, kd = c.allocation_capacity, c.dn_allocation_capacity
        cams = c.num_cams

        def interleave(real, dn):
            r = real.reshape((bs, cams, k) + real.shape[2:])
            d = dn.reshape((bs, cams, kd) + dn.shape[2:])
            return jnp.concatenate([r, d], axis=2).reshape(
                (bs, cams * (k + kd)) + real.shape[2:]
            )

        merged = layer(
            interleave(feat2d[:, :q2], feat2d[:, q2:]),
            interleave(anchor_embed2d[:, :q2], anchor_embed2d[:, q2:]),
            interleave(alloc.anchor2d[..., :2], dn2d.anchor2d[..., :2]),
            interleave(alloc.ref_depth, dn2d.ref_depth),
            col_feats,
            spatial_shapes,
            deterministic=deterministic,
            pair_table=pair_table,
            # the configured capacity was sized for REAL allocation
            # slots (capacity study covers allocate_queries only); the
            # merged call carries kd extra DN slots per camera, so
            # widen the cap by kd to keep valid-slot compaction exact
            # for the denoising branch too
            capacity_override=(
                c.msda_gather_capacity + kd
                if c.msda_gather_capacity is not None
                else None
            ),
        )
        m = merged.reshape((bs, cams, k + kd) + merged.shape[2:])
        real = m[:, :, :k].reshape((bs, q2) + merged.shape[2:])
        dn_out = m[:, :, k:].reshape((bs, cams * kd) + merged.shape[2:])
        return jnp.concatenate([real, dn_out], axis=1)

    def _aggregate(
        self, i, attn_layer, feat2d, anchor_embed2d, alloc, dn2d,
        temp_attn_instance, anchor_embed, num_anchor3d, attn_mask,
        deterministic,
    ):
        """AdaptiveQueryAggregation (reference aggregation.py:10-101):
        gate 2D queries by a learned alpha, average them back to their 3D
        parents via trans_matrixᵀ, add onto the pre-temporal 3D queries,
        then run the decoupled self-attention."""
        reweight = self.reweight_modules[i]
        q2 = alloc.num_queries
        query2d = feat2d[:, :q2]
        pos2d = anchor_embed2d[:, :q2]
        from2d, pos_from2d = reweight(
            query2d, pos2d, alloc.trans_matrix, alloc.center_matrix
        )
        if dn2d is not None:
            dn_query2d = feat2d[:, q2:]
            dn_pos2d = anchor_embed2d[:, q2:]
            dn_from2d, dn_pos_from2d = reweight(
                dn_query2d, dn_pos2d, dn2d.trans_matrix, dn2d.center_matrix
            )
            from2d = jnp.concatenate([from2d, dn_from2d], axis=1)
            pos_from2d = jnp.concatenate([pos_from2d, dn_pos_from2d], axis=1)

        query3d = temp_attn_instance + from2d
        pos3d = anchor_embed + pos_from2d
        merged = self.graph_model(
            attn_layer,
            query3d,
            value=query3d,
            query_pos=pos3d,
            attn_mask=attn_mask,
            deterministic=deterministic,
        )
        return merged, pos3d
