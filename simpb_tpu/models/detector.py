"""SimPB detector: backbone -> FPN -> packed features -> decoder head.

TPU-native equivalent of reference models/simpb.py:26-129. The 6-camera
axis folds into the batch for the conv trunk (simpb.py:63-91), features
pack into the static column layout, and the head threads explicit
temporal state. Outputs are fixed-shape; host-side code formats ragged
results.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs.base import ModelConfig
from ..ops.format import SpatialShapes, pack_feature_maps
from .backbone import (
    FPN, DenseDepthNet, ResNet, fused_fpn_infer, fused_resnet_infer,
)
from .grid_mask import grid_mask
from .head import SimPBHead
from .instance_bank import TemporalState


class SimPB(nn.Module):
    cfg: ModelConfig

    @property
    def dtype(self):
        return jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32

    def setup(self):
        self.backbone = ResNet(
            depth=self.cfg.backbone_depth,
            dtype=self.dtype,
            remat=self.cfg.backbone_remat,
            stem_s2d=self.cfg.stem_s2d,
            name="img_backbone",
        )
        self.neck = FPN(
            out_channels=self.cfg.head.embed_dims,
            num_outs=self.cfg.head.num_levels,
            dtype=self.dtype,
            name="img_neck",
        )
        self.depth_branch = DenseDepthNet(
            num_depth_layers=self.cfg.num_depth_layers, name="depth_branch"
        )
        # the reference pins the head to fp32 under fp16 autocast
        # (simpb.py:93); head_dtype="bfloat16" is a TPU-safe speed option
        head_dtype = (
            jnp.bfloat16
            if self.cfg.head_dtype == "bfloat16"
            else jnp.float32
        )
        self.head = SimPBHead(self.cfg.head, dtype=head_dtype, name="head")

    def extract_feat(
        self, img: jnp.ndarray, train: bool = False, focal=None,
        return_depth: bool = False,
    ):
        """img: [bs, cams, H, W, 3] normalised images."""
        bs, cams = img.shape[:2]
        x = img.reshape((bs * cams,) + img.shape[2:])
        if train and self.cfg.use_grid_mask:
            x = grid_mask(self.make_rng("aug"), x)
        use_fused = (
            not train
            and self.cfg.backbone_fused_infer
            and not self.cfg.stem_s2d
            and not self.is_initializing()
        )
        if use_fused:
            # interpret on CPU (tests) unless the config pins it — an
            # export for TPU traced on a CPU host must pin False (the
            # axon TPU plugin may also report its platform as "axon"
            # rather than "tpu", hence == "cpu" and not != "tpu")
            interp = (
                jax.default_backend() == "cpu"
                if self.cfg.backbone_fused_interpret is None
                else self.cfg.backbone_fused_interpret
            )
            feats = fused_resnet_infer(
                self.backbone.variables,
                x.astype(self.dtype),
                depth=self.cfg.backbone_depth,
                dtype=self.dtype,
                interpret=interp,
            )
            if self.cfg.head.num_levels == len(feats):
                feats = fused_fpn_infer(
                    self.neck.variables, feats, dtype=self.dtype,
                    interpret=interp,
                )
            else:  # extra-conv configs keep the module FPN
                feats = self.neck(feats)
        else:
            feats = self.backbone(x.astype(self.dtype), train=train)
            feats = self.neck(feats)
        feats = [f.reshape((bs, cams) + f.shape[1:]) for f in feats]
        depths = None
        if return_depth:
            depths = self.depth_branch(feats, focal)
        # NHWC -> pack to [bs, cams, ΣHW, C]
        col_feats, spatial_shapes = pack_feature_maps(feats)
        return col_feats, spatial_shapes, depths

    def __call__(
        self,
        img: jnp.ndarray,
        projection_mat: jnp.ndarray,  # [bs, cams, 4, 4]
        temporal: Optional[TemporalState] = None,
        time_interval: Optional[jnp.ndarray] = None,  # [bs]
        temp2cur: Optional[jnp.ndarray] = None,  # [bs, 4, 4]
        focal: Optional[jnp.ndarray] = None,  # [bs, cams]
        dn: Optional[Any] = None,
        dn_state: Optional[Any] = None,
        train: bool = False,
    ) -> Dict[str, Any]:
        col_feats, spatial_shapes, depths = self.extract_feat(
            img, train=train, focal=focal, return_depth=train
        )
        # head params/math run fp32 (reference forces head fp32, simpb.py:93)
        # but the feature column stays in compute dtype (bf16) so the hot
        # sampling gathers move half the bytes; sampled outputs re-enter
        # fp32 before any head matmul.
        outs = self.head(
            col_feats,
            spatial_shapes,
            projection_mat.astype(jnp.float32),
            self.cfg.input_size,
            temporal=temporal,
            time_interval=time_interval,
            temp2cur=temp2cur,
            dn=dn,
            dn_state=dn_state,
            train=train,
        )
        if depths is not None:
            outs["depth_preds"] = depths
        return outs
