"""Hand-built torch replica of the reference SimPB head (eval path).

Composite checkpoint-parity evidence (VERDICT round 1, missing #1 /
next-step #4): torch modules shaped exactly like the reference's
(reference simpb_head.py:323-627 and the blocks it calls), assembled in
`operation_order`, with state_dict keys matching the released
checkpoint layout. `tests/test_torch_composite.py` generates random
torch weights, converts them through `utils/torch_convert.torch_to_flax`
(the same code path a released .pth takes) and asserts the jax head
reproduces the torch forward op-for-op.

Scope: inference (no denoising, no temporal state), batch size 1 (the
reference's ragged per-camera bookkeeping is simplest there), any
number of decoder layers. Sampling ops implement the reference kernels'
documented semantics: mmcv MSDA == per-level zero-pad grid_sample
(mmcv multi_scale_deformable_attn_pytorch algorithm); the DAF CUDA op
drops whole samples outside (0,1) and zeroes out-of-border corners
(ops/src/deformable_aggregation_cuda.cu:129-187).

This file is written from the reference's *behavior*, not copied: mmcv
dependencies are replaced by plain torch, training branches omitted.
"""
import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

X, Y, Z, W, L, H, SIN_YAW, COS_YAW, VX = 0, 1, 2, 3, 4, 5, 6, 7, 8


def linear_relu_ln(embed, in_loops, out_loops, input_dims=None):
    if input_dims is None:
        input_dims = embed
    layers = []
    for _ in range(out_loops):
        for _ in range(in_loops):
            layers.append(nn.Linear(input_dims, embed))
            layers.append(nn.ReLU())
            input_dims = embed
        layers.append(nn.LayerNorm(embed))
    return nn.Sequential(*layers)


class Scale(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.scale = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        return x * self.scale


def inverse_sigmoid(x, eps=1e-5):
    x = x.clamp(0, 1)
    return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))


def pos2posemb2d(pos, num_pos_feats=128, temperature=10000):
    scale = 2 * math.pi
    pos = pos * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (
        2 * torch.div(dim_t, 2, rounding_mode="floor") / num_pos_feats
    )
    pos_x = pos[..., 0, None] / dim_t
    pos_y = pos[..., 1, None] / dim_t
    pos_x = torch.stack(
        (pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()), dim=-1
    ).flatten(-2)
    pos_y = torch.stack(
        (pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()), dim=-1
    ).flatten(-2)
    return torch.cat((pos_y, pos_x), dim=-1)


# --------------------------------------------------------------------
# encoders / refinement (reference detection3d/blocks.py,
# detection2d/blocks.py)
# --------------------------------------------------------------------
class SparseBox3DEncoderT(nn.Module):
    """cat-mode, no output_fc (released decoupled config)."""

    def __init__(self, dims, out_loops=4):
        super().__init__()
        self.pos_fc = linear_relu_ln(dims[0], 1, out_loops, 3)
        self.size_fc = linear_relu_ln(dims[1], 1, out_loops, 3)
        self.yaw_fc = linear_relu_ln(dims[2], 1, out_loops, 2)
        self.vel_fc = linear_relu_ln(dims[3], 1, out_loops, 3)

    def forward(self, box):
        return torch.cat(
            [
                self.pos_fc(box[..., [X, Y, Z]]),
                self.size_fc(box[..., [W, L, H]]),
                self.yaw_fc(box[..., [SIN_YAW, COS_YAW]]),
                self.vel_fc(box[..., VX : VX + 3]),
            ],
            dim=-1,
        )


class SparseBox2DEncoderT(nn.Module):
    def __init__(self, embed):
        super().__init__()
        self.query_embeddings2d = linear_relu_ln(embed, 1, 2, 256)

    def forward(self, box2d):
        return self.query_embeddings2d(pos2posemb2d(box2d[..., :2]))


class SparseBox3DRefinementT(nn.Module):
    def __init__(self, embed, num_cls, output_dim=11):
        super().__init__()
        self.output_dim = output_dim
        self.refine_state = [X, Y, Z, W, L, H, SIN_YAW, COS_YAW]
        self.layers = nn.Sequential(
            *linear_relu_ln(embed, 2, 2),
            nn.Linear(embed, output_dim),
            Scale(output_dim),
        )
        self.cls_layers = nn.Sequential(
            *linear_relu_ln(embed, 1, 2), nn.Linear(embed, num_cls)
        )
        self.quality_layers = nn.Sequential(
            *linear_relu_ln(embed, 1, 2), nn.Linear(embed, 2)
        )

    def forward(self, feat, anchor, anchor_embed, time_interval, return_cls):
        feature = feat + anchor_embed
        out = self.layers(feature)
        out[..., self.refine_state] = (
            out[..., self.refine_state] + anchor[..., self.refine_state]
        )
        translation = torch.transpose(out[..., VX:], 0, -1)
        out[..., VX:] = torch.transpose(
            translation / time_interval, 0, -1
        ) + anchor[..., VX:]
        cls = self.cls_layers(feat) if return_cls else None
        qt = self.quality_layers(feature) if return_cls else None
        return out, cls, qt


class SparseBox2DRefinementT(nn.Module):
    def __init__(self, embed, num_cls):
        super().__init__()
        self.layers = nn.Sequential(
            *linear_relu_ln(embed, 2, 2), nn.Linear(embed, 4), Scale(4)
        )
        self.cls_layers = nn.Sequential(
            *linear_relu_ln(embed, 1, 2), nn.Linear(embed, num_cls)
        )
        self.alpha_layers = nn.Sequential(
            *linear_relu_ln(embed, 1, 2), nn.Linear(embed, 2), Scale(2)
        )

    def forward(self, feat, anchor2d, anchor2d_embed):
        out = self.layers(feat + anchor2d_embed)
        n = anchor2d.shape[-1]
        out[..., :n] = out[..., :n] + inverse_sigmoid(anchor2d)
        return (
            out.sigmoid(),
            self.cls_layers(feat),
            self.alpha_layers(feat),
        )


class KeyPointsGeneratorT(nn.Module):
    FIX_SCALE = (
        (0, 0, 0),
        (0.45, 0, 0),
        (-0.45, 0, 0),
        (0, 0.45, 0),
        (0, -0.45, 0),
        (0, 0, 0.45),
        (0, 0, -0.45),
    )

    def __init__(self, embed, num_learnable_pts=6):
        super().__init__()
        self.num_learnable_pts = num_learnable_pts
        self.learnable_fc = nn.Linear(embed, num_learnable_pts * 3)

    def forward(self, anchor, instance_feature):
        bs, num_anchor = anchor.shape[:2]
        fix = anchor.new_tensor(self.FIX_SCALE)
        size = anchor[..., None, [W, L, H]].exp()
        kp = fix * size
        scale = (
            self.learnable_fc(instance_feature)
            .reshape(bs, num_anchor, self.num_learnable_pts, 3)
            .sigmoid()
            - 0.5
        )
        kp = torch.cat([kp, scale * size], dim=-2)
        rot = anchor.new_zeros(bs, num_anchor, 3, 3)
        rot[:, :, 0, 0] = anchor[:, :, COS_YAW]
        rot[:, :, 0, 1] = -anchor[:, :, SIN_YAW]
        rot[:, :, 1, 0] = anchor[:, :, SIN_YAW]
        rot[:, :, 1, 1] = anchor[:, :, COS_YAW]
        rot[:, :, 2, 2] = 1
        kp = torch.matmul(rot[:, :, None], kp[..., None]).squeeze(-1)
        return kp + anchor[..., None, [X, Y, Z]]


# --------------------------------------------------------------------
# attention ops
# --------------------------------------------------------------------
class MMcvMHAT(nn.Module):
    """mmcv MultiheadAttention wrapper semantics (eval: dropouts off):
    identity + attn(q[+pos], k[+pos], v); value falls back to key
    BEFORE positional terms are added."""

    def __init__(self, embed, heads):
        super().__init__()
        self.attn = nn.MultiheadAttention(embed, heads, batch_first=True)

    def forward(self, query, key=None, value=None, query_pos=None,
                key_pos=None, attn_mask=None):
        if key is None:
            key = query
        if value is None:
            value = key
        identity = query
        if query_pos is not None:
            query = query + query_pos
        if key_pos is not None:
            key = key + key_pos
        out = self.attn(query, key, value, attn_mask=attn_mask)[0]
        return identity + out


class QueryGroupSelfAttnT(nn.Module):
    """QueryGroupMultiheadAttention (group_attn.py:26-133): one MHA over
    the full ragged 2D query list with a block-diagonal -inf mask."""

    def __init__(self, embed, heads):
        super().__init__()
        self.attn = nn.MultiheadAttention(embed, heads, batch_first=True)

    def forward(self, query, value, query_groups):
        n = query.shape[1]
        mask = query.new_full((n, n), float("-inf"))
        for qs, qe in query_groups:
            mask[qs:qe, qs:qe] = 0.0
        out = self.attn(query, query, value, attn_mask=mask)[0]
        out = torch.nan_to_num(out)
        return query + out


def msda_torch(value, shapes, locs, attw):
    """mmcv multi_scale_deformable_attn_pytorch algorithm: per-level
    zero-pad grid_sample, weighted sum.

    value: [B, HW, heads, hd]; locs: [B, Q, heads, L, P, 2] in (0,1);
    attw: [B, Q, heads, L, P]. Returns [B, Q, heads*hd].
    """
    b, _, heads, hd = value.shape
    q = locs.shape[1]
    splits = [h * w for h, w in shapes]
    vals = value.split(splits, dim=1)
    out = 0.0
    for lvl, (hh, ww) in enumerate(shapes):
        v = (
            vals[lvl]
            .flatten(2)
            .transpose(1, 2)
            .reshape(b * heads, hd, hh, ww)
        )
        grid = 2 * locs[:, :, :, lvl] - 1  # [B, Q, heads, P, 2]
        grid = grid.permute(0, 2, 1, 3, 4).flatten(0, 1)  # [B*heads,Q,P,2]
        samp = F.grid_sample(
            v, grid, mode="bilinear", padding_mode="zeros",
            align_corners=False,
        )  # [B*heads, hd, Q, P]
        w = attw[:, :, :, lvl].permute(0, 2, 1, 3).flatten(0, 1)
        out = out + (samp * w[:, None]).sum(-1)  # [B*heads, hd, Q]
    return out.reshape(b, heads * hd, q).transpose(1, 2).contiguous()


class QueryGroupMSDAT(nn.Module):
    """QueryGroupMultiScaleDeformableAttention (group_attn.py:136-256),
    residual_mode='cat', per-camera ragged groups."""

    def __init__(self, embed, heads, num_levels, num_points, num_cams):
        super().__init__()
        self.embed = embed
        self.heads = heads
        self.num_levels = num_levels
        self.num_points = num_points
        self.num_cams = num_cams
        self.value_proj = nn.Linear(embed, embed)
        self.output_proj = nn.Linear(embed, embed)
        self.sampling_offsets = nn.Linear(
            embed, heads * num_levels * num_points * 2
        )
        self.attention_weights = nn.Linear(
            embed, heads * num_levels * num_points
        )

    def forward(self, query, query_pos, reference_points, ref_depth,
                value, shapes, query_groups):
        # value: [bs*cams, HW, C]; query: [bs, N2d, C]
        identity = query
        query = query + query_pos
        bs, n = query.shape[:2]
        v = self.value_proj(value)
        v = v.view(bs, self.num_cams, -1, self.heads, self.embed // self.heads)
        offsets = self.sampling_offsets(query).view(
            bs, n, self.heads, self.num_levels, self.num_points, 2
        )
        attw = (
            self.attention_weights(query)
            .view(bs, n, self.heads, self.num_levels * self.num_points)
            .softmax(-1)
            .view(bs, n, self.heads, self.num_levels, self.num_points)
        )
        normalizer = query.new_tensor([[w_, h_] for h_, w_ in shapes])
        locs = (
            reference_points[:, :, None, None, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )
        xs, ys, _ = torch.where(ref_depth == 0)
        locs[xs, ys] = 0
        outs = []
        for i, (qs, qe) in enumerate(query_groups):
            if qe - qs > 0:
                outs.append(
                    msda_torch(v[:, i], shapes, locs[:, qs:qe], attw[:, qs:qe])
                )
        out = self.output_proj(torch.cat(outs, dim=1))
        return torch.cat([out, identity], dim=-1)


class ReWeightT(nn.Module):
    def __init__(self, embed):
        super().__init__()
        self.reduce = nn.Sequential(nn.Linear(embed + 1, embed), nn.ReLU())
        self.alpha = nn.Sequential(nn.Linear(embed, 1), nn.Sigmoid())

    def forward(self, query, query_pos, parameter, trans_matrix):
        alpha = self.alpha(self.reduce(parameter))
        rm = (trans_matrix * alpha).permute(0, 2, 1)
        div = torch.clamp(rm.sum(-1).unsqueeze(-1), 1e-5)
        return (
            torch.matmul(rm, query) / div,
            torch.matmul(rm, query_pos) / div,
        )


class DFAT(nn.Module):
    """DeformableFeatureAggregation (blocks.py:45-261) with camera embed
    and the CUDA DAF sampling semantics (whole-sample drop outside (0,1),
    border-zero corners — deformable_aggregation_cuda.cu:129-187)."""

    def __init__(self, embed, groups, num_levels, num_cams):
        super().__init__()
        self.embed = embed
        self.groups = groups
        self.num_levels = num_levels
        self.num_cams = num_cams
        self.kps_generator = KeyPointsGeneratorT(embed)
        self.num_pts = 13
        self.camera_encoder = linear_relu_ln(embed, 1, 2, 12)
        self.weights_fc = nn.Linear(
            embed, groups * num_levels * self.num_pts
        )
        self.output_proj = nn.Linear(embed, embed)

    @staticmethod
    def _bilinear_drop(feat, hh, ww, loc):
        """CUDA DAF semantics: feat [B, HW, C], loc [B, N, 2] in (0,1)."""
        b, _, c = feat.shape
        x = loc[..., 0] * ww - 0.5
        y = loc[..., 1] * hh - 0.5
        x0 = torch.floor(x).long()
        y0 = torch.floor(y).long()
        lx = (x - x0.float())
        ly = (y - y0.float())
        in_range = (
            (loc[..., 0] > 0) & (loc[..., 0] < 1)
            & (loc[..., 1] > 0) & (loc[..., 1] < 1)
        ).float()
        wx0 = (1 - lx) * ((x0 >= 0) & (x0 < ww)).float()
        wx1 = lx * ((x0 + 1 >= 0) & (x0 + 1 < ww)).float()
        wy0 = (1 - ly) * ((y0 >= 0) & (y0 < hh)).float() * in_range
        wy1 = ly * ((y0 + 1 >= 0) & (y0 + 1 < hh)).float() * in_range
        xc0 = x0.clamp(0, ww - 1)
        xc1 = (x0 + 1).clamp(0, ww - 1)
        yc0 = y0.clamp(0, hh - 1)
        yc1 = (y0 + 1).clamp(0, hh - 1)
        flat = feat  # [B, HW, C]
        g = lambda yy, xx: torch.gather(
            flat, 1, (yy * ww + xx).unsqueeze(-1).expand(-1, -1, c)
        )
        return (
            wy0.unsqueeze(-1) * (
                wx0.unsqueeze(-1) * g(yc0, xc0)
                + wx1.unsqueeze(-1) * g(yc0, xc1)
            )
            + wy1.unsqueeze(-1) * (
                wx0.unsqueeze(-1) * g(yc1, xc0)
                + wx1.unsqueeze(-1) * g(yc1, xc1)
            )
        )

    def forward(self, feat, anchor, anchor_embed, col_feats, shapes,
                projection_mat, image_wh):
        bs, num_anchor = feat.shape[:2]
        kp = self.kps_generator(anchor, feat)  # [bs, A, P, 3]
        feature = feat + anchor_embed
        cam_embed = self.camera_encoder(
            projection_mat[:, :, :3].reshape(bs, self.num_cams, 12)
        )
        feature = feature[:, :, None] + cam_embed[:, None]
        weights = (
            self.weights_fc(feature)
            .reshape(bs, num_anchor, -1, self.groups)
            .softmax(dim=-2)
            .reshape(
                bs, num_anchor, self.num_cams, self.num_levels,
                self.num_pts, self.groups,
            )
        )
        # project
        pts = torch.cat([kp, torch.ones_like(kp[..., :1])], dim=-1)
        p2d = torch.matmul(
            projection_mat[:, :, None, None], pts[:, None, ..., None]
        ).squeeze(-1)
        p2d = p2d[..., :2] / torch.clamp(p2d[..., 2:3], min=1e-5)
        p2d = p2d / image_wh[:, :, None, None]  # [bs, cams, A, P, 2]

        splits = [h_ * w_ for h_, w_ in shapes]
        group_dims = self.embed // self.groups
        out = feat.new_zeros(bs, num_anchor, self.embed)
        for cam in range(self.num_cams):
            loc = p2d[:, cam].reshape(bs, num_anchor * self.num_pts, 2)
            levels = col_feats[:, cam].split(splits, dim=1)
            for lvl, (hh, ww) in enumerate(shapes):
                samp = self._bilinear_drop(levels[lvl], hh, ww, loc)
                samp = samp.reshape(
                    bs, num_anchor, self.num_pts, self.groups, group_dims
                )
                w = weights[:, :, cam, lvl].permute(0, 1, 3, 2)[..., None]
                # w: [bs, A, P, G] -> [bs, A, G, P, 1]? keep explicit:
                w = weights[:, :, cam, lvl][..., None]  # [bs,A,P,G,1]
                out = out + (samp * w).sum(2).reshape(
                    bs, num_anchor, self.embed
                )
        return torch.cat([self.output_proj(out), feat], dim=-1)


class AsymmetricFFNT(nn.Module):
    def __init__(self, embed):
        super().__init__()
        self.pre_norm = nn.LayerNorm(2 * embed)
        self.fc1 = nn.Linear(2 * embed, 4 * embed)
        self.fc2 = nn.Linear(4 * embed, embed)
        self.identity_fc = nn.Linear(2 * embed, embed)

    def forward(self, x):
        xn = self.pre_norm(x)
        return self.identity_fc(xn) + self.fc2(torch.relu(self.fc1(xn)))


# --------------------------------------------------------------------
# allocation (reference allocation.py:27-144, eval path, bs=1)
# --------------------------------------------------------------------
def allocate_torch(anchor3d, projection_mat, image_wh,
                   limit_anchor_size=(35.0, 35.0, 10.0)):
    """Returns (ref_pts2d [1,N,2], ref_depth2d [1,N,1], trans_matrix
    [1,N,A], center_matrix, query_groups [(qs,qe)...])."""
    bs, num_anchor = anchor3d.shape[:2]
    assert bs == 1
    num_cams = projection_mat.shape[1]
    img_w, img_h = image_wh

    rot = anchor3d.new_zeros(bs, num_anchor, 3, 3)
    rot[:, :, 0, 0] = anchor3d[:, :, COS_YAW]
    rot[:, :, 0, 1] = -anchor3d[:, :, SIN_YAW]
    rot[:, :, 1, 0] = anchor3d[:, :, SIN_YAW]
    rot[:, :, 1, 1] = anchor3d[:, :, COS_YAW]
    rot[:, :, 2, 2] = 1
    corners_norm = anchor3d.new_tensor(
        np.stack(np.unravel_index(np.arange(8), [2] * 3), axis=1)
    ) - anchor3d.new_tensor([0.5, 0.5, 0.5])
    size = anchor3d[..., [W, L, H]].exp().clamp(
        max=anchor3d.new_tensor(limit_anchor_size).view(1, 1, -1)
    )
    corners = size[:, :, None, :] * corners_norm[None, None]
    corners = torch.matmul(rot[:, :, None], corners[..., None]).squeeze(-1)
    corners = corners + anchor3d[..., None, [X, Y, Z]]
    pts = torch.cat([corners, anchor3d[..., None, [X, Y, Z]]], dim=-2)

    hom = torch.cat([pts, torch.ones_like(pts[..., :1])], -1)
    # [bs, A, cams, 9, 4]
    proj = torch.matmul(
        projection_mat[:, None, :, None], hom[:, :, None, ..., None]
    ).squeeze(-1)
    depth = proj[..., 2:3]
    xy = proj[..., :2] / depth.clamp(1e-5)
    center_xy = xy[..., 8, :]
    center_depth = depth[..., 8, :]
    corner_xy = xy[..., :8, :]
    corner_depth = depth[..., :8, 0]

    center_valid = (
        (0 < center_xy[..., 0]) & (center_xy[..., 0] < img_w)
        & (0 < center_xy[..., 1]) & (center_xy[..., 1] < img_h)
    )  # [bs, A, cams]
    corner_in = (
        (corner_depth > 0)
        & (0 < corner_xy[..., 0]) & (corner_xy[..., 0] < img_w)
        & (0 < corner_xy[..., 1]) & (corner_xy[..., 1] < img_h)
    )
    corner_valid = corner_in.any(-1)

    x_min = corner_xy[..., 0].min(-1).values.clamp(0, img_w)
    x_max = corner_xy[..., 0].max(-1).values.clamp(0, img_w)
    y_min = corner_xy[..., 1].min(-1).values.clamp(0, img_h)
    y_max = corner_xy[..., 1].max(-1).values.clamp(0, img_h)
    select = torch.stack([(x_min + x_max) / 2, (y_min + y_max) / 2], -1)
    select[center_valid] = center_xy[center_valid]

    trans_mask = center_valid | corner_valid  # [1, A, cams]
    counts = trans_mask[0].sum(0)  # per cam
    starts = torch.cat([counts.new_zeros(1), counts.cumsum(0)])
    query_groups = [
        (int(starts[i]), int(starts[i + 1])) for i in range(num_cams)
    ]
    n2d = int(counts.sum())

    ref_pts = anchor3d.new_zeros(1, n2d, 2)
    ref_depth = anchor3d.new_zeros(1, n2d, 1)
    trans_matrix = anchor3d.new_zeros(1, n2d, num_anchor)
    center_matrix = anchor3d.new_zeros(1, n2d, num_anchor)
    for cam in range(num_cams):
        ids = torch.nonzero(trans_mask[0, :, cam])[:, 0]
        qs = query_groups[cam][0]
        for j, a in enumerate(ids.tolist()):
            ref_pts[0, qs + j] = select[0, a, cam]
            ref_depth[0, qs + j] = center_depth[0, a, cam].abs()
            trans_matrix[0, qs + j, a] = 1.0
            if center_valid[0, a, cam]:
                center_matrix[0, qs + j, a] = 1.0
    ref_pts = ref_pts / ref_pts.new_tensor([img_w, img_h])
    return ref_pts, ref_depth, trans_matrix, center_matrix, query_groups


# --------------------------------------------------------------------
# the assembled head
# --------------------------------------------------------------------
class HeadReplicaT(nn.Module):
    """Reference SimPBHead forward (eval, no DN/temporal), bs=1."""

    def __init__(self, embed, heads, num_anchor, num_cls, num_levels,
                 num_cams, operation_order):
        super().__init__()
        self.embed = embed
        self.num_anchor = num_anchor
        self.num_cams = num_cams
        self.operation_order = operation_order
        self.anchor = nn.Parameter(torch.zeros(num_anchor, 11))
        self.instance_feature = nn.Parameter(torch.zeros(num_anchor, embed))
        self.anchor_encoder = SparseBox3DEncoderT(
            (embed // 2, embed // 8, embed // 8, embed // 4)
        )
        self.anchor_encoder2d = SparseBox2DEncoderT(embed)
        self.fc_before = nn.Linear(embed, 2 * embed, bias=False)
        self.fc_after = nn.Linear(2 * embed, embed, bias=False)
        self.fc_before2d = nn.Linear(embed, 2 * embed, bias=False)
        self.fc_after2d = nn.Linear(2 * embed, embed, bias=False)
        layers = []
        self.reweights = nn.ModuleDict()
        for i, op in enumerate(operation_order):
            if op == "ffn":
                layers.append(AsymmetricFFNT(embed))
            elif op == "norm":
                layers.append(nn.LayerNorm(embed))
            elif op in ("gnn", "temp_gnn", "aggregation"):
                layers.append(MMcvMHAT(2 * embed, heads))
                if op == "aggregation":
                    self.reweights[str(i)] = ReWeightT(embed)
            elif op == "qg_self_attn":
                layers.append(QueryGroupSelfAttnT(2 * embed, heads))
            elif op == "qg_cross_attn":
                layers.append(QueryGroupMSDAT(embed, heads, num_levels, 4,
                                              num_cams))
            elif op == "deformable":
                layers.append(DFAT(embed, heads, num_levels, num_cams))
            elif op == "refine3d":
                layers.append(SparseBox3DRefinementT(embed, num_cls))
            elif op == "refine2d":
                layers.append(SparseBox2DRefinementT(embed, num_cls))
            elif op == "allocation":
                layers.append(nn.Identity())
            else:
                raise NotImplementedError(op)
        self.layers = nn.ModuleList(layers)

    def graph_model(self, layer, query, key=None, value=None,
                    query_pos=None, key_pos=None, attn_mask=None):
        query = torch.cat([query, query_pos], dim=-1)
        if key is not None:
            key = torch.cat([key, key_pos], dim=-1)
        value = self.fc_before(value) if value is not None else None
        return self.fc_after(
            layer(query, key, value, attn_mask=attn_mask)
        )

    @torch.no_grad()
    def forward(self, col_feats, shapes, projection_mat, image_wh,
                time_interval=0.5):
        bs = col_feats.shape[0]
        assert bs == 1
        feat = self.instance_feature[None].repeat(bs, 1, 1)
        anchor = self.anchor[None].repeat(bs, 1, 1)
        anchor_embed = self.anchor_encoder(anchor)
        dt = torch.full((bs,), time_interval)
        image_wh_t = anchor.new_tensor(image_wh)[None, None].repeat(
            bs, self.num_cams, 1
        )
        value_flat = col_feats.flatten(0, 1)  # [bs*cams, HW, C]

        prediction, classification, quality = [], [], []
        prediction2d, classification2d, alpha2d_list = [], [], []
        groups_list = []
        temp_attn_instance = feat
        anchor2d = anchor_embed2d = None
        trans_matrix = center_matrix = query_groups = None
        ref_depth = None
        status2d = False

        for i, op in enumerate(self.operation_order):
            layer = self.layers[i]
            if op in ("norm", "ffn"):
                feat = layer(feat)
            elif op == "allocation":
                (ref_pts, ref_depth, trans_matrix, center_matrix,
                 query_groups) = allocate_torch(
                    anchor, projection_mat, image_wh
                )
                feat2d = torch.matmul(trans_matrix, feat)
                anchor2d = ref_pts
                anchor_embed2d = self.anchor_encoder2d(anchor2d)
                feat3d_stash = feat
                feat = feat2d
                status2d = True
            elif op == "qg_self_attn":
                q = torch.cat([feat, anchor_embed2d], dim=-1)
                v = self.fc_before2d(feat)
                feat = self.fc_after2d(layer(q, v, query_groups))
            elif op == "qg_cross_attn":
                feat = layer(
                    feat, anchor_embed2d, anchor2d[..., :2], ref_depth,
                    value_flat, shapes, query_groups,
                )
            elif op == "refine2d":
                box2d, cls2d, a2d = layer(feat, anchor2d, anchor_embed2d)
                prediction2d.append(box2d)
                classification2d.append(cls2d)
                alpha2d_list.append(a2d)
                groups_list.append(query_groups)
                anchor2d = box2d
            elif op == "aggregation":
                rw = self.reweights[str(i)]
                param = torch.cat(
                    [feat, center_matrix.sum(-1).unsqueeze(-1)], dim=-1
                )
                from2d, pos_from2d = rw(
                    feat, anchor_embed2d, param, trans_matrix
                )
                query3d = temp_attn_instance + from2d
                pos3d = anchor_embed + pos_from2d
                feat = self.graph_model(
                    layer, query3d, value=query3d, query_pos=pos3d
                )
                anchor_embed = pos3d
                status2d = False
            elif op == "gnn":
                feat = self.graph_model(
                    layer, feat, value=feat, query_pos=anchor_embed
                )
            elif op == "temp_gnn":
                # no temporal state: key/value None -> value falls back
                # to the decoupled concat inside the mmcv wrapper
                feat = self.graph_model(
                    layer, feat, key=None, value=None,
                    query_pos=anchor_embed,
                )
                temp_attn_instance = feat
            elif op == "deformable":
                feat = layer(
                    feat, anchor, anchor_embed, col_feats, shapes,
                    projection_mat, image_wh_t,
                )
            elif op == "refine3d":
                anchor, cls, qt = layer(
                    feat, anchor, anchor_embed, dt,
                    return_cls=True,
                )
                prediction.append(anchor)
                classification.append(cls)
                quality.append(qt)
                if i != len(self.operation_order) - 1:
                    anchor_embed = self.anchor_encoder(anchor)
        return {
            "prediction": prediction,
            "classification": classification,
            "quality": quality,
            "prediction2d": prediction2d,
            "classification2d": classification2d,
            "prediction_alpha2d": alpha2d_list,
            "query_groups": groups_list,
        }


# --------------------------------------------------------------------
# state_dict with released-checkpoint key layout
# --------------------------------------------------------------------
def build_state_dict(rep: HeadReplicaT):
    """Reference checkpoint key layout (see utils/torch_convert.py
    build_mapping) from the replica's modules."""
    sd = {}

    def put(prefix, module):
        for k, v in module.state_dict().items():
            sd[f"{prefix}.{k}"] = v.detach().numpy()

    sd["head.instance_bank.anchor"] = rep.anchor.detach().numpy()
    sd["head.instance_bank.instance_feature"] = (
        rep.instance_feature.detach().numpy()
    )
    for name in ("fc_before", "fc_after", "fc_before2d", "fc_after2d"):
        put(f"head.{name}", getattr(rep, name))
    for comp in ("pos_fc", "size_fc", "yaw_fc", "vel_fc"):
        put(f"head.anchor_encoder.{comp}",
            getattr(rep.anchor_encoder, comp))
    put("head.anchor_encoder2d.query_embeddings2d",
        rep.anchor_encoder2d.query_embeddings2d)
    for i, op in enumerate(rep.operation_order):
        t = f"head.layers.{i}"
        layer = rep.layers[i]
        if op == "norm":
            put(t, layer)
        elif op == "ffn":
            put(f"{t}.pre_norm", layer.pre_norm)
            put(f"{t}.layers.0.0", layer.fc1)
            put(f"{t}.layers.1", layer.fc2)
            put(f"{t}.identity_fc", layer.identity_fc)
        elif op in ("gnn", "temp_gnn"):
            put(f"{t}.attn", layer.attn)
        elif op == "qg_self_attn":
            put(f"{t}.attn", layer.attn)
        elif op == "qg_cross_attn":
            for lin in ("sampling_offsets", "attention_weights",
                        "value_proj", "output_proj"):
                put(f"{t}.{lin}", getattr(layer, lin))
        elif op == "deformable":
            put(f"{t}.camera_encoder", layer.camera_encoder)
            put(f"{t}.weights_fc", layer.weights_fc)
            put(f"{t}.output_proj", layer.output_proj)
            put(f"{t}.kps_generator.learnable_fc",
                layer.kps_generator.learnable_fc)
        elif op == "refine3d":
            put(f"{t}.layers", layer.layers)
            put(f"{t}.cls_layers", layer.cls_layers)
            put(f"{t}.quality_layers", layer.quality_layers)
        elif op == "refine2d":
            put(f"{t}.layers", layer.layers)
            put(f"{t}.cls_layers", layer.cls_layers)
            put(f"{t}.alpha_layers", layer.alpha_layers)
        elif op == "aggregation":
            put(f"{t}.self_attn.attn", layer.attn)
            rw = rep.reweights[str(i)]
            put(f"{t}.reweight.reduce.0", rw.reduce[0])
            put(f"{t}.reweight.alpha.0", rw.alpha[0])
    return sd
