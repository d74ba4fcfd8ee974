"""Static-K allocation vs a numpy oracle of the reference semantics.

The reference's DynamicQueryAllocation (allocation.py:27-144) builds
ragged per-camera query lists; our static-K redesign must select exactly
the same (anchor, camera) pairs with the same reference points whenever
the valid count fits the capacity.
"""
import jax
import jax.numpy as jnp
import numpy as np

from simpb_tpu.models.allocation import allocate_queries, dispatch_to_2d


def numpy_reference_allocation(anchor, proj, img_w, img_h,
                               limit_anchor_size=(35.0, 35.0, 10.0)):
    """Direct numpy transcription of the reference validity math."""
    bs, a = anchor.shape[:2]
    cams = proj.shape[1]
    # corners (unravel_index ordering) + center
    idx = np.arange(8)
    corners_norm = np.stack(
        [(idx // 4) % 2, (idx // 2) % 2, idx % 2], -1
    ).astype(np.float64) - 0.5
    size = np.minimum(np.exp(anchor[..., 3:6]), limit_anchor_size)
    yaw_cos, yaw_sin = anchor[..., 7], anchor[..., 6]
    rot = np.zeros((bs, a, 3, 3))
    rot[..., 0, 0], rot[..., 0, 1] = yaw_cos, -yaw_sin
    rot[..., 1, 0], rot[..., 1, 1] = yaw_sin, yaw_cos
    rot[..., 2, 2] = 1
    corners = np.einsum("baij,bakj->baki", rot, size[:, :, None] * corners_norm)
    corners = corners + anchor[..., None, :3]
    pts = np.concatenate([corners, anchor[..., None, :3]], -2)  # [bs,a,9,3]
    hom = np.concatenate([pts, np.ones_like(pts[..., :1])], -1)
    p = np.einsum("bnij,bakj->bnaki", proj, hom)  # [bs,cams,a,9,4]
    depth = p[..., 2]
    xy = p[..., :2] / np.maximum(depth[..., None], 1e-5)
    center_xy, center_d = xy[..., 8, :], depth[..., 8]
    corner_xy, corner_d = xy[..., :8, :], depth[..., :8]
    center_valid = (
        (center_xy[..., 0] > 0) & (center_xy[..., 0] < img_w)
        & (center_xy[..., 1] > 0) & (center_xy[..., 1] < img_h)
    )
    corner_valid = (
        (corner_d > 0)
        & (corner_xy[..., 0] > 0) & (corner_xy[..., 0] < img_w)
        & (corner_xy[..., 1] > 0) & (corner_xy[..., 1] < img_h)
    ).any(-1)
    x_min = np.clip(corner_xy[..., 0].min(-1), 0, img_w)
    x_max = np.clip(corner_xy[..., 0].max(-1), 0, img_w)
    y_min = np.clip(corner_xy[..., 1].min(-1), 0, img_h)
    y_max = np.clip(corner_xy[..., 1].max(-1), 0, img_h)
    fallback = np.stack([(x_min + x_max) / 2, (y_min + y_max) / 2], -1)
    ref = np.where(center_valid[..., None], center_xy, fallback)
    return center_valid, corner_valid, ref, np.abs(center_d)


def make_scene(seed=0, bs=1, a=24, cams=4):
    rng = np.random.default_rng(seed)
    anchor = np.zeros((bs, a, 11), np.float32)
    anchor[..., :2] = rng.uniform(-25, 25, (bs, a, 2))
    anchor[..., 2] = rng.uniform(-1, 1, (bs, a))
    anchor[..., 3:6] = rng.uniform(0, 1.2, (bs, a, 3))
    yaw = rng.uniform(-np.pi, np.pi, (bs, a))
    anchor[..., 6], anchor[..., 7] = np.sin(yaw), np.cos(yaw)
    proj = np.zeros((bs, cams, 4, 4), np.float32)
    for c in range(cams):
        th = 2 * np.pi * c / cams
        R = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
             [0, 0, 1]], np.float32)
        K = np.array([[60, 0, 64], [0, 60, 32], [0, 0, 1]], np.float32)
        swap = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = swap @ R
        P = np.eye(4, dtype=np.float32)
        P[:3, :3] = K
        proj[:, c] = P @ ext
    return anchor, proj


def test_allocation_matches_reference_validity_and_refs():
    img_w, img_h = 128, 64
    anchor, proj = make_scene()
    cv, crv, ref, cd = numpy_reference_allocation(
        anchor.astype(np.float64), proj.astype(np.float64), img_w, img_h
    )
    k = 24  # capacity >= all anchors: nothing dropped
    alloc = allocate_queries(
        jnp.asarray(anchor), jnp.asarray(proj), (img_w, img_h), capacity=k
    )
    bs, cams, a = cv.shape[0], cv.shape[1], cv.shape[2]
    valid_ref = cv | crv
    for cam in range(cams):
        sl = slice(cam * k, (cam + 1) * k)
        got_valid = np.asarray(alloc.valid)[0, sl]
        got_parent = np.asarray(alloc.parent_idx)[0, sl]
        got_center = np.asarray(alloc.center_flag)[0, sl]
        got_ref = np.asarray(alloc.anchor2d)[0, sl]
        want_anchors = np.where(valid_ref[0, cam])[0]
        have = got_parent[got_valid]
        assert sorted(have.tolist()) == want_anchors.tolist(), cam
        # center flags and reference points agree per selected anchor
        for slot in np.where(got_valid)[0]:
            anc = got_parent[slot]
            assert got_center[slot] == cv[0, cam, anc]
            np.testing.assert_allclose(
                got_ref[slot] * [img_w, img_h], ref[0, cam, anc],
                rtol=1e-3, atol=1e-2,
            )
        # trans matrix row == one-hot of parent for valid slots
        tm = np.asarray(alloc.trans_matrix)[0, sl]
        assert (tm.sum(-1)[got_valid] == 1).all()
        assert (tm.sum(-1)[~got_valid] == 0).all()


def test_training_corner_cap():
    img_w, img_h = 128, 64
    anchor, proj = make_scene(seed=1, a=40)
    limit = 3
    alloc = allocate_queries(
        jnp.asarray(anchor), jnp.asarray(proj), (img_w, img_h),
        capacity=40, limit_corners=limit, rng=jax.random.PRNGKey(0),
    )
    cv, crv, _, _ = numpy_reference_allocation(
        anchor.astype(np.float64), proj.astype(np.float64), img_w, img_h
    )
    valid = np.asarray(alloc.valid).reshape(4, 40)
    center = np.asarray(alloc.center_flag).reshape(4, 40)
    corner_only = valid & ~center
    # per camera: corner-only slots capped at `limit`
    assert (corner_only.sum(-1) <= limit).all()
    # center-valid anchors always kept
    for cam in range(4):
        assert center[cam].sum() == cv[0, cam].sum()


def test_dispatch_zeroes_invalid_slots():
    anchor, proj = make_scene(seed=2)
    alloc = allocate_queries(
        jnp.asarray(anchor), jnp.asarray(proj), (128, 64), capacity=24
    )
    feat = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 24, 8)).astype(np.float32)
    )
    out = np.asarray(dispatch_to_2d(alloc, feat))
    v = np.asarray(alloc.valid)[0]
    assert (np.abs(out[0][~v]).sum()) == 0
    parents = np.asarray(alloc.parent_idx)[0]
    np.testing.assert_allclose(
        out[0][v], np.asarray(feat)[0][parents[v]], atol=1e-6
    )
