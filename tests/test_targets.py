"""Target assignment and DN bundle tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpb_tpu.core import box3d
from simpb_tpu.data.postprocess import associate_2d
from simpb_tpu.training.targets3d import (
    DN_NEG_LABEL,
    TargetConfig,
    get_dn_anchors,
    sample_targets3d,
)


def make_gt(rng, bs=2, g=6):
    boxes = np.zeros((bs, g, 9), np.float32)
    boxes[..., :2] = rng.uniform(-30, 30, (bs, g, 2))
    boxes[..., 2] = 0.5
    boxes[..., 3:6] = rng.uniform(1, 4, (bs, g, 3))
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (bs, g))
    labels = rng.integers(0, 10, (bs, g)).astype(np.int32)
    valid = np.ones((bs, g), bool)
    valid[:, -1] = False
    return jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid)


def test_sample_targets_assigns_perfect_predictions():
    """Predictions placed exactly on (encoded) GT with confident logits
    must match one-to-one."""
    rng = np.random.default_rng(0)
    boxes, labels, valid = make_gt(rng)
    bs, g = labels.shape
    n, c = 20, 10
    enc = box3d.encode_box(boxes, vel_dims=2)
    box_pred = jnp.asarray(rng.normal(size=(bs, n, 10)).astype(np.float32)) * 5
    box_pred = box_pred.at[:, :g].set(enc)
    cls_pred = jnp.full((bs, n, c), -10.0)
    one_hot = jax.nn.one_hot(labels, c) * 20 - 10
    cls_pred = cls_pred.at[:, :g].set(one_hot)

    cls_t, box_t, w = sample_targets3d(
        cls_pred, box_pred, boxes, labels, valid
    )
    cls_t = np.asarray(cls_t)
    for b in range(bs):
        for j in range(g - 1):  # last GT invalid
            assert cls_t[b, j] == int(labels[b, j]), (b, j, cls_t[b])
    # unmatched slots are background (num_cls)
    assert (cls_t == c).sum() == bs * (n - (g - 1))
    # reg weights nonzero only on matched slots
    w = np.asarray(w)
    assert (w.sum(-1) > 0).sum() == bs * (g - 1)


def test_dn_bundle_shapes_and_semantics():
    rng = np.random.default_rng(1)
    boxes, labels, valid = make_gt(rng, bs=2, g=6)
    valid = valid.at[:, 3:].set(False)  # only 3 real GT < max_dn_gt=4
    bundle = get_dn_anchors(
        jax.random.PRNGKey(0),
        boxes, labels, valid,
        gt_instance_id=jnp.arange(12).reshape(2, 6),
        num_dn_groups=3,
        max_dn_gt=4,
        add_neg_dn=True,
        num_cams=6,
    )
    num_per = 8  # 2 * max_dn_gt
    num_dn = 3 * num_per
    assert bundle.dn_anchor.shape == (2, num_dn, 11)
    assert bundle.box_target.shape == (2, num_dn, 10)
    assert bundle.attn_mask.shape == (num_dn, num_dn)
    am = np.asarray(bundle.attn_mask)
    # block-diagonal: within-group visible, across-group blocked
    assert not am[0, num_per - 1]
    assert am[0, num_per]
    cls_t = np.asarray(bundle.cls_target)
    # positives carry real labels; negatives carry DN_NEG_LABEL
    assert (cls_t >= 0).any()
    assert (cls_t == DN_NEG_LABEL).any()
    # valid excludes padded GT slots
    vm = np.asarray(bundle.valid_mask)
    assert vm.sum() > 0
    assert vm.sum() < vm.size
    # matched anchors stay within the xyz noise envelope (pos <= 2,
    # neg <= 4; the Hungarian may occasionally match a neg-noised anchor)
    anch = np.asarray(bundle.dn_anchor)[:, :, :3]
    tgt = np.asarray(bundle.box_target)[:, :, :3]
    pos = np.asarray(bundle.cls_target) >= 0
    assert np.abs(anch[pos] - tgt[pos]).max() <= 4.0 + 1e-5


def test_associate_2d_selects_children_of_kept_3d():
    dec3d = {"anchor_idx": np.array([[5, 7]])}
    q2 = 8
    cls2d = np.zeros((q2, 3), np.float32)
    box2d = np.tile(
        np.array([[0.5, 0.5, 0.2, 0.2]], np.float32), (q2, 1)
    )
    parent = np.array([1, 5, 7, 7, 2, 5, 3, 0])
    valid = np.array([1, 1, 1, 0, 1, 1, 1, 1], bool)
    aug = {"crop": (0, 0, 100, 50), "resize": 1.0}
    out = associate_2d(dec3d, cls2d, box2d, parent, valid, 4, aug)
    # slots with parent in {5,7} and valid: indices 1, 2, 5
    assert sorted(out["parent_3d"].tolist()) == [5, 5, 7]
    assert out["boxes_2d"].shape == (3, 4)
    assert out["camidx_2d"].tolist() == [0, 0, 1]


def test_trans_cost3d_matches_reference_oracle():
    """trans_cost3d vs a numpy oracle of the reference's ragged
    computation (detection2d/coster.py:63-109)."""
    import numpy as np
    import jax.numpy as jnp
    from simpb_tpu.training.targets2d import trans_cost3d

    rng = np.random.default_rng(0)
    bs, cams, K, G2, A3, G3 = 2, 3, 4, 3, 6, 5

    cost2d = rng.normal(size=(bs, cams, K, G2)).astype(np.float32)
    slot_valid = rng.uniform(size=(bs, cams * K)) > 0.3
    gt_valid = rng.uniform(size=(bs, cams, G2)) > 0.3
    gt_map = rng.integers(0, G3, size=(bs, cams, G2))
    # trans incidence: valid slots point at a random 3D anchor
    tm = np.zeros((bs, cams * K, A3), np.float32)
    owner = rng.integers(0, A3, size=(bs, cams * K))
    tm[np.arange(bs)[:, None], np.arange(cams * K)[None], owner] = 1.0
    tm *= slot_valid[..., None]

    got = np.asarray(trans_cost3d(
        jnp.asarray(cost2d), jnp.asarray(slot_valid),
        jnp.asarray(gt_valid), jnp.asarray(gt_map), jnp.asarray(tm), G3,
    ))

    # ---- oracle: reference ragged math per sample ----
    for i in range(bs):
        vq = slot_valid[i].reshape(cams, K)
        # global max over valid (query, target) same-camera entries
        vals = [cost2d[i, c][vq[c]][:, gt_valid[i, c]] for c in range(cams)]
        flat = np.concatenate([v.reshape(-1) for v in vals]) if any(
            v.size for v in vals) else np.zeros(1)
        big = flat.max() if flat.size else 0.0

        # assembled [Q2, T2] with max fill (static slot layout)
        T2 = cams * G2
        ext = np.full((cams * K, T2), big, np.float32)
        for c in range(cams):
            for q in range(K):
                for t in range(G2):
                    if vq[c, q] and gt_valid[i, c, t]:
                        ext[c * K + q, c * G2 + t] = cost2d[i, c, q, t]

        map_m = np.zeros((T2, G3), np.float32)
        for c in range(cams):
            for t in range(G2):
                if gt_valid[i, c, t]:
                    map_m[c * G2 + t, gt_map[i, c, t]] = 1.0

        m1 = (ext @ map_m) / np.clip(map_m.sum(0), 1e-5, None)[None]
        tmt = tm[i].T  # [A3, Q2]
        m2 = (tmt @ m1) / np.clip(tmt.sum(-1), 1e-5, None)[:, None]
        mask = (m2.sum(0) == 0)[None, :] | (m2.sum(1) == 0)[:, None]
        m2[mask] = m2.max()
        np.testing.assert_allclose(got[i], m2, rtol=1e-5, atol=1e-5)
