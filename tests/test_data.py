"""Data pipeline unit tests on synthetic fixtures (no nuScenes on disk)."""
import pickle

import numpy as np
import pytest

from simpb_tpu.data import transforms as T
from simpb_tpu.data.dataset import NuScenesDataset, pad_sample
from simpb_tpu.data.sampler import GroupStreamSampler, sequence_eval_shards


def test_img_transform_matrix_matches_points():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (100, 200, 3)).astype(np.float32)
    aug = {
        "resize": 0.5,
        "crop": (10, 5, 90, 45),
        "flip": True,
        "rotate": 0,
        "final_dim": (40, 80),
    }
    out, mat = T.img_transform(img, aug)
    assert out.shape == (40, 80, 3)
    # a source pixel at (x, y) should land where the matrix says
    x, y = 100.0, 60.0
    p = mat @ np.array([x, y, 1.0, 1.0])
    # manual: resize -> (50, 30); crop -> (40, 25); flip -> (80-40, 25)
    np.testing.assert_allclose(p[:2], [40.0, 25.0], atol=1e-6)


def test_transform_boxes2d_flip_and_clip():
    aug = {"resize": 0.5, "crop": (0, 0, 80, 40), "flip": True,
           "final_dim": (40, 80)}
    boxes = np.array([[20.0, 10.0, 60.0, 30.0]], np.float32)
    centers = np.array([[40.0, 20.0]], np.float32)
    alphas = np.array([0.5], np.float32)
    b, c, a, keep = T.transform_boxes2d(boxes, centers, alphas, aug)
    # resize: (10,5,30,15); flip: x -> 80 - x
    np.testing.assert_allclose(b[0], [50.0, 5.0, 70.0, 15.0], atol=1e-5)
    np.testing.assert_allclose(c[0], [60.0, 10.0], atol=1e-5)
    # flip alpha: positive -> -a + pi
    np.testing.assert_allclose(a[0], -0.5 + np.pi, atol=1e-6)
    assert keep[0]


def test_filter_occluded_keeps_front_box():
    # two identical boxes, nearer one occludes the farther
    boxes = np.array(
        [[10.0, 10.0, 30.0, 30.0], [10.0, 10.0, 30.0, 30.0]], np.float32
    )
    depths = np.array([5.0, 20.0])
    kept = T.filter_occluded(boxes, depths, 64, 64)
    assert 0 in kept.tolist()  # near box visible
    assert len(kept) <= 2


def test_depth_maps_from_points():
    pts = np.array([[0.0, 0.0, 10.0, 0, 0]], np.float32)
    l2i = np.eye(4)
    l2i[0, 2] = 32  # principal point
    l2i[1, 2] = 16
    maps = T.depth_maps_from_points(pts[:, :5], [l2i], (32, 64), [4, 8])
    assert maps[0].shape == (1, 8, 16)
    # point at z=10 projects to pixel (32, 16) -> stride-4 cell (8, 4)
    assert maps[0][0, 4, 8] == pytest.approx(10.0)


def test_scale_3d_projection_invariance():
    """Scaling world coords while right-multiplying lidar2img by S^-1
    must keep each GT center's projected pixel fixed (reference
    BBoxScale, pipelines/augment.py:277-306)."""
    rng = np.random.default_rng(1)
    l2i = np.eye(4)
    l2i[0, 0] = l2i[1, 1] = 500.0
    l2i[0, 2], l2i[1, 2] = 352.0, 128.0
    boxes = rng.uniform(-1, 1, (4, 9)).astype(np.float64)
    boxes[:, 2] = rng.uniform(5, 20, 4)  # in front of the camera
    sample = {
        "lidar2img": [l2i.copy()],
        "extrinsics": [np.eye(4)],
        "lidar2global": np.eye(4),
        "gt_bboxes_3d": boxes.copy(),
    }

    def project(m, xyz):
        p = m @ np.append(xyz, 1.0)
        return p[:2] / p[2]

    before = [project(l2i, b[:3]) for b in boxes]
    out = T.scale_3d(sample, 1.3)
    yaw_before = boxes[:, 6].copy()
    for i, b in enumerate(out["gt_bboxes_3d"]):
        np.testing.assert_allclose(b[:3], boxes[i, :3] * 1.3)
        np.testing.assert_allclose(b[3:6], boxes[i, 3:6] * 1.3)
        np.testing.assert_allclose(b[7:], boxes[i, 7:] * 1.3)
        np.testing.assert_allclose(
            project(out["lidar2img"][0], b[:3]), before[i], atol=1e-9
        )
    np.testing.assert_allclose(out["gt_bboxes_3d"][:, 6], yaw_before)


def make_fake_infos(tmp_path, n_frames=12, n_seq=2):
    rng = np.random.default_rng(0)
    infos = []
    for i in range(n_frames):
        cams = {}
        for c in range(6):
            cams[f"CAM{c}"] = dict(
                data_path=f"/nonexistent/img_{i}_{c}.jpg",
                sensor2lidar_rotation=np.eye(3),
                sensor2lidar_translation=np.zeros(3),
                cam_intrinsic=np.array(
                    [[100.0, 0, 50], [0, 100.0, 30], [0, 0, 1]]
                ),
            )
        g = 3
        infos.append(
            dict(
                token=f"t{i}",
                cams=cams,
                timestamp=(1e9 + i * 0.5) * 1e6,
                lidar_path=None,
                sweeps=[] if i % (n_frames // n_seq) == 0 else [1],
                lidar2ego_rotation=[1, 0, 0, 0],
                lidar2ego_translation=[0, 0, 0],
                ego2global_rotation=[1, 0, 0, 0],
                ego2global_translation=[i * 1.0, 0, 0],
                gt_boxes=rng.uniform(-10, 10, (g, 7)).astype(np.float64),
                gt_names=np.array(["car", "truck", "bus"]),
                gt_velocity=rng.uniform(-1, 1, (g, 2)),
                num_lidar_pts=np.array([5, 5, 5]),
                valid_flag=np.array([True, True, False]),
                instance_inds=np.array([100 + i, 200, 300]),
                bboxes2d=[
                    np.array([[10.0, 10, 50, 50]], np.float32)
                    for _ in range(6)
                ],
                labels2d=[np.array([0]) for _ in range(6)],
                centers2d=[np.array([[30.0, 30.0]]) for _ in range(6)],
                depths=[np.array([8.0]) for _ in range(6)],
                gt_2d_3d_map=[np.array([0]) for _ in range(6)],
            )
        )
    path = tmp_path / "infos.pkl"
    with open(path, "wb") as f:
        pickle.dump({"infos": infos, "metadata": {"version": "test"}}, f)
    return str(path)


def test_dataset_sequences_and_sampler(tmp_path):
    path = make_fake_infos(tmp_path)
    ds = NuScenesDataset(
        path,
        test_mode=False,
        data_aug_conf={
            "resize_lim": (0.4, 0.47),
            "final_dim": (32, 64),
            "bot_pct_lim": (0.0, 0.0),
            "rot_lim": (0, 0),
            "H": 60,
            "W": 100,
            "rand_flip": True,
            "rot3d_range": [-0.3, 0.3],
        },
        sequences_split_num=2,
    )
    assert len(ds) == 12
    # 2 sequences split into 2 -> 4 groups
    assert len(np.unique(ds.flag)) == 4

    sampler = GroupStreamSampler(ds, batch_size=2, world_size=2, rank=0,
                                 seed=0)
    it = iter(sampler)
    batches = [next(it) for _ in range(5)]
    for b in batches:
        assert len(b) == 2
        for idx, aug, new_seq in b:
            assert 0 <= idx < 12
            assert "crop" in aug
            assert isinstance(new_seq, bool)
    # first batch starts fresh sequences
    assert all(item[2] for item in batches[0])
    # slots advance within the same group consecutively
    idx_series = [b[0][0] for b in batches]
    flags = [ds.flag[i] for i in idx_series]
    # mostly same flag until exhaustion
    assert len(set(flags[:2])) == 1


def test_eval_shards_whole_sequences(tmp_path):
    path = make_fake_infos(tmp_path)
    ds = NuScenesDataset(path, test_mode=True, sequences_split_num=1)
    shards = sequence_eval_shards(ds, 2, timestamp_gap=0.9)
    all_idx = sorted(i for s in shards for i in s)
    assert all_idx == list(range(12))
    # each shard contains contiguous runs
    for s in shards:
        assert all(b - a == 1 for a, b in zip(s, s[1:])) or len(s) <= 1


def test_pad_sample_contract(tmp_path):
    path = make_fake_infos(tmp_path)
    ds = NuScenesDataset(path, test_mode=False, data_aug_conf={
        "resize_lim": (0.4, 0.47), "final_dim": (32, 64),
        "bot_pct_lim": (0.0, 0.0), "rot_lim": (0, 0), "H": 60, "W": 100,
        "rand_flip": False, "rot3d_range": [0, 0],
    })
    # stub image loading (files don't exist); signature mirrors
    # dataset.load_images incl. the draft-decode scale_hint kwarg
    ds.load_images = lambda paths, dtype=np.float32, scale_hint=None: [
        np.zeros((60, 100, 3), dtype) for _ in paths
    ]
    rng = np.random.default_rng(0)
    sample = ds.get_sample(0, rng=rng, with_points=False)
    padded = pad_sample(sample, max_gt3d=8, max_gt2d=4)
    assert padded["img"].shape == (6, 32, 64, 3)
    assert padded["projection_mat"].shape == (6, 4, 4)
    assert padded["gt_boxes3d"].shape == (8, 9)
    assert padded["gt_valid3d"].sum() == 2  # valid_flag keeps 2 of 3
    assert padded["gt_boxes2d"].shape == (6, 4, 4)
    assert padded["gt_vis2d_per3d"].shape == (8, 6)


def test_group_epoch_indices_semantics():
    """Epoch fallback sampler (reference group_sampler.py:13-119):
    group-pure device batches, circular padding, rank partition,
    determinism in (epoch, seed)."""
    from simpb_tpu.data.sampler import group_epoch_indices

    # 3 groups of uneven sizes 7, 4, 5
    flags = np.array([0] * 7 + [1] * 4 + [2] * 5)
    spd, nrep = 2, 2

    per_rank = [
        group_epoch_indices(flags, spd, nrep, rank=r, epoch=3, seed=11)
        for r in range(nrep)
    ]
    # equal per-rank counts; union covers every frame at least once
    assert len(per_rank[0]) == len(per_rank[1])
    total = np.concatenate(per_rank)
    # padded total: ceil(7/4)*4 + ceil(4/4)*4 + ceil(5/4)*4 = 8+4+8 = 20
    assert len(total) == 20
    assert set(total.tolist()) == set(range(16))

    # every per-device batch of spd frames is drawn from ONE group
    for r in per_rank:
        for chunk in r.reshape(-1, spd):
            assert len(np.unique(flags[chunk])) == 1

    # deterministic in (epoch, seed); different epochs differ
    again = group_epoch_indices(flags, spd, nrep, rank=0, epoch=3, seed=11)
    np.testing.assert_array_equal(per_rank[0], again)
    other = group_epoch_indices(flags, spd, nrep, rank=0, epoch=4, seed=11)
    assert not np.array_equal(per_rank[0], other)
