"""Dataset wrapper tests (Concat / Repeat / class-balanced CBGS)."""
import numpy as np

from simpb_tpu.data.wrappers import (
    ClassBalancedDataset,
    ConcatDataset,
    RepeatDataset,
)

CLASSES = ("car", "truck", "bus")


class StubDataset:
    """Duck-typed stand-in for NuScenesDataset."""

    CLASSES = CLASSES
    test_mode = False
    use_valid_flag = True

    def __init__(self, names_per_frame, flag=None, tag="a"):
        self.data_infos = [
            {
                "gt_names": np.asarray(names, object),
                "valid_flag": np.ones(len(names), bool),
            }
            for names in names_per_frame
        ]
        self.flag = (
            np.asarray(flag, np.int64)
            if flag is not None
            else np.zeros(len(names_per_frame), np.int64)
        )
        self.tag = tag

    def __len__(self):
        return len(self.data_infos)

    def get_augmentation(self, rng=None):
        return {"tag": self.tag}

    def get_sample(self, idx, **kwargs):
        return {"src": self.tag, "idx": idx, **kwargs}

    def get_annotations(self, idx):
        return {"src": self.tag, "idx": idx}


def test_repeat_dataset_tiles_indices_and_flags():
    ds = StubDataset([["car"], ["bus"], ["car"]], flag=[0, 0, 1])
    rep = RepeatDataset(ds, 3)
    assert len(rep) == 9
    assert rep.get_sample(4)["idx"] == 1
    assert rep.get_annotations(8)["idx"] == 2
    np.testing.assert_array_equal(rep.flag, np.tile([0, 0, 1], 3))


def test_concat_dataset_offsets_groups():
    a = StubDataset([["car"], ["bus"]], flag=[0, 1], tag="a")
    b = StubDataset([["truck"], ["car"], ["bus"]], flag=[0, 0, 1], tag="b")
    cat = ConcatDataset([a, b])
    assert len(cat) == 5
    assert cat.get_sample(1) == {"src": "a", "idx": 1}
    assert cat.get_sample(2) == {"src": "b", "idx": 0}
    assert cat.get_annotations(4) == {"src": "b", "idx": 2}
    # groups never merge across sub-datasets
    np.testing.assert_array_equal(cat.flag, [0, 1, 2, 2, 3])


def test_class_balanced_rebalances_rare_class():
    # 'car' in 8 frames, 'bus' in 1: CBGS must upweight the bus frame
    frames = [["car"]] * 8 + [["bus", "car"]]
    ds = StubDataset(frames, flag=list(range(9)))
    cb = ClassBalancedDataset(ds, seed=0)
    idx = np.asarray(cb.indices)
    share_bus = (idx == 8).mean()
    assert share_bus > 1.0 / 9  # strictly upweighted vs uniform
    # membership-count math matches mmdet3d CBGS: per class,
    # take = len(S_c) * (1/3) / (len(S_c)/total)  = total/3
    total = 9 + 1  # (sample, class) memberships: car 9, bus 1
    assert len(idx) == 2 * int(total / 3)  # two non-empty classes
    # every output group holds unique frames in temporal order, under
    # fresh contiguous group ids (duplicates become extra rounds)
    flags = np.asarray(cb.flag)
    for g in np.unique(flags):
        members = idx[flags == g]
        assert (np.diff(members) > 0).all() or len(members) == 1
    # delegation works
    s = cb.get_sample(0, rng=None)
    assert s["src"] == "a"


def test_class_balanced_respects_valid_flag():
    ds = StubDataset([["car"], ["car"], ["car"], ["bus"]],
                     flag=[0, 1, 2, 3])
    # invalidate the bus box: the class must vanish from resampling
    ds.data_infos[3]["valid_flag"] = np.zeros(1, bool)
    cb = ClassBalancedDataset(ds, seed=0)
    idx = set(np.asarray(cb.indices).tolist())
    assert idx and idx <= {0, 1, 2}


def test_class_balanced_streams_sequences_in_order():
    """CBGS over SEQUENCES: each output group must walk one original
    sequence's frames in temporal order (duplicated draws become extra
    rounds under fresh group ids) so GroupStreamSampler streams
    coherent subsequences — raw mmdet3d rng.choice order would feed the
    temporal state scrambled frames."""
    # two sequences of 4 frames each; rare class concentrated in seq 1
    frames = [["car"]] * 4 + [["car", "bus"], ["bus"], ["car"], ["car"]]
    ds = StubDataset(frames, flag=[0, 0, 0, 0, 1, 1, 1, 1])
    cb = ClassBalancedDataset(ds, seed=3)
    idx = np.asarray(cb.indices)
    flags = np.asarray(cb.flag)
    base_flag = np.asarray(ds.flag)
    for g in np.unique(flags):
        members = idx[flags == g]
        # one original sequence only, unique frames, temporal order
        assert len(np.unique(base_flag[members])) == 1
        assert len(np.unique(members)) == len(members)
        assert (np.diff(members) > 0).all() or len(members) == 1
    # the multiset of frames is preserved modulo grouping: every drawn
    # frame appears, duplicates included
    assert len(idx) > 0
    # data_infos remaps alongside indices (samplers index it directly)
    assert len(cb.data_infos) == len(idx)
    for i in (0, len(idx) - 1):
        assert cb.data_infos[i] is ds.data_infos[int(idx[i])]


def test_wrappers_nest_and_feed_stream_sampler():
    """ClassBalancedDataset(ConcatDataset) composes, and the stream
    sampler walks the wrapped dataset without scrambling."""
    from simpb_tpu.data.sampler import GroupStreamSampler

    a = StubDataset([["car"], ["car"], ["bus"]], flag=[0, 0, 1], tag="a")
    b = StubDataset([["truck"], ["truck"]], flag=[0, 0], tag="b")
    cb = ClassBalancedDataset(ConcatDataset([a, b]), seed=0)
    assert len(cb.data_infos) == len(cb)

    sampler = GroupStreamSampler(cb, batch_size=1, seed=0,
                                 skip_prob=0.0, sequence_flip_prob=0.0)
    it = iter(sampler)
    seen = [next(it)[0][0] for _ in range(min(len(cb), 6))]
    assert all(0 <= i < len(cb) for i in seen)


def test_repeat_and_concat_expose_data_infos():
    a = StubDataset([["car"], ["bus"]], flag=[0, 1], tag="a")
    b = StubDataset([["truck"]], flag=[0], tag="b")
    rep = RepeatDataset(a, 2)
    assert len(rep.data_infos) == 4
    assert rep.data_infos[2] is a.data_infos[0]
    cat = ConcatDataset([a, b])
    assert len(cat.data_infos) == 3
    assert cat.data_infos[2] is b.data_infos[0]
    assert cat.use_valid_flag is True
