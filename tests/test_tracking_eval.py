"""Tracking metrics (AMOTA/AMOTP/CLEAR-MOT) tests.

Hand-computed fixtures for every event type plus a randomized
cross-check against an independent brute-force oracle (permutation-
enumerated assignment, explicit event bookkeeping) of the same
published definition — the pattern tests/test_nuscenes_eval_oracle.py
uses for the detection metrics.
"""
import itertools

import numpy as np
import pytest

from simpb_tpu.configs.base import CLASS_NAMES
from simpb_tpu.data.tracking_eval import (
    DIST_TH,
    MIN_RECALL,
    MOTP_WORST,
    NUM_THRESHOLDS,
    TRACKING_CLASSES,
    evaluate_tracking,
)

CAR = CLASS_NAMES.index("car")


def frame(gt, hyp, cls=CAR):
    """gt: [(id, x, y)], hyp: [(id, x, y, score)] -> (pred, gt) dicts."""
    gt = list(gt)
    hyp = list(hyp)
    gboxes = np.zeros((len(gt), 9), np.float32)
    for i, (_, x, y) in enumerate(gt):
        gboxes[i, :2] = (x, y)
        gboxes[i, 3:6] = 1.0
    pboxes = np.zeros((len(hyp), 9), np.float32)
    for i, (_, x, y, _) in enumerate(hyp):
        pboxes[i, :2] = (x, y)
        pboxes[i, 3:6] = 1.0
    pred = {
        "boxes": pboxes,
        "scores": np.array([h[3] for h in hyp], np.float32),
        "labels": np.full(len(hyp), cls),
        "track_ids": np.array([h[0] for h in hyp], np.int64),
    }
    gt_d = {
        "boxes": gboxes,
        "labels": np.full(len(gt), cls),
        "track_ids": np.array([g[0] for g in gt], np.int64),
    }
    return pred, gt_d


def run(frames, scene_ids=None):
    preds, gts = zip(*frames)
    if scene_ids is None:
        scene_ids = [0] * len(frames)
    return evaluate_tracking(list(preds), list(gts), scene_ids)


def test_perfect_tracking():
    frames = [
        frame([(1, 0, 0), (2, 10, 0)], [(7, 0, 0, 0.9), (8, 10, 0, 0.8)])
        for _ in range(4)
    ]
    m = run(frames)
    assert m["AMOTA"] == pytest.approx(1.0)
    assert m["AMOTP"] == pytest.approx(0.0)
    assert m["IDS"] == 0
    assert m["FRAG"] == 0
    assert m["MOTA"] == pytest.approx(1.0)
    assert m["RECALL"] == pytest.approx(1.0)
    assert m["MT"] == 2 and m["ML"] == 0


def test_id_switch_counted():
    # one GT track, hypothesis id changes mid-scene: exactly 1 switch;
    # MOTAR = 1 - (IDS+FP)/ (r*P) = 1 - 1/4 at every achieved threshold
    frames = [
        frame([(1, 0, 0)], [(7 if t < 2 else 8, 0, 0, 0.9)])
        for t in range(4)
    ]
    m = run(frames)
    assert m["IDS"] == 1
    assert m["AMOTA"] == pytest.approx(0.75)
    assert m["MOTA"] == pytest.approx(0.75)


def test_switch_persists_across_occlusion_gap():
    # the GT disappears for one frame; its last-known hypothesis id
    # persists, so reappearing under a new id is still a switch
    frames = [
        frame([(1, 0, 0)], [(7, 0, 0, 0.9)]),
        frame([(1, 0, 0)], [(7, 0, 0, 0.9)]),
        frame([], []),
        frame([(1, 0, 0)], [(8, 0, 0, 0.9)]),
    ]
    m = run(frames)
    assert m["IDS"] == 1


def test_reuse_prefers_previous_correspondence():
    # frame 1: previous hyp 7 is 1.9 m away (inside the gate), a fresh
    # hyp 8 is 0.1 m away. motmetrics reuses 7 (no switch); 8 is a FP.
    frames = [
        frame([(1, 0, 0)], [(7, 0, 0, 0.9)]),
        frame([(1, 0, 0)], [(7, 1.9, 0, 0.9), (8, 0.1, 0, 0.9)]),
    ]
    m = run(frames)
    assert m["IDS"] == 0
    assert m["FP"] == 1
    assert m["MOTP"] == pytest.approx(1.9 / 2)


def test_fragmentation_and_fn():
    # tracked, missed (GT present, no prediction), tracked -> 1 FRAG
    frames = [
        frame([(1, 0, 0)], [(7, 0, 0, 0.9)]),
        frame([(1, 0, 0)], []),
        frame([(1, 0, 0)], [(7, 0, 0, 0.9)]),
    ]
    m = run(frames)
    assert m["FRAG"] == 1
    assert m["FN"] == 1
    assert m["IDS"] == 0


def test_amota_unachieved_recall_penalty():
    # predictions cover 2 of 4 GT frames: max recall 0.5. Achieved grid
    # points score MOTAR=1 (FN exactly offsets the (1-r)P allowance);
    # unachieved points contribute 0 and AMOTP's worst value.
    frames = [
        frame([(1, 0, 0)], [(7, 0, 0, 0.9)]),
        frame([(1, 0, 0)], [(7, 0, 0, 0.9)]),
        frame([(1, 0, 0)], []),
        frame([(1, 0, 0)], []),
    ]
    m = run(frames)
    grid = np.linspace(MIN_RECALL, 1.0, NUM_THRESHOLDS)
    n_achieved = int((grid <= 0.5 + 1e-9).sum())
    assert m["AMOTA"] == pytest.approx(n_achieved / NUM_THRESHOLDS)
    expected_amotp = (
        (NUM_THRESHOLDS - n_achieved) * MOTP_WORST / NUM_THRESHOLDS
    )
    assert m["AMOTP"] == pytest.approx(expected_amotp)


def test_false_positives_lower_amota():
    clean = [
        frame([(1, 0, 0)], [(7, 0, 0, 0.9)]) for _ in range(4)
    ]
    noisy = [
        frame([(1, 0, 0)], [(7, 0, 0, 0.9), (100 + t, 30, 30, 0.95)])
        for t in range(4)
    ]
    assert run(noisy)["AMOTA"] < run(clean)["AMOTA"]


def test_class_range_filter():
    # a car 80 m out is beyond the 50 m class range on both sides
    far = frame([(1, 80, 0)], [(7, 80, 0, 0.9)])
    near = frame([(2, 5, 0)], [(8, 5, 0, 0.9)])
    m = run([far, near])
    assert m["TP"] == 1
    assert m["FP"] == 0 and m["FN"] == 0


def test_non_tracking_classes_ignored():
    barrier = CLASS_NAMES.index("barrier")
    frames = [frame([(1, 0, 0)], [(7, 0, 0, 0.9)], cls=barrier)]
    m = run(frames)
    assert np.isnan(m["AMOTA"])
    assert m["TP"] == 0


def test_scenes_do_not_leak_state():
    # same ids in two scenes; hyp id changes BETWEEN scenes is no switch
    frames = [
        frame([(1, 0, 0)], [(7, 0, 0, 0.9)]),
        frame([(1, 0, 0)], [(7, 0, 0, 0.9)]),
        frame([(1, 0, 0)], [(8, 0, 0, 0.9)]),
        frame([(1, 0, 0)], [(8, 0, 0, 0.9)]),
    ]
    m = run(frames, scene_ids=[0, 0, 1, 1])
    assert m["IDS"] == 0
    assert m["AMOTA"] == pytest.approx(1.0)


# ---------------------------------------------------------------- oracle


def oracle_match(gt_xy, hyp_xy, gt_ids, hyp_ids, last):
    """Brute-force reuse-then-optimal association (permutations)."""
    matches = []
    used_g, used_h = set(), set()
    for gi in range(len(gt_ids)):
        prev = last.get(int(gt_ids[gi]))
        if prev is None:
            continue
        for hi in range(len(hyp_ids)):
            if hi in used_h or int(hyp_ids[hi]) != prev:
                continue
            d = float(np.hypot(*(gt_xy[gi] - hyp_xy[hi])))
            if d <= DIST_TH:
                matches.append((gi, hi, d))
                used_g.add(gi)
                used_h.add(hi)
            break
    rem_g = [i for i in range(len(gt_ids)) if i not in used_g]
    rem_h = [j for j in range(len(hyp_ids)) if j not in used_h]
    best, best_cost = [], None
    k = min(len(rem_g), len(rem_h))
    for g_sub in itertools.combinations(rem_g, k):
        for h_perm in itertools.permutations(rem_h, k):
            pairs = [
                (g, h, float(np.hypot(*(gt_xy[g] - hyp_xy[h]))))
                for g, h in zip(g_sub, h_perm)
            ]
            pairs = [p for p in pairs if p[2] <= DIST_TH]
            cost = (sum(p[2] for p in pairs), -len(pairs))
            # maximize matches, then minimize total distance
            key = (-len(pairs), sum(p[2] for p in pairs))
            if best_cost is None or key < best_cost:
                best_cost = key
                best = pairs
    return matches + best


def oracle_eval(frames_by_scene, threshold):
    tp = fp = fn = ids = 0
    motp = 0.0
    scores = []
    for scene in frames_by_scene:
        last = {}
        for g, h in scene:
            g_ids = np.array([x[0] for x in g], np.int64)
            g_xy = np.array([x[1:3] for x in g], np.float64).reshape(-1, 2)
            h_all = [x for x in h if threshold is None or x[3] >= threshold]
            h_ids = np.array([x[0] for x in h_all], np.int64)
            h_xy = np.array(
                [x[1:3] for x in h_all], np.float64
            ).reshape(-1, 2)
            ms = oracle_match(g_xy, h_xy, g_ids, h_ids, last)
            for gi, hi, d in ms:
                gid, hid = int(g_ids[gi]), int(h_ids[hi])
                if gid in last and last[gid] != hid:
                    ids += 1
                last[gid] = hid
                tp += 1
                motp += d
                scores.append(h_all[hi][3])
            fn += len(g_ids) - len(ms)
            fp += len(h_ids) - len(ms)
    return dict(tp=tp, fp=fp, fn=fn, ids=ids, motp=motp, scores=scores)


def oracle_amota(frames_by_scene, num_gt):
    free = oracle_eval(frames_by_scene, None)
    grid = np.linspace(MIN_RECALL, 1.0, NUM_THRESHOLDS)
    ss = np.sort(np.asarray(free["scores"]))[::-1]
    recalls = np.arange(1, ss.size + 1) / num_gt
    motars, motps = [], []
    for r in grid:
        if ss.size == 0 or r > recalls[-1] + 1e-9:
            motars.append(0.0)
            motps.append(MOTP_WORST)
            continue
        th = float(np.interp(r, recalls, ss))
        acc = oracle_eval(frames_by_scene, th)
        rec = acc["tp"] / num_gt
        if rec <= 0:
            motars.append(0.0)
            motps.append(MOTP_WORST)
            continue
        motars.append(
            max(
                0.0,
                1
                - (acc["ids"] + acc["fp"] + acc["fn"] - (1 - rec) * num_gt)
                / (rec * num_gt),
            )
        )
        motps.append(acc["motp"] / acc["tp"] if acc["tp"] else MOTP_WORST)
    return float(np.mean(motars)), float(np.mean(motps))


@pytest.mark.parametrize("seed", range(6))
def test_oracle_cross_check(seed):
    rng = np.random.default_rng(seed)
    n_scenes, n_frames = 2, 5
    frames, oracle_scenes = [], []
    scene_ids = []
    num_gt = 0
    for s in range(n_scenes):
        scene = []
        # persistent GT tracks with jittered positions
        base = rng.uniform(-20, 20, size=(3, 2))
        for t in range(n_frames):
            gt = []
            for k in range(3):
                if rng.random() < 0.85:  # occasional occlusion
                    x, y = base[k] + rng.normal(0, 0.3, 2) + t * 0.5
                    gt.append((s * 10 + k, float(x), float(y)))
            hyp = []
            for gid, x, y in gt:
                if rng.random() < 0.8:  # detector recall
                    hid = gid + (1000 if rng.random() < 0.1 else 0)
                    hyp.append(
                        (
                            hid,
                            float(x + rng.normal(0, 0.4)),
                            float(y + rng.normal(0, 0.4)),
                            float(rng.uniform(0.3, 1.0)),
                        )
                    )
            if rng.random() < 0.3:  # clutter FP
                hyp.append(
                    (
                        5000 + t,
                        float(rng.uniform(-20, 20)),
                        float(rng.uniform(-20, 20)),
                        float(rng.uniform(0.3, 1.0)),
                    )
                )
            num_gt += len(gt)
            frames.append(frame(gt, hyp))
            scene.append((gt, hyp))
            scene_ids.append(s)
        oracle_scenes.append(scene)

    m = evaluate_tracking(
        [f[0] for f in frames], [f[1] for f in frames], scene_ids
    )
    amota, amotp = oracle_amota(oracle_scenes, num_gt)
    # fixture coords pass through float32 box arrays on the main path
    # but stay float64 in the oracle: distances agree to ~1e-7
    assert m["AMOTA"] == pytest.approx(amota, abs=1e-6)
    assert m["AMOTP"] == pytest.approx(amotp, abs=1e-6)
