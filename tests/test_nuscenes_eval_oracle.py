"""Cross-validate the production nuScenes metrics against an
INDEPENDENT brute-force implementation of the published devkit
algorithm (VERDICT round 1, weak #6).

nuscenes-devkit cannot be installed in this environment (zero egress),
so the oracle below re-derives the metric from the devkit's published
definition (eval/detection/algo.py: accumulate -> MetricData ->
calc_ap / calc_tp) with deliberately different code structure: plain
python loops, per-sample explicit matching, no shared helpers with
`simpb_tpu.data.nuscenes_eval`. Agreement to ~1e-9 on randomized scenes
means a coding slip in either implementation would have to be mirrored
exactly in the other to slip through.
"""
import numpy as np
import pytest

from simpb_tpu.configs.base import CLASS_NAMES
from simpb_tpu.data.nuscenes_eval import evaluate_detections

DIST_THS = (0.5, 1.0, 2.0, 4.0)


# ---------------------------------------------------------------- oracle
def _oracle_accumulate(preds, gts, cls_idx, dist_th):
    """Devkit accumulate, brute force: global score-desc loop, per
    (sample, gt) taken set."""
    records = []  # (score, is_tp, errors|None, sample_idx)
    npos = 0
    for s, gt in enumerate(gts):
        npos += int((gt["labels"] == cls_idx).sum())
    flat = []
    for s, pred in enumerate(preds):
        for j in range(len(pred["scores"])):
            if pred["labels"][j] == cls_idx:
                flat.append((float(pred["scores"][j]), s, j))
    flat.sort(key=lambda t: -t[0])
    taken = set()
    for score, s, j in flat:
        gt = gts[s]
        best = None
        best_d = float("inf")
        for g in range(len(gt["labels"])):
            if gt["labels"][g] != cls_idx or (s, g) in taken:
                continue
            d = float(
                np.hypot(
                    gt["boxes"][g, 0] - preds[s]["boxes"][j, 0],
                    gt["boxes"][g, 1] - preds[s]["boxes"][j, 1],
                )
            )
            if d < best_d:
                best_d = d
                best = g
        if best is not None and best_d < dist_th:
            taken.add((s, best))
            pb, gb = preds[s]["boxes"][j], gts[s]["boxes"][best]
            inter = 1.0
            union = 0.0
            for k in range(3, 6):
                inter *= min(pb[k], gb[k])
            union = (
                pb[3] * pb[4] * pb[5] + gb[3] * gb[4] * gb[5] - inter
            )
            period = np.pi if CLASS_NAMES[cls_idx] == "barrier" else 2 * np.pi
            dy = abs(pb[6] - gb[6]) % period
            errors = {
                "trans": best_d,
                "scale": 1.0 - inter / max(union, 1e-8),
                "orient": min(dy, period - dy),
                "vel": float(np.hypot(pb[7] - gb[7], pb[8] - gb[8])),
                "attr": 0.0,
            }
            records.append((score, 1, errors))
        else:
            records.append((score, 0, None))
    return records, npos


def _oracle_metric_data(records, npos):
    if npos == 0:
        return None
    # NB: must be np.linspace like the devkit — linspace(0,1,101)[70]
    # is 0.7000000000000001, and that ulp decides whether the exact
    # max-recall operating point is inside or outside the grid
    grid = np.linspace(0, 1, 101)
    matches = [r for r in records if r[1] == 1]
    if not records or not matches:
        return {
            "precision": [0.0] * 101,
            "confidence": [0.0] * 101,
            **{k: [1.0] * 101 for k in
               ("trans", "scale", "orient", "vel", "attr")},
        }
    tp = fp = 0
    rec, prec, conf = [], [], []
    for score, is_tp, _ in records:  # already score-desc
        tp += is_tp
        fp += 1 - is_tp
        rec.append(tp / npos)
        prec.append(tp / (tp + fp))
        conf.append(score)
    md = {
        "precision": np.interp(grid, rec, prec, right=0).tolist(),
        "confidence": np.interp(grid, rec, conf, right=0).tolist(),
    }
    match_conf = [r[0] for r in matches]
    for key in ("trans", "scale", "orient", "vel", "attr"):
        cm, acc = [], 0.0
        for i, (_, _, errors) in enumerate(matches):
            acc += errors[key]
            cm.append(acc / (i + 1))
        md[key] = np.interp(
            md["confidence"][::-1], match_conf[::-1], cm[::-1]
        )[::-1].tolist()
    return md


def _oracle_ap(md):
    if md is None:
        return float("nan")
    vals = [max(p - 0.1, 0.0) for p in md["precision"][11:]]
    return (sum(vals) / len(vals)) / 0.9


def _oracle_tp(md, key):
    if md is None:
        return float("nan")
    nz = [i for i, c in enumerate(md["confidence"]) if c != 0]
    max_ind = nz[-1] if nz else 0
    if max_ind < 11:
        return 1.0
    vals = md[key][11 : max_ind + 1]
    return sum(vals) / len(vals)


# published detection_cvpr_2019 class ranges (devkit filter_eval_boxes)
_ORACLE_RANGE = {
    "car": 50, "truck": 50, "construction_vehicle": 50, "bus": 50,
    "trailer": 50, "barrier": 30, "motorcycle": 40, "bicycle": 40,
    "pedestrian": 40, "traffic_cone": 30,
}


def _oracle_filter(samples):
    out = []
    for s in samples:
        keep = []
        for j in range(len(s["labels"])):
            r = _ORACLE_RANGE[CLASS_NAMES[int(s["labels"][j])]]
            d = float(np.hypot(s["boxes"][j, 0], s["boxes"][j, 1]))
            keep.append(d <= r)
        keep = np.asarray(keep, bool) if keep else np.zeros(0, bool)
        out.append({k: (v[keep] if isinstance(v, np.ndarray) else v)
                    for k, v in s.items()})
    return out


def oracle_evaluate(preds, gts):
    preds = _oracle_filter(preds)
    gts = _oracle_filter(gts)
    aps = {}
    tp_errs = {k: {} for k in ("trans", "scale", "orient", "vel", "attr")}
    skip = {
        "orient": {"traffic_cone"},
        "vel": {"traffic_cone", "barrier"},
        "attr": {"traffic_cone", "barrier"},
    }
    for ci, cls in enumerate(CLASS_NAMES):
        vals = []
        for th in DIST_THS:
            records, npos = _oracle_accumulate(preds, gts, ci, th)
            md = _oracle_metric_data(records, npos)
            vals.append(_oracle_ap(md))
            if th == 2.0:
                for k in tp_errs:
                    tp_errs[k][cls] = (
                        float("nan")
                        if cls in skip.get(k, set())
                        else _oracle_tp(md, k)
                    )
        aps[cls] = float(np.nanmean(vals))
    m_ap = float(np.nanmean(list(aps.values())))
    out = {"mAP": m_ap}
    names = {"trans": "mATE", "scale": "mASE", "orient": "mAOE",
             "vel": "mAVE", "attr": "mAAE"}
    nds = [5 * m_ap]
    for k, name in names.items():
        vs = [v for v in tp_errs[k].values() if v == v]
        err = sum(vs) / len(vs) if vs else 1.0
        out[name] = err
        nds.append(max(0.0, 1.0 - min(1.0, err)))
    out["NDS"] = sum(nds) / 10.0
    for cls, ap in aps.items():
        out[f"AP_{cls}"] = ap
    return out


# ----------------------------------------------------------- fixtures
def random_scene(rng, n_samples=4, classes=(0, 1, 5, 8)):
    """GT + noisy predictions with misses, false positives, duplicate
    detections, and distinct scores (ties are order-ambiguous)."""
    gts, preds = [], []
    for _ in range(n_samples):
        n = int(rng.integers(3, 12))
        boxes = np.zeros((n, 10), np.float32)
        boxes[:, :2] = rng.uniform(-40, 40, (n, 2))
        boxes[:, 2] = rng.uniform(-2, 0, n)
        boxes[:, 3:6] = rng.uniform(0.5, 5, (n, 3))
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
        boxes[:, 7:9] = rng.uniform(-3, 3, (n, 2))
        labels = rng.choice(classes, n)
        gts.append({"boxes": boxes, "labels": labels})

        keep = rng.uniform(size=n) > 0.25  # misses
        pb = boxes[keep].copy()
        pl = labels[keep].copy()
        pb[:, :2] += rng.normal(0, 0.8, (len(pb), 2))
        pb[:, 3:6] *= rng.uniform(0.8, 1.25, (len(pb), 3))
        pb[:, 6] += rng.normal(0, 0.3, len(pb))
        pb[:, 7:9] += rng.normal(0, 0.5, (len(pb), 2))
        # duplicates + false positives
        n_fp = int(rng.integers(1, 5))
        fp = np.zeros((n_fp, 10), np.float32)
        fp[:, :2] = rng.uniform(-45, 45, (n_fp, 2))
        fp[:, 3:6] = rng.uniform(0.5, 5, (n_fp, 3))
        fl = rng.choice(classes, n_fp)
        dup = pb[: max(1, len(pb) // 3)].copy()
        dup[:, :2] += rng.normal(0, 1.5, (len(dup), 2))
        allb = np.concatenate([pb, fp, dup], 0)
        alll = np.concatenate([pl, fl, pl[: len(dup)]], 0)
        scores = rng.uniform(0.05, 0.99, len(allb)).astype(np.float64)
        preds.append({"boxes": allb, "labels": alll, "scores": scores})
    return preds, gts


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_matches_independent_oracle(seed):
    rng = np.random.default_rng(seed)
    preds, gts = random_scene(rng)
    got = evaluate_detections(preds, gts)
    want = oracle_evaluate(preds, gts)
    for key in want:
        g, w = got[key], want[key]
        if w != w:  # NaN
            assert g != g, key
        else:
            # 1e-6: fp32 (production arrays) vs float64 (oracle python
            # floats) accumulation noise; definition drift would show
            # at 1e-2..1e-1 scale (e.g. the round-1 AP normalisation
            # bug this test was built to catch measured ~1%)
            assert abs(g - w) < 1e-6, (key, g, w)


def test_oracle_agrees_on_empty_and_perfect():
    rng = np.random.default_rng(7)
    preds, gts = random_scene(rng, n_samples=2)
    perfect = [
        {
            "boxes": g["boxes"].copy(),
            "labels": g["labels"].copy(),
            "scores": rng.uniform(0.5, 1.0, len(g["labels"])),
        }
        for g in gts
    ]
    got = evaluate_detections(perfect, gts)
    want = oracle_evaluate(perfect, gts)
    assert abs(got["mAP"] - want["mAP"]) < 1e-9
    assert abs(got["NDS"] - want["NDS"]) < 1e-9
    assert got["mAP"] > 0.98


def test_class_range_filter_drops_out_of_range_boxes():
    """A GT/pred pair beyond its class range must vanish from the
    metric entirely (devkit filter_eval_boxes semantics)."""
    car = CLASS_NAMES.index("car")
    cone = CLASS_NAMES.index("traffic_cone")
    mk = lambda xy, lbl: {
        "boxes": np.array([[xy[0], xy[1], 0, 2, 4, 1.5, 0, 0, 0, 0]],
                          np.float64),
        "labels": np.array([lbl]),
    }
    # car at 45 m: inside 50 m range; cone at 45 m: outside 30 m range
    gts = [mk((45, 0), car), mk((45, 0), cone)]
    preds = [
        dict(mk((45, 0), car), scores=np.array([0.9])),
        dict(mk((45, 0), cone), scores=np.array([0.9])),
    ]
    m = evaluate_detections(preds, gts)
    assert m["AP_car"] > 0.9  # survives the filter, perfect match
    # the cone class has no in-range GT -> excluded (NaN per-class AP)
    assert m["AP_traffic_cone"] != m["AP_traffic_cone"]
    # with filtering disabled both classes score
    m2 = evaluate_detections(preds, gts, class_range=None)
    assert m2["AP_traffic_cone"] > 0.9


def test_class_range_filter_global_frame_ego_xy():
    """Global-frame samples carry `ego_xy`; range is measured from the
    ego, not the map origin (devkit: norm(translation - ego_pose))."""
    car = CLASS_NAMES.index("car")
    ego = np.array([1000.0, 500.0])

    def mk(off, lbl, n=1):
        xy = ego + np.asarray(off)
        boxes = np.tile(
            np.array([[xy[0], xy[1], 0, 2, 4, 1.5, 0, 0, 0, 0]],
                     np.float64), (n, 1))
        return {
            "boxes": boxes,
            "labels": np.full((n,), lbl),
            "ego_xy": ego.copy(),
        }

    # two boxes per sample: exercises the N==2 edge where ego_xy's own
    # shape (2,) must NOT be row-filtered like a per-box array
    gts = [mk((45, 0), car, n=2)]
    preds = [dict(mk((45, 0), car, n=2), scores=np.array([0.9, 0.8]))]
    m = evaluate_detections(preds, gts)
    assert m["AP_car"] > 0.9  # 1045 m from origin but 45 m from ego

    # without ego_xy the same global boxes would be dropped entirely
    # (no in-range GT for any class -> per-class APs all NaN-excluded)
    for s in gts + preds:
        s.pop("ego_xy")
    m2 = evaluate_detections(preds, gts)
    assert m2["AP_car"] != m2["AP_car"]  # NaN: class filtered out


# ------------------------------------------------- adversarial fixtures
# Hand-computed expected values (VERDICT.md round-2 item 5): the
# production evaluator and the oracle above share an author, so a
# mirrored misreading of the devkit algorithm would pass the randomized
# cross-check. Each fixture below asserts BOTH implementations against
# constants derived on paper from the published definition
# (devkit eval/detection/algo.py; matching rule `d < dist_th` STRICT,
# AP = mean over recall grid 0.11..1.00 of (precision-0.1)+/0.9,
# TP errors averaged over grid 0.11..max_recall, 1.0 below min recall).

CAR, BUS, BARRIER, CONE = (
    CLASS_NAMES.index("car"),
    CLASS_NAMES.index("bus"),
    CLASS_NAMES.index("barrier"),
    CLASS_NAMES.index("traffic_cone"),
)


def _box(x, y, yaw=0.0, wlh=(2.0, 4.0, 1.5), vel=(0.0, 0.0)):
    return [x, y, 0.5, wlh[0], wlh[1], wlh[2], yaw, vel[0], vel[1], 0.0]


def _sample(boxes, labels, scores=None):
    s = {
        "boxes": np.asarray(boxes, np.float64).reshape(-1, 10),
        "labels": np.asarray(labels, np.int64),
    }
    if scores is not None:
        s["scores"] = np.asarray(scores, np.float64)
    return s


def _both(preds, gts):
    return evaluate_detections(preds, gts), oracle_evaluate(preds, gts)


def _check(out, expect, atol=1e-9):
    for k, v in expect.items():
        if v != v:  # NaN expected
            assert out[k] != out[k], f"{k}: expected NaN, got {out[k]}"
        else:
            assert abs(out[k] - v) <= atol, f"{k}: {out[k]} != {v}"


def test_fixture_perfect_single_detection():
    gts = [_sample([_box(1, 0)], [CAR])]
    preds = [_sample([_box(1, 0)], [CAR], [0.9])]
    expect = {"mAP": 1.0, "NDS": 1.0, "mATE": 0.0, "mASE": 0.0,
              "mAOE": 0.0, "mAVE": 0.0, "mAAE": 0.0, "AP_car": 1.0}
    for out in _both(preds, gts):
        _check(out, expect)


def test_fixture_distance_exactly_at_threshold():
    """Matching is STRICTLY d < dist_th: a prediction exactly 2.0 m
    from the GT matches only the 4.0 m threshold. AP_car =
    mean(0,0,0,1) = 0.25; at the 2.0 m TP threshold the class is below
    min recall, so every TP error is pinned to 1.0 and contributes 0 to
    NDS: NDS = 5*0.25/10."""
    gts = [_sample([_box(0, 0)], [CAR])]
    preds = [_sample([_box(2.0, 0)], [CAR], [0.9])]
    expect = {"mAP": 0.25, "NDS": 0.125, "mATE": 1.0, "mASE": 1.0,
              "mAOE": 1.0, "mAVE": 1.0, "mAAE": 1.0}
    for out in _both(preds, gts):
        _check(out, expect)


def test_fixture_distance_just_under_threshold():
    """d = 1.999 matches thresholds 2.0 and 4.0: AP_car = 0.5; mATE =
    1.999 (clipped to 1 inside NDS): NDS = (5*0.5 + 0+1+1+1+1)/10."""
    gts = [_sample([_box(0, 0)], [CAR])]
    preds = [_sample([_box(1.999, 0)], [CAR], [0.9])]
    expect = {"mAP": 0.5, "NDS": 0.65, "mATE": 1.999, "mASE": 0.0,
              "mAOE": 0.0, "mAVE": 0.0, "mAAE": 0.0}
    for out in _both(preds, gts):
        _check(out, atol=1e-9, expect=expect)


def test_fixture_zero_gt_class_is_nan_not_zero():
    """False positives of a class with no GT must leave that class out
    of the mean (NaN), not drag mAP to 0.5."""
    gts = [_sample([_box(1, 0)], [CAR])]
    preds = [_sample(
        [_box(1, 0), _box(5, 5), _box(6, 6), _box(7, 7)],
        [CAR, BUS, BUS, BUS],
        [0.9, 0.8, 0.7, 0.6],
    )]
    expect = {"mAP": 1.0, "NDS": 1.0, "AP_car": 1.0,
              "AP_bus": float("nan")}
    for out in _both(preds, gts):
        _check(out, expect)


def test_fixture_yaw_wraparound_pi():
    """yaw pi vs -pi is the SAME orientation: mAOE = 0."""
    gts = [_sample([_box(1, 0, yaw=np.pi)], [CAR])]
    preds = [_sample([_box(1, 0, yaw=-np.pi)], [CAR], [0.9])]
    expect = {"mAP": 1.0, "NDS": 1.0, "mAOE": 0.0}
    for out in _both(preds, gts):
        _check(out, expect)


def test_fixture_yaw_opposite_direction():
    """A car facing backwards scores mAOE = pi (clipped to 1 in NDS):
    NDS = (5 + 1+1+0+1+1)/10 = 0.9."""
    gts = [_sample([_box(1, 0, yaw=0.0)], [CAR])]
    preds = [_sample([_box(1, 0, yaw=np.pi)], [CAR], [0.9])]
    expect = {"mAP": 1.0, "NDS": 0.9, "mAOE": float(np.pi)}
    for out in _both(preds, gts):
        _check(out, expect)


def test_fixture_barrier_period_pi():
    """Barriers have period-pi orientation: a pi flip is exact (err 0),
    pi/2 is the worst case."""
    gts = [_sample([_box(1, 0, yaw=0.0)], [BARRIER])]
    preds = [_sample([_box(1, 0, yaw=np.pi)], [BARRIER], [0.9])]
    for out in _both(preds, gts):
        _check(out, {"mAP": 1.0, "mAOE": 0.0})
    preds = [_sample([_box(1, 0, yaw=np.pi / 2)], [BARRIER], [0.9])]
    for out in _both(preds, gts):
        _check(out, {"mAP": 1.0, "mAOE": float(np.pi / 2)})


def test_fixture_barrier_cone_skip_rules():
    """traffic_cone skips AOE/AVE/AAE; with only cone GT those means
    are empty -> pinned to 1.0 -> NDS = (5 + 1 + 1 + 0 + 0 + 0)/10."""
    gts = [_sample([_box(1, 0)], [CONE])]
    preds = [_sample([_box(1, 0)], [CONE], [0.9])]
    expect = {"mAP": 1.0, "NDS": 0.7, "mATE": 0.0, "mASE": 0.0,
              "mAOE": 1.0, "mAVE": 1.0, "mAAE": 1.0}
    for out in _both(preds, gts):
        _check(out, expect)


def test_fixture_attribute_mismatch():
    """Attribute arrays: a matched pred with the wrong attribute scores
    mAAE = 1 -> NDS loses exactly the attr term."""
    gts = [_sample([_box(1, 0)], [CAR])]
    gts[0]["attrs"] = np.array([2])
    preds = [_sample([_box(1, 0)], [CAR], [0.9])]
    preds[0]["attrs"] = np.array([2])
    out = evaluate_detections(preds, gts)
    _check(out, {"mAP": 1.0, "NDS": 1.0, "mAAE": 0.0})
    preds[0]["attrs"] = np.array([3])
    out = evaluate_detections(preds, gts)
    _check(out, {"mAP": 1.0, "NDS": 0.9, "mAAE": 1.0})


def test_fixture_duplicate_detection_on_one_gt():
    """Two GT; three preds where the middle-score pred duplicates the
    first GT (greedy takes it once -> FP). Hand-derived via the devkit
    interpolation math: recall=[.5,.5,1], precision=[1,.5,2/3],
    conf=[.9,.8,.7] ->
    AP = [39*0.9 + (0.5-0.1) + sum_{i=51..100}(0.5+(i/100-0.5)/3 - 0.1)]
         / 90 / 0.9 = 0.7376543209876544 (same at all four thresholds);
    mATE: cum-mean errors [0.1, 0.2] at conf [0.9, 0.7], interpolated
    onto the confidence grid -> 0.14249999999999996.
    NDS = (5*AP + (1-0.1425) + 4*1)/10."""
    gts = [_sample([_box(0, 0), _box(20, 0)], [CAR, CAR])]
    preds = [_sample(
        [_box(0.1, 0), _box(0.2, 0), _box(20.3, 0)],
        [CAR, CAR, CAR],
        [0.9, 0.8, 0.7],
    )]
    ap = 0.7376543209876544
    ate = 0.14249999999999996
    expect = {
        "mAP": ap, "AP_car": ap, "mATE": ate, "mASE": 0.0, "mAOE": 0.0,
        "mAVE": 0.0, "mAAE": 0.0,
        "NDS": (5 * ap + (1 - ate) + 4.0) / 10.0,
    }
    for out in _both(preds, gts):
        _check(out, expect, atol=1e-9)
