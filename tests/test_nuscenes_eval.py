"""Native nuScenes metric implementation sanity checks."""
import numpy as np

from simpb_tpu.data.nuscenes_eval import evaluate_detections


def make_gt(rng, n=10, cls=0):
    boxes = np.zeros((n, 10), np.float32)
    boxes[:, :2] = rng.uniform(-40, 40, (n, 2))
    boxes[:, 3:6] = rng.uniform(1, 4, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    boxes[:, 7:9] = rng.uniform(-2, 2, (n, 2))
    return {"boxes": boxes, "labels": np.full(n, cls)}


def as_pred(gt, scores=None):
    n = len(gt["boxes"])
    return {
        "boxes": gt["boxes"].copy(),
        "labels": gt["labels"].copy(),
        "scores": np.linspace(0.9, 0.5, n) if scores is None else scores,
    }


def test_perfect_predictions():
    rng = np.random.default_rng(0)
    gts = [make_gt(rng, cls=0), make_gt(rng, cls=0)]
    preds = [as_pred(g) for g in gts]
    m = evaluate_detections(preds, gts)
    assert m["AP_car"] > 0.99
    assert m["mATE"] < 1e-6
    assert m["mASE"] < 1e-6
    assert m["mAOE"] < 1e-6
    assert m["NDS"] > 0.99 * (5 * m["mAP"] + 5) / 10


def test_no_predictions():
    rng = np.random.default_rng(1)
    gts = [make_gt(rng, cls=0)]
    preds = [{
        "boxes": np.zeros((0, 10), np.float32),
        "labels": np.zeros((0,), np.int64),
        "scores": np.zeros((0,)),
    }]
    m = evaluate_detections(preds, gts)
    assert np.isnan(m["AP_car"]) or m["AP_car"] == 0.0
    assert m["NDS"] <= 0.5


def test_noisy_worse_than_perfect():
    rng = np.random.default_rng(2)
    gts = [make_gt(rng, n=20, cls=0)]
    perfect = [as_pred(gts[0])]
    noisy_boxes = gts[0]["boxes"].copy()
    noisy_boxes[:, :2] += rng.normal(0, 1.5, (20, 2))
    noisy = [{
        "boxes": noisy_boxes,
        "labels": gts[0]["labels"],
        "scores": np.linspace(0.9, 0.5, 20),
    }]
    mp = evaluate_detections(perfect, gts)
    mn = evaluate_detections(noisy, gts)
    assert mp["mAP"] > mn["mAP"]
    assert mp["NDS"] > mn["NDS"]
    assert mn["mATE"] > 0.5


def test_false_positives_reduce_ap():
    rng = np.random.default_rng(3)
    gts = [make_gt(rng, n=10, cls=0)]
    pred = as_pred(gts[0])
    # add 10 high-scoring FPs far away
    fp_boxes = gts[0]["boxes"].copy()
    fp_boxes[:, :2] += 50
    pred2 = {
        "boxes": np.concatenate([pred["boxes"], fp_boxes]),
        "labels": np.concatenate([pred["labels"], gts[0]["labels"]]),
        "scores": np.concatenate(
            [np.linspace(0.8, 0.5, 10), np.full(10, 0.95)]
        ),
    }
    m1 = evaluate_detections([pred], gts)
    m2 = evaluate_detections([pred2], gts)
    assert m2["mAP"] < m1["mAP"]
