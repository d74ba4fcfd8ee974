#!/usr/bin/env python
"""Schedule rehearsal soak: hours-scale training with eval hooks,
mid-run SIGTERM + resume, and step-time-creep detection.

VERDICT.md round-2 item 3: the 10.3 h full-schedule projection rested
on a 300-step run. This drives the REAL product CLI (tools/train.py)
at the flagship fast config on synthetic 1600x900 data through the
real aug pipeline for thousands of steps, with:

  * mid-training in-process eval firing on schedule
    (reference CustomDistEvalHook, core/evaluation/eval_hooks.py:56-97);
  * a SIGTERM in the middle + full-state resume (temporal + optimizer +
    sampler position — beats the reference, which restarts temporal
    streams silently);
  * tensorboard scalars (checked to exist);
  * a step-time / loss log parsed into creep statistics (first-third
    vs last-third median s/iter).

Writes one JSON artifact for PERF.md.

Usage (on-chip, ~1-1.5 h at the defaults):
  python tools/soak_study.py --steps 5000 --work-dir /tmp/soak \
      --json studies/soak.json
"""
import argparse
import json
import os
import pickle
import re
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REPO = os.path.join(os.path.dirname(__file__), "..")
SRC_H, SRC_W = 900, 1600


def write_soak_dataset(out_dir: str, n_frames: int, seq_len: int = 8):
    """Synthetic nuScenes-shaped dataset with REAL 1600x900 JPEGs (so
    the host decode cost is the production cost), scene boundaries
    every `seq_len` frames, and moving GT boxes."""
    from PIL import Image

    rng = np.random.default_rng(0)
    os.makedirs(out_dir, exist_ok=True)
    # a handful of distinct images cycled across frames (generating
    # 6*n_frames full-res JPEGs is pointless); realistic-entropy
    # content (~170 KB files), NOT noise — noise JPEGs are an
    # adversarial decode bound ~3x the real camera cost (PERF.md
    # "Host data pipeline"), which would skew the s/iter statistics
    # this study exists to measure
    y, x = np.mgrid[0:SRC_H, 0:SRC_W]
    paths = []
    for c in range(12):
        p = os.path.join(out_dir, f"cam{c}.jpg")
        if not os.path.exists(p):
            img = np.stack(
                [120 + 60 * y / SRC_H + 10 * np.sin(x / 40 + c),
                 110 + 50 * y / SRC_H, 100 + 40 * y / SRC_H], -1
            )
            for _ in range(40):
                x0 = rng.integers(0, SRC_W - 128)
                y0 = rng.integers(SRC_H // 3, SRC_H - 128)
                w, h = rng.integers(30, 120, 2)
                img[y0:y0 + h, x0:x0 + w] = rng.integers(0, 255, 3)
            img = np.clip(img + rng.normal(0, 3, img.shape), 0, 255)
            Image.fromarray(img.astype(np.uint8)).save(p, quality=90)
        paths.append(p)
    infos = []
    for i in range(n_frames):
        cams = {
            f"CAM{c}": dict(
                data_path=paths[(i + c) % len(paths)],
                sensor2lidar_rotation=np.eye(3),
                sensor2lidar_translation=np.zeros(3),
                cam_intrinsic=np.array(
                    [[1266.0, 0, SRC_W / 2], [0, 1266.0, SRC_H / 2],
                     [0, 0, 1]]
                ),
            )
            for c in range(6)
        }
        g = 12
        boxes = np.zeros((g, 7))
        boxes[:, :2] = rng.uniform(-40, 40, (g, 2))
        boxes[:, 2] = 0.5
        boxes[:, 3:6] = rng.uniform(1, 4, (g, 3))
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, g)
        infos.append(
            dict(
                token=f"t{i}",
                cams=cams,
                timestamp=(1.5e9 + i * 0.5
                           + 10.0 * (i // seq_len)) * 1e6,
                lidar_path=None,
                sweeps=[] if i % seq_len == 0 else [1],
                lidar2ego_rotation=[1, 0, 0, 0],
                lidar2ego_translation=[0, 0, 0],
                ego2global_rotation=[1, 0, 0, 0],
                ego2global_translation=[i * 1.0, 0, 0],
                gt_boxes=boxes,
                gt_names=np.array(
                    ["car", "truck", "bus", "pedestrian"] * 3
                ),
                gt_velocity=rng.uniform(-1, 1, (g, 2)),
                num_lidar_pts=np.full(g, 5),
                valid_flag=np.ones(g, bool),
                instance_inds=np.arange(g) + 100 * (i // seq_len),
                bboxes2d=[
                    np.array([[5.0, 5, 400, 400]], np.float32)
                ] * 6,
                labels2d=[np.array([0])] * 6,
                centers2d=[np.array([[200.0, 200.0]])] * 6,
                depths=[np.array([8.0])] * 6,
                gt_2d_3d_map=[np.array([0])] * 6,
            )
        )
    pkl = os.path.join(out_dir, "soak_infos.pkl")
    with open(pkl, "wb") as f:
        pickle.dump({"infos": infos, "metadata": {"version": "soak"}}, f)
    return pkl


ITER_RE = re.compile(
    r"iter (\d+)/(\d+) loss ([\d.eE+-]+) \(([\d.]+)s/iter\)"
)


def run_phase(cmd, sigterm_after_iter=None, timeout=14400,
              stall_timeout=1800):
    """Run tools/train.py, streaming stdout; optionally SIGTERM once a
    logged iter passes the threshold. Returns (records, evals, out).

    Stall detection: if NO output arrives for `stall_timeout` seconds
    AFTER the first iter line (the round-4 failure was a silent 25-min
    native device-RPC hang mid-run; cold compiles before the first
    iter are legitimately silent for 10+ min and must not trip it),
    send SIGTERM — the graceful preemption path if the main thread can
    run its handler, else the in-process watchdog (utils/watchdog.py)
    forces a resumable exit 75 within its deadline. SIGKILL only as the
    last resort if even the watchdog fails to end the process."""
    import queue
    import threading

    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO,
    )
    q: "queue.Queue" = queue.Queue()

    def reader():
        for line in proc.stdout:
            q.put(line)
        q.put(None)

    threading.Thread(target=reader, daemon=True).start()

    records, evals, lines = [], [], []
    sent = False
    stall_term_at = None
    t0 = time.time()
    t_last = None  # armed by the first iter line
    while True:
        try:
            line = q.get(timeout=30)
        except queue.Empty:
            line = ""
        if line is None:
            break
        if line:
            lines.append(line)
            sys.stdout.write(line)
            sys.stdout.flush()
            if records:
                t_last = time.time()
            m = ITER_RE.search(line)
            if m:
                records.append(
                    (int(m.group(1)), float(m.group(3)),
                     float(m.group(4)))
                )
                if (
                    sigterm_after_iter is not None
                    and not sent
                    and int(m.group(1)) >= sigterm_after_iter
                ):
                    print(
                        f"[soak] sending SIGTERM at iter {m.group(1)}",
                        flush=True,
                    )
                    proc.send_signal(signal.SIGTERM)
                    sent = True
            if "eval @ iter" in line:
                evals.append(line.strip())
        else:
            if t_last is None:
                continue  # still compiling/starting: no stall clock yet
            quiet = time.time() - t_last
            if stall_term_at is None and quiet > stall_timeout:
                print(
                    f"[soak] no output for {quiet:.0f}s — silent "
                    "stall; sending SIGTERM (watchdog escalates if "
                    "the handler is unreachable)", flush=True,
                )
                proc.send_signal(signal.SIGTERM)
                stall_term_at = time.time()
            elif (
                stall_term_at is not None
                and time.time() - stall_term_at > 600
            ):
                print("[soak] watchdog did not end the stalled "
                      "process in 600s — SIGKILL", flush=True)
                proc.kill()
        if time.time() - t0 > timeout:
            proc.kill()
            raise RuntimeError("soak phase timed out")
    rc = proc.wait()
    return records, evals, rc, "".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--config", default="r50-fast")
    ap.add_argument("--work-dir", default="/tmp/simpb_soak")
    ap.add_argument("--eval-interval", type=int, default=None,
                    help="default: steps // 3")
    ap.add_argument("--eval-frames", type=int, default=24)
    ap.add_argument("--log-interval", type=int, default=20)
    ap.add_argument("--sigterm-frac", type=float, default=0.5)
    ap.add_argument("--draft", action="store_true",
                    help="train with --draft-decode (scaled JPEG "
                         "decode) — the host-bound 1-core lever")
    ap.add_argument("--resume-from", default=None,
                    help="seed the phase loop from an existing "
                         "checkpoint (continue an interrupted soak; "
                         "the resumed phase counts as the "
                         "resume-exercise)")
    ap.add_argument("--img-bf16", action="store_true",
                    help="forwarded to tools/train.py (halves the "
                         "host->device image upload)")
    ap.add_argument("--watchdog-deadline", type=float, default=120.0,
                    help="forwarded to tools/train.py: native-stall "
                         "escape (utils/watchdog.py). A stall like the "
                         "round-4 562-iter RPC hang now ends in a "
                         "forced resumable exit (code 75) that this "
                         "harness auto-resumes from")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    eval_interval = args.eval_interval or max(1, args.steps // 3)
    pkl = write_soak_dataset(args.work_dir, args.frames)
    work = os.path.join(args.work_dir, "run")

    base_cmd = [
        sys.executable, os.path.join(REPO, "tools", "train.py"),
        "--ann-file", pkl, "--config", args.config,
        "--batch-size", str(args.batch_size),
        "--max-iters", str(args.steps),
        "--log-interval", str(args.log_interval),
        "--ckpt-interval", str(max(200, args.steps // 4)),
        "--work-dir", work,
        "--eval-ann-file", pkl,
        "--eval-interval", str(eval_interval),
        "--eval-frames", str(args.eval_frames),
        "--watchdog-deadline", str(args.watchdog_deadline),
    ]
    if args.draft:
        base_cmd.append("--draft-decode")
    if args.img_bf16:
        base_cmd.append("--img-bf16")

    # phase loop: the deliberate mid-run SIGTERM exercises the graceful
    # preemption path once (rc 0 + ckpt_preempt); a watchdog-forced
    # exit (rc 75: termination signal during a native stall —
    # utils/watchdog.py) auto-resumes from the recorded recovery point.
    # Both resume paths are the product contract this soak certifies.
    sig_at = int(args.steps * args.sigterm_frac)
    records, evals, watchdog_exits = [], [], 0
    resume_dir = args.resume_from
    sigterm_done = bool(args.resume_from)  # resuming IS the exercise
    out2 = ""
    phase = 0
    while True:
        phase += 1
        cmd = list(base_cmd)
        if resume_dir:
            cmd += ["--resume-from", resume_dir]
        this_sig = None if sigterm_done else sig_at
        print(f"[soak] phase {phase}: resume={resume_dir} "
              f"sigterm_at={this_sig}", flush=True)
        rec, ev, rc, out = run_phase(cmd, sigterm_after_iter=this_sig)
        records += rec
        evals += ev
        if resume_dir:
            out2 = out  # any resumed phase must print "resumed from"
        last = max((r[0] for r in rec), default=0)
        if rc == 0 and "resume with --resume-from" in out:
            # graceful preemption exit (our deliberate SIGTERM)
            saved = [
                line.split()[-1]
                for line in out.splitlines()
                if line.startswith("saved ")
            ]
            assert saved, "no checkpoint found after SIGTERM"
            resume_dir = saved[-1]
            assert "ckpt_preempt" in resume_dir, resume_dir
            sigterm_done = True
            continue
        if rc == 75:  # watchdog-forced exit during a native stall
            watchdog_exits += 1
            marker = os.path.join(work, "WATCHDOG_EXIT.json")
            assert os.path.exists(marker), (
                "watchdog exit without WATCHDOG_EXIT.json"
            )
            with open(marker) as f:
                resume_dir = json.load(f)["last_completed_checkpoint"]
            os.rename(marker, marker + f".{phase}")
            if not resume_dir:
                print("[soak] watchdog fired before any checkpoint — "
                      "restarting the phase from scratch", flush=True)
            print(f"[soak] watchdog exit at ~iter {last}; resuming "
                  f"from {resume_dir}", flush=True)
            assert watchdog_exits <= 10, "too many watchdog exits"
            continue
        assert rc == 0, f"phase {phase} exit {rc}"
        break
    ev1, ev2 = evals, []  # summary below counts the union
    iters = [r[0] for r in records]
    losses = [r[1] for r in records]
    sper = [r[2] for r in records]
    third = max(1, len(sper) // 3)
    creep = float(np.median(sper[-third:]) / np.median(sper[:third]))
    tb_dirs = [
        os.path.join(work, d) for d in os.listdir(work) if "tb" in d
    ] if os.path.isdir(work) else []

    result = {
        "steps": args.steps,
        "batch_size": args.batch_size,
        "config": args.config,
        "iters_logged": len(records),
        "last_iter": max(iters) if iters else 0,
        "loss_first": losses[0] if losses else None,
        "loss_last": losses[-1] if losses else None,
        "all_finite": bool(np.isfinite(losses).all()) if losses else False,
        "s_per_iter_first_third_median": float(
            np.median(sper[:third])
        ) if sper else None,
        "s_per_iter_last_third_median": float(
            np.median(sper[-third:])
        ) if sper else None,
        "step_time_creep_ratio": creep if sper else None,
        "evals_fired": len(ev1) + len(ev2),
        "eval_lines": (ev1 + ev2)[:6],
        "sigterm_iter": sig_at,
        "resumed_from": resume_dir,
        "resume_line_seen": "resumed from" in out2,
        "watchdog_forced_exits": watchdog_exits,
        "watchdog_deadline_s": args.watchdog_deadline,
    }
    print(json.dumps(result, indent=1))
    assert result["all_finite"], "non-finite loss during soak"
    assert result["last_iter"] >= args.steps - args.log_interval
    assert result["evals_fired"] >= 1, "eval hook never fired"
    assert result["resume_line_seen"], "resume did not restore state"
    if args.json:
        os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
