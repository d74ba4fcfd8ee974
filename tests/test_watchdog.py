"""Preemption watchdog: forced resumable exit during native stalls.

The round-4 soak observed a 25-min native device-RPC stall during which
SIGTERM was undeliverable (Python handlers run only between bytecodes),
making tools/train.py's preemption-checkpoint path unreachable in
exactly the failure mode it exists for (PERF.md "Soak re-examination").
These tests prove the fix (`simpb_tpu/utils/watchdog.py`):

  * unit: a process whose main thread is blocked in an
    EINTR-restarting native sleep (`native_hang`, the stall simulator)
    force-exits with code 75 and a WATCHDOG_EXIT.json recovery marker
    when SIGTERM arrives;
  * unit: a healthy main loop (heartbeats advancing, graceful handler
    acknowledging) is never forced out — the watchdog stands down;
  * CLI (heavy): tools/train.py with fault injection
    (`SIMPB_TEST_NATIVE_HANG`) hit by SIGTERM mid-stall exits 75, and
    `--resume-from` the last periodic checkpoint completes the run —
    the resumable-exit contract end to end.

The reference has no failure detection at all (SURVEY §5).
"""
import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")

UNIT_SCRIPT = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
from simpb_tpu.utils.watchdog import PreemptionWatchdog
from simpb_tpu.data.native_preprocess import native_hang

wd = PreemptionWatchdog(deadline_s=1.0, work_dir={work!r},
                        poll_s=0.05).arm()
wd.record_checkpoint("/ckpt/step_40")
wd.heartbeat(step=40)
print("armed", flush=True)
mode = sys.argv[1]
if mode == "stall":
    # main thread disappears into native code; the Python-level
    # handler can never run — only the watchdog can end this
    assert native_hang(60.0), "native lib unavailable"
    print("hang returned (should not happen)", flush=True)
    sys.exit(9)
else:  # healthy: keep heartbeating; exit gracefully on the signal
    import signal as _s
    stop = []
    _s.signal(_s.SIGTERM, lambda *a: stop.append(1))
    for _ in range(200):
        time.sleep(0.05)
        wd.heartbeat()
        if stop:
            wd.acknowledge()
            print("graceful exit", flush=True)
            sys.exit(0)
    sys.exit(8)
"""


def _run_unit(tmp_path, mode, timeout=60):
    # pre-build the native lib so the child's timeline is not skewed by
    # a first-use g++ compile
    sys.path.insert(0, os.path.abspath(REPO))
    from simpb_tpu.data.native_preprocess import available

    if not available():
        pytest.skip("native preprocess lib unavailable (no g++)")
    work = str(tmp_path / f"wd_{mode}")
    script = UNIT_SCRIPT.format(repo=os.path.abspath(REPO), work=work)
    proc = subprocess.Popen(
        [sys.executable, "-c", script, mode],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    t0 = time.time()
    line = proc.stdout.readline()
    assert "armed" in line, line
    time.sleep(0.3)  # let the stall/loop actually start
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=timeout)
    return proc.returncode, out, work, time.time() - t0


def test_watchdog_forces_resumable_exit_during_native_stall(tmp_path):
    rc, out, work, wall = _run_unit(tmp_path, "stall")
    assert rc == 75, (rc, out)
    assert "forcing" in out and "Recovery point" in out, out
    # far sooner than the 60 s native hang: the watchdog ended it
    assert wall < 30, wall
    marker = os.path.join(work, "WATCHDOG_EXIT.json")
    assert os.path.exists(marker)
    with open(marker) as f:
        rec = json.load(f)
    assert rec["exit_code"] == 75
    assert rec["signal"] == int(signal.SIGTERM)
    assert rec["last_completed_checkpoint"] == "/ckpt/step_40"
    assert rec["last_completed_step"] == 40


def test_watchdog_stands_down_for_healthy_loop(tmp_path):
    rc, out, work, _ = _run_unit(tmp_path, "healthy")
    assert rc == 0, (rc, out)
    assert "graceful exit" in out, out
    assert not os.path.exists(os.path.join(work, "WATCHDOG_EXIT.json"))


@pytest.mark.heavy
def test_train_watchdog_native_stall_then_resume(tmp_path):
    """End to end on the real CLI: fault-inject a native stall at
    iter 4, SIGTERM during it, expect forced exit 75 + marker, then
    resume from the last periodic checkpoint and finish the run."""
    from tests.test_cli_e2e import SRC_H, SRC_W, write_fake_dataset

    pkl = write_fake_dataset(tmp_path)
    work = tmp_path / "work_wd"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        SIMPB_TEST_NATIVE_HANG="4:300",
    )
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "train.py"),
        "--ann-file", pkl, "--config", "tiny", "--batch-size", "1",
        "--max-iters", "6", "--log-interval", "1",
        "--ckpt-interval", "2", "--work-dir", str(work),
        "--watchdog-deadline", "6",
        "--src-h", str(SRC_H), "--src-w", str(SRC_W),
    ]
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env,
    )
    try:
        for line in proc.stdout:
            if "fault-injection" in line:
                break
        else:
            pytest.fail("fault injection line never appeared")
        time.sleep(1.0)
        proc.send_signal(signal.SIGTERM)
        rest, _ = proc.communicate(timeout=600)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 75, (proc.returncode, rest[-3000:])
    marker = work / "WATCHDOG_EXIT.json"
    assert marker.exists(), os.listdir(work)
    with open(marker) as f:
        rec = json.load(f)
    # iters 1..3 ran; the periodic save at iter 2 is the recovery point
    assert rec["last_completed_step"] == 3
    assert rec["last_completed_checkpoint"].endswith("ckpt_2")

    resume = subprocess.run(
        [*cmd, "--resume-from", rec["last_completed_checkpoint"]],
        capture_output=True, text=True,
        env={k: v for k, v in env.items()
             if k != "SIMPB_TEST_NATIVE_HANG"},
        timeout=1200,
    )
    assert resume.returncode == 0, resume.stdout[-3000:]
    assert "resumed from" in resume.stdout
    assert "iter 6/6" in resume.stdout, resume.stdout[-2000:]
