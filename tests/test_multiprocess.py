"""True multi-process (jax.distributed) training over CPU processes.

The reference trains as N processes x 1 GPU under DDP
(tools/dist_train.sh:7-9 + apis/mmdet_train.py:93-135). The JAX-native
equivalent is `jax.distributed.initialize` + a global mesh; this test
launches TWO real OS processes (2 local CPU devices each -> a 4-device
global mesh) against a localhost coordinator and runs the actual
training CLI end to end: per-process host pipelines feeding local batch
rows into `jax.make_array_from_process_local_data`, the pjit train step
over the global mesh, the rank-0 checkpoint write (with the
stream-state allgather), and the disk-gather mid-training eval with its
cross-host barrier. This is the strongest multi-host evidence
obtainable without a TPU pod.
"""
import os
import socket
import subprocess
import sys
import tempfile

from tests.test_cli_e2e import SRC_H, SRC_W, write_fake_dataset
import pytest

pytestmark = pytest.mark.heavy

REPO = os.path.join(os.path.dirname(__file__), "..")
# both ranks compile the identical train step: share a persistent
# compile cache (also warms re-runs — the CPU train-step compile is
# minutes long)
CACHE = os.path.join(tempfile.gettempdir(), "simpb_jax_compile_cache")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_ckpt_eval(tmp_path):
    pkl = write_fake_dataset(tmp_path, n_frames=8, gap_at=4)
    work = tmp_path / "work_mp"
    port = _free_port()

    # subprocess output goes to FILES, not pipes: an undrained pipe
    # from one rank can block it mid-write while the other rank waits
    # at a jax.distributed collective -> mutual hang until timeout
    procs, logs = [], []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COMPILATION_CACHE_DIR=CACHE,
            JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="10",
        )
        log = open(tmp_path / f"rank{pid}.log", "w+")
        logs.append(log)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, os.path.join(REPO, "tools", "train.py"),
                    "--ann-file", pkl, "--config", "tiny",
                    "--batch-size", "1",
                    "--max-iters", "2", "--log-interval", "1",
                    "--ckpt-interval", "2", "--work-dir", str(work),
                    "--src-h", str(SRC_H), "--src-w", str(SRC_W),
                    "--eval-ann-file", pkl, "--eval-interval", "2",
                    "--eval-frames", "2",
                    "--multihost",
                    "--coordinator", f"localhost:{port}",
                    "--num-processes", "2", "--process-id", str(pid),
                ],
                stdout=log, stderr=subprocess.STDOUT, text=True, env=env,
            )
        )

    outs = []
    try:
        for p, log in zip(procs, logs):
            p.wait(timeout=2200)
            log.seek(0)
            outs.append(log.read())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.close()

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-5000:]}"
    out0, out1 = outs
    # rank 0 logs the (replicated) loss and the gathered eval metrics
    assert "loss" in out0, out0
    assert "eval @ iter 2" in out0, out0
    # non-zero ranks stay quiet on loss logging and hold no metrics
    assert "eval @ iter" not in out1, out1
    # rank 0 wrote the single full checkpoint (stream state allgathered)
    assert (work / "ckpt_2").exists()
    # the disk-gather eval ran over the shared work dir
    gather = work / "eval_gather_2"
    assert (gather / "part_0.pkl").exists()
    assert (gather / "part_1.pkl").exists()
    if "new best NDS" in out0:
        assert (work / "ckpt_best").exists()
