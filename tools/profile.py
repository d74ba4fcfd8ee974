#!/usr/bin/env python
"""Profiling harness: per-op device-time breakdown of the streaming step.

The reference's only profiling support was a commented-out torch profiler
hook (apis/mmdet_train.py:160-163) and wall-clock FPS in
tools/benchmark.py. This tool captures a `jax.profiler` trace of the
full streaming inference step (or the training step with --train) and
prints the per-op device-time table, plus writes the raw trace for
TensorBoard/Perfetto.

Usage:
  python tools/profile.py [--train] [--out /tmp/simpb_trace] [--frames 4]
"""
import argparse
import dataclasses
import glob
import gzip
import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# the axon sitecustomize pre-registers the TPU backend regardless of the
# JAX_PLATFORMS env var; honour the env explicitly
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/simpb_trace")
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--train", action="store_true")
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args()

    from simpb_tpu.configs.base import simpb_r50_704x256
    from simpb_tpu.models.detector import SimPB
    from simpb_tpu.models.instance_bank import TemporalState

    cfg = dataclasses.replace(
        simpb_r50_704x256(), compute_dtype="bfloat16"
    )
    model = SimPB(cfg)
    bs = 1
    w, h = cfg.input_size
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.normal(size=(args.frames, bs, 6, h, w, 3)).astype(np.float32)
    )
    proj = jnp.asarray(
        np.tile(np.eye(4, dtype=np.float32), (bs, 6, 1, 1)) * 100.0
    )
    dt = jnp.full((bs,), 0.5)
    t2c = jnp.tile(jnp.eye(4)[None], (bs, 1, 1))
    variables = jax.jit(
        lambda: model.init(
            {
                "params": jax.random.PRNGKey(0),
                "aug": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2),
                "sampling": jax.random.PRNGKey(3),
            },
            imgs[0], proj, train=False,
        )
    )()
    state = TemporalState.init(
        bs, cfg.head.num_temp_instances, cfg.head.num_anchor,
        cfg.head.embed_dims,
    )

    @jax.jit
    def rollout(v, imgs, proj, st):
        def body(carry, frame):
            out = model.apply(
                v, frame, proj, temporal=carry, time_interval=dt,
                temp2cur=t2c, train=False,
            )
            return out["temporal_state"], out["classification"][-1].max()
        return jax.lax.scan(body, st, imgs)

    fs, sc = rollout(variables, imgs, proj, state)
    np.asarray(sc)

    jax.profiler.start_trace(args.out)
    fs, sc = rollout(variables, imgs, proj, fs)
    np.asarray(sc)
    jax.profiler.stop_trace()

    files = sorted(
        glob.glob(os.path.join(args.out, "**/*.trace.json.gz"),
                  recursive=True)
    )
    if not files:
        print(f"trace written to {args.out} (no parseable events found)")
        return
    ev = json.load(gzip.open(files[-1]))["traceEvents"]
    dur = Counter()
    for e in ev:
        name = e.get("name", "")
        if e.get("ph") == "X" and "dur" in e and not name.startswith(
            ("$", "jit_", "Pjit")
        ):
            dur[name.split(".")[0]] += e["dur"]
    total = sum(dur.values())
    print(f"total device time: {total / 1000:.2f} ms over {args.frames} frames")
    for k, d in dur.most_common(args.top):
        print(f"{d / (args.frames * 1000):9.3f} ms/frame  {k}")
    print(f"raw trace: {files[-1]}")


if __name__ == "__main__":
    main()
