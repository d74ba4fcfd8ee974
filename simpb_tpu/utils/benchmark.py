"""Shared streaming-throughput measurement core.

Methodology (see repo-root bench.py docstring): the whole frame window
runs ON DEVICE via `lax.scan` with the temporal state as carry — one
dispatch, so the axon tunnel's per-call RTT amortises away and the
number reflects device throughput of the full per-frame pipeline.
Inputs vary per frame (unchanged inputs are served from a tunnel cache
— CLAUDE.md), and sync is via value fetch (`np.asarray`), the only
reliable barrier through the tunnel.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models.detector import SimPB
from ..models.instance_bank import TemporalState
from .synthetic import install_synthetic_anchors, synthetic_rig


def device_peak_memory(device=None):
    """Peak device (HBM) bytes in use, or None when the backend does
    not expose memory statistics.

    The reference benchmark reports fps AND peak CUDA memory
    (reference tools/benchmark.py:100-113, torch.cuda.max_memory_
    allocated); this is the TPU-side equivalent via PJRT
    `device.memory_stats()`, with a graceful n/a for backends that
    return nothing (the axon tunnel device returns None — serving
    peaks there come from the compiled executable's
    `memory_analysis()` instead, see `run_benchmark(return_stats=
    True)`, which is also the more deployment-faithful number: it is
    the HBM XLA actually reserves for the program).
    """
    try:
        dev = device if device is not None else jax.local_devices()[0]
        stats = dev.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    for key in ("peak_bytes_in_use", "peak_bytes", "bytes_in_use"):
        if key in stats:
            return int(stats[key])
    return None


def run_benchmark(
    cfg, window: int = 128, batch_size: int = 1,
    return_stats: bool = False,
):
    """Returns six-camera frames/sec/chip for `cfg` (with
    `return_stats=True`: `(fps, stats)` where stats carries
    `peak_hbm_bytes` from the compiled executable's XLA memory
    analysis — the HBM the program actually reserves; None when the
    backend provides neither analysis nor runtime memory_stats).

    Each frame is generated ON DEVICE inside the scan body from a
    per-frame PRNG key (per-frame-varied inputs — the tunnel result
    cache requires it — without materialising window x 13 MB of frames
    in HBM), and the whole window runs in one dispatch so the ~30-90 ms
    tunnel RTT amortises to <1% of the measurement. Frame generation
    adds ~0.05 ms/frame of device work, charged against the number.
    """
    model = SimPB(cfg)
    bs, cams = batch_size, cfg.head.num_cams
    w, h = cfg.input_size

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(bs, cams, h, w, 3)).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(17), window)
    proj = jnp.asarray(synthetic_rig(bs, image_wh=(w, h)))
    variables = jax.jit(
        lambda: model.init(
            {
                "params": jax.random.PRNGKey(0),
                "aug": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2),
                "sampling": jax.random.PRNGKey(3),
            },
            img,
            proj,
            train=False,
        )
    )()
    variables = install_synthetic_anchors(variables, cfg.head.num_anchor)

    state = TemporalState.init(
        bs, cfg.head.num_temp_instances, cfg.head.num_anchor,
        cfg.head.embed_dims,
    )
    dt = jnp.full((bs,), 0.5)
    t2c = jnp.tile(jnp.eye(4)[None], (bs, 1, 1))

    from ..models.decoder3d import decode_boxes3d

    @jax.jit
    def rollout(variables, keys, proj, state, dt, t2c):
        def body(carry, key):
            frame = jax.random.normal(
                key, (bs, cams, h, w, 3), jnp.float32
            )
            guard_probe = 0.0
            if getattr(cfg.head, "guard_sampling", False):
                # charge the in-graph exactness counters against the
                # number — the guarded config's eval surface always
                # computes them (training/evaluate.py)
                from .guards import summarize_guards

                out, mut = model.apply(
                    variables, frame, proj, temporal=carry,
                    time_interval=dt, temp2cur=t2c, train=False,
                    mutable=["guards"],
                )
                for v in summarize_guards(mut.get("guards", {})).values():
                    guard_probe = guard_probe + v
            else:
                out = model.apply(
                    variables, frame, proj, temporal=carry,
                    time_interval=dt, temp2cur=t2c, train=False,
                )
            # charge the device-side decode (top-k + box decode) against
            # the number too — the reference's benchmark path runs
            # simple_test -> post_process (tools/benchmark.py:100-113);
            # reducing over the decode outputs keeps it live under DCE
            dec = decode_boxes3d(
                out["classification"][-1],
                out["prediction"][-1],
                instance_id=out.get("instance_id"),
                quality=out["quality"][-1],
                num_output=cfg.head.num_output,
                score_threshold=cfg.head.score_threshold,
            )
            probe = (
                dec["scores_3d"].max() + dec["boxes_3d"].sum() + guard_probe
            )
            return out["temporal_state"], probe

        return jax.lax.scan(body, state, keys)

    # AOT compile so the executable's memory analysis (peak HBM the
    # program reserves) is readable; the compiled object then serves
    # the timed calls — no second trace/compile
    compiled = rollout.lower(
        variables, keys, proj, state, dt, t2c
    ).compile()
    peak_bytes = None
    try:
        ma = compiled.memory_analysis()
        peak_bytes = getattr(ma, "peak_memory_in_bytes", None)
        if peak_bytes is not None:
            peak_bytes = int(peak_bytes)
    except Exception:
        pass
    if peak_bytes is None:
        peak_bytes = device_peak_memory()

    final_state, scores = compiled(variables, keys, proj, state, dt, t2c)
    np.asarray(scores)  # warm; value fetch is the only sync

    t0 = time.perf_counter()
    final_state, scores = compiled(
        variables, keys, proj, final_state, dt, t2c
    )
    np.asarray(scores)
    elapsed = time.perf_counter() - t0
    fps = window * bs / elapsed
    if return_stats:
        return fps, {"peak_hbm_bytes": peak_bytes}
    return fps
