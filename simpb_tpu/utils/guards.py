"""Aggregation of in-graph sampling-exactness guard counters.

The capped/windowed sampling configs (configs/base.py:
`simpb_r50_704x256_guarded`, the `_fast` family with
`guard_sampling=True`) sow per-layer overflow counters into the flax
"guards" collection (models/dfa.py, models/group_attn.py). This module
reduces that nested collection to a flat `{counter_name: scalar}`
summary — the per-frame maximum across layers — so evals can surface
"exactness held" as a checked number instead of a study-time
observation (VERDICT.md round-2 item 1b; semantics being guarded:
reference ops/src/deformable_aggregation_cuda.cu:129-187).

Counter meanings (0 ⇒ the frame's sampling was bit-equivalent to the
uncapped exact semantics):
  dfa_overflow            in-range DFA (anchor, keypoint) demand beyond
                          `dfa_gather_capacity` (dropped keypoints)
  msda_overflow           valid 2D slots beyond `msda_gather_capacity`
  msda_window_clamped     patch-mode samples whose bilinear stencil was
                          not fully served by the window
  msda_window_clamped_mass  attention mass on those samples
  msda_level_dropped_mass / dfa_level_dropped_mass
                          softmax mass on non-top-k levels under
                          `*_sel_levels`
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def summarize_guards(tree) -> Dict[str, jnp.ndarray]:
    """Flatten a sown "guards" collection to {name: max-across-layers}.

    Leaves are the tuples flax `sow` accumulates (one entry per call);
    identical counter names from different layers reduce by max. Works
    on traced values (used inside jitted eval steps).
    """
    out: Dict[str, jnp.ndarray] = {}

    def walk(node):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v)
            else:
                vals = v if isinstance(v, (tuple, list)) else (v,)
                m = None
                for x in vals:
                    x = jnp.max(jnp.asarray(x))
                    m = x if m is None else jnp.maximum(m, x)
                if m is not None:
                    out[k] = jnp.maximum(out[k], m) if k in out else m

    walk(tree)
    return out


def merge_guard_maxima(
    a: Dict[str, float], b: Dict[str, float]
) -> Dict[str, float]:
    """Max-merge two host-side guard summaries (across frames/ranks)."""
    out = dict(a)
    for k, v in b.items():
        out[k] = max(out.get(k, 0.0), float(v))
    return out


def check_guard_violations(metrics: Dict[str, float]) -> list:
    """Names of `guard_*` metric entries whose maxima are nonzero.

    Nonzero means at least one frame's sampling deviated from the exact
    semantics the guarded configs promise (configs/base.py:
    `simpb_r50_704x256_guarded` — "the guard counters prove it per
    frame"). Callers surfacing eval metrics should treat a non-empty
    return as a contract violation: `tools/test.py` exits nonzero on
    it. NaN maxima (no frames evaluated) are not violations.
    """
    import math

    return sorted(
        k
        for k, v in metrics.items()
        if k.startswith("guard_")
        # `*_demand` counters are capacity-headroom STATS (how much of
        # a cap was used), not violations — only overflow/clamp/dropped
        # counters mean the exactness contract broke
        and not k.endswith("_demand")
        and v is not None
        and not math.isnan(float(v))
        and float(v) != 0.0
    )
