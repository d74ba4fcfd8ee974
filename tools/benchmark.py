#!/usr/bin/env python
"""Inference throughput benchmark (reference tools/benchmark.py parity).

Thin alias of the repo-root `bench.py` (the driver's canonical entry),
kept under tools/ to mirror the reference tool layout.
"""
import os
import runpy
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if __name__ == "__main__":
    runpy.run_path(
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
        run_name="__main__",
    )
