"""simpb_tpu: TPU-native rebuild of SimPB (ECCV 2024) in JAX/XLA/Pallas.

A single query-based model for simultaneous multi-camera 2D and BEV 3D
detection on nuScenes, re-architected TPU-first (see SURVEY.md for the
structural analysis of the reference implementation this build follows).
"""

__version__ = "0.1.0"
