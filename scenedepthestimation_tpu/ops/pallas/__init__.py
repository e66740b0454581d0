"""Pallas TPU kernels for the north-star hot ops (BASELINE.json:5).

Each kernel has a pure-jnp oracle in scenedepthestimation_tpu/ops/*.py;
tests/test_pallas.py pins fp32 equivalence at 1e-6 and bf16 drift bounds
(SURVEY §4.2). Kernels are enabled per-op via the ops-module dispatch
flags once profiled faster than the XLA lowering they replace.
"""
