"""Serving cold-start: persistent compilation cache, measured on-chip.

Builds the judged mono program (384x1152, b128, bf16) in a FRESH
subprocess twice against the same cache directory: the first process
pays the real trace+compile, the second should load the serialized
executable. Reports both wall times and the cache entry count.

Usage: python -u bench/probe_compile_cache.py [config] [batch]
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import subprocess
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parents[1]

CHILD = r"""
import sys, time, os
sys.path.insert(0, {repo!r})
t_import0 = time.perf_counter()
from scenedepthestimation_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache({cache!r}, min_compile_time_secs=0.0)
import dataclasses
import jax, jax.numpy as jnp
import numpy as np
from scenedepthestimation_tpu import configs
from scenedepthestimation_tpu.api import build_mono_program, load_weights
t_import = time.perf_counter() - t_import0

cfg = configs.get({config!r})
if {batch!r} is not None:
    cfg = dataclasses.replace(cfg, batch_size={batch!r})
predictor = load_weights(None, cfg, seed=0)
program = build_mono_program(cfg, predictor.model)
x = np.zeros((cfg.batch_size, cfg.height, cfg.width, 3), np.uint8)

t0 = time.perf_counter()
out = program(predictor.variables, x)
jax.block_until_ready(out)
t_first = time.perf_counter() - t0
print("CHILD_RESULT " + repr((t_import, t_first)))
"""


def run_child(cache: str, config: str, batch) -> tuple:
    code = CHILD.format(repo=str(REPO), cache=cache, config=config, batch=batch)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=900,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return eval(line.split(" ", 1)[1])
    raise RuntimeError(f"child failed:\n{out.stdout}\n{out.stderr}")


def main() -> int:
    config = sys.argv[1] if len(sys.argv) > 1 else "mono_kitti_384x1152_bench"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else None
    cache = tempfile.mkdtemp(prefix="sde_cc_probe_")
    try:
        imp_cold, first_cold = run_child(cache, config, batch)
        entries = len(os.listdir(cache))
        imp_warm, first_warm = run_child(cache, config, batch)
        print(
            json.dumps(
                {
                    "config": config,
                    "cold_first_call_s": round(first_cold, 2),
                    "warm_first_call_s": round(first_warm, 2),
                    "speedup": round(first_cold / first_warm, 1),
                    "import_s": round(imp_warm, 2),
                    "cache_entries": entries,
                    "cache_mb": round(
                        sum(
                            f.stat().st_size
                            for f in pathlib.Path(cache).rglob("*")
                            if f.is_file()
                        )
                        / 1e6,
                        1,
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(cache, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
