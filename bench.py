#!/usr/bin/env python
"""Driver benchmark entry point: prints ONE JSON line with the judged
metric — KITTI frames/sec/chip at 384x1152 (BASELINE.json:2) — measured
on the real TPU chip. ``vs_baseline`` is speedup over the torch-CPU fp32
forward of the same architecture (goldens/torch_cpu_baseline.json; the
reference itself published no numbers — BASELINE.md)."""

import json
import sys


def main() -> int:
    from scenedepthestimation_tpu.benchmark import parity_abs_rel, run_bench

    result = run_bench(config="mono_kitti_384x1152_bench", iters=32)
    try:
        abs_rel = parity_abs_rel(dtype="float32")
    except Exception:
        abs_rel = None
    line = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "vs_baseline": result["vs_baseline"],
        # second judged component (BASELINE.json:2): abs-rel delta of our
        # fp32 depth vs the torch re-derivation (reference stand-in)
        "abs_rel_delta_fp32": abs_rel,
    }
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
