#!/usr/bin/env python
"""Driver benchmark entry point: prints ONE JSON line with the judged
metric — KITTI frames/sec/chip at 384x1152 (BASELINE.json:2) — measured
on the real TPU chip. ``vs_baseline`` is speedup over the torch-CPU fp32
forward of the same architecture (goldens/torch_cpu_baseline.json; the
reference itself published no numbers — BASELINE.md)."""

import json
import sys


def main() -> int:
    from scenedepthestimation_tpu.benchmark import run_bench

    result = run_bench(config="mono_kitti_384x1152_bench", iters=32)
    line = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "vs_baseline": result["vs_baseline"],
    }
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
