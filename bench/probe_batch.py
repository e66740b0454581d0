"""Batch sweep of the judged mono config (384x1152 bf16).

The preset rides b128; the b-sweep in round 1 stopped there. Per-op
fixed costs keep amortizing past b128 while HBM lasts (activations at
b128 peak ~6 GB of the 16 GB v5e HBM), so probe upward before pinning
the bench.py default.

Usage: python -u bench/probe_batch.py [b,b,...] [iters]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from scenedepthestimation_tpu.benchmark import run_bench


def main():
    batches = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [96, 128, 160, 192, 256]
    )
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    for b in batches:
        try:
            r = run_bench(
                config="mono_kitti_384x1152_bench", batch_size=b, iters=iters
            )
            print(f"b={b:4d}: {r['value']:8.1f} {r['unit']}", flush=True)
        except Exception as e:  # OOM at the top of the sweep is data too
            print(f"b={b:4d}: FAILED ({type(e).__name__})", flush=True)


if __name__ == "__main__":
    main()
