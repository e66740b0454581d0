"""Measure the stereo_kitti2015_latency_d96 preset (ROADMAP r3 #2).

Halving the disparity range (192 -> 96 px full-res, D 48 -> 24 at the
feature stride) halves the correlation sweep and the aggregation input
width; this probe records what that buys at the two serving operating
points (b2 = the literal config-5 per-chip batch, b16 = the
preset-as-written batch) next to the full-range numbers.

Usage: python -u bench/probe_d96.py [b,b] [iters]
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
        else [2, 16]
    )
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    for b in batches:
        it = max(iters, 256 // b)
        for config in (
            "stereo_kitti2015_b16_bf16_v5e8",
            "stereo_kitti2015_latency_d96",
        ):
            r = run_bench(config=config, batch_size=b, iters=it)
            print(
                f"b={b:3d}/chip {config}: {r['value']:8.1f} {r['unit']}",
                flush=True,
            )


if __name__ == "__main__":
    main()
