"""A/B the paired preprocess+tower feed (api._PAIRED_PRE).

ROADMAP r3 #2: merge the L/R views before preprocess so preprocess and
the feature tower each run ONCE over the interleaved (2B, ...) stack —
halving their fixed per-op costs at small batch. Config-5 shape
(384x1152 bf16), b in {2, 16} per chip.

Usage: python -u bench/probe_paired.py [b,b] [iters]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from scenedepthestimation_tpu import api
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
        for paired in (False, True):
            api.set_paired_pre(paired)
            r = run_bench(
                config="stereo_kitti2015_b16_bf16_v5e8",
                batch_size=b,
                iters=it,
            )
            print(
                f"b={b:3d}/chip paired={paired}: {r['value']:8.1f} {r['unit']}",
                flush=True,
            )
    api.set_paired_pre(True)


if __name__ == "__main__":
    main()
