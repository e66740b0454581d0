"""A/B the _BORDERED_U10 carry-start (bordered carry from upconv_1_0).

The tail carry (round 3) starts at upconv_1_1; starting one conv
earlier removes u10's strip assembly (+2.0 ms isolated per
probe_border_cost) at the cost of one extra width unit through every
tail band. Judged config (mono bf16 b128 384x1152), perturbed-operand
fori_loop harness via run_bench.

Usage: python -u bench/probe_u10.py [batch] [iters]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from scenedepthestimation_tpu.benchmark import run_bench
from scenedepthestimation_tpu.ops import collapsed


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    for u10 in (False, True):
        collapsed.set_use_bordered(True, full=False, u10=u10)
        r = run_bench(config="mono_kitti_384x1152_bench", batch_size=b, iters=iters)
        print(f"u10={u10}: {r['value']:.1f} {r['unit']}", flush=True)
    collapsed.set_use_bordered(True, full=False, u10=False)


if __name__ == "__main__":
    main()
