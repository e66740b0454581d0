"""E2E judged metric with the fused tail v2 forced ON vs OFF
(same-process back-to-back A/B — compare within this run, not across
sessions; the harness has ~±1.5% session drift).

Usage: python -u bench/probe_fused_v2_e2e.py [batch] [iters]
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
    for label, flag in [("off", None), ("v2", "v2"), ("off2", None)]:
        collapsed.set_use_fused_tail(flag)
        try:
            r = run_bench(
                config="mono_kitti_384x1152_bench",
                batch_size=b,
                iters=iters,
            )
        finally:
            collapsed.set_use_fused_tail(None)
        print(f"fused_tail={label}: {r['value']:8.1f} {r['unit']}", flush=True)


if __name__ == "__main__":
    main()
