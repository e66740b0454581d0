"""Config-5 operating-point sweep (VERDICT r2 next-#3).

SURVEY §3.4 defines config 5 as GLOBAL batch 16 over a v5e-8 mesh —
i.e. b=2 PER CHIP. Every round-2 record was b>=16 per chip; this sweep
records the faithful small-batch points so BASELINE.md can state
per-chip throughput per operating point (b in {2,4,8,16,64}).

Usage: python -u bench/sweep_config5.py [b,b,b] [iters]
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
        else [2, 4, 8, 16, 64]
    )
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    for b in batches:
        # More iters at small b: per-iteration time is ~1.6 ms at b2 and
        # the on-device loop amortizes the single dispatch either way.
        it = max(iters, 256 // b)
        r = run_bench(
            config="stereo_kitti2015_b16_bf16_v5e8", batch_size=b, iters=it
        )
        print(
            f"b={b:3d}/chip: {r['value']:8.1f} {r['unit']}"
            f"  ({1000.0 * b / r['value']:.3f} ms/step)",
            flush=True,
        )


if __name__ == "__main__":
    main()
