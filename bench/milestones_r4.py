"""One-session re-measure of ALL five milestone configs on current code
(VERDICT r3 weak-#1 / next-#3: three rows of the BASELINE.md milestone
table were stale — r1/r2 numbers for code that has since gained the
nopad/collapsed/bordered-carry/fused-tail levers).

Same fori-amortized run_bench harness for every row, one process, one
session — the only comparison the axon tunnel permits (memory-lessons:
cross-session numbers drift +-1.5-2%). The judged config rides along as
the session cross-check against BENCH_r03's 1682.
"""

import json
import os

os.environ.setdefault("SCENEDEPTH_COMPILE_CACHE", "")

from scenedepthestimation_tpu import benchmark  # noqa: E402

RUNS = [
    # (label, preset, batch, iters) — small batches need iters >= 128
    # or tunnel dispatch pollutes ~25% (memory-lessons).
    ("config-1 mono 192x640 fp32 b64", "mono_kitti_192x640_fp32", 64, 64),
    ("config-2 NYU 480x640 fp32 b64", "mono_nyu_480x640_b8", 64, 32),
    ("config-3 eval-path 192x640 fp32 b8", "mono_eigen_eval", 8, 128),
    ("config-4 stereo 256x512 fp32 b4", "stereo_256x512_b4", 4, 128),
    ("config-5 stereo 384x1152 bf16 b16", "stereo_kitti2015_b16_bf16_v5e8", 16, 32),
    ("config-5 literal b2/chip", "stereo_kitti2015_b16_bf16_v5e8", 2, 128),
    ("judged mono 384x1152 bf16 b128", "mono_kitti_384x1152_bench", 128, 32),
]


def main():
    for label, cfg, b, iters in RUNS:
        r = benchmark.run_bench(cfg, batch_size=b, iters=iters)
        print(
            json.dumps(
                {
                    "label": label,
                    "fps_per_chip": r["value"],
                    "batch_size": r["batch_size"],
                    "dtype": r["dtype"],
                    "iters": r["iters"],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
