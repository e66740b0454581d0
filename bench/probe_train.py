"""Train-step throughput on the real chip (SURVEY C18) — the first
recorded training-perf rows. Supervised + self-sup, mono + stereo, at
the training-realistic shapes (192x640 mono / 256x512 stereo like the
reference family trains, plus the judged 384x1152 shapes).

Usage: python -u bench/probe_train.py [iters]
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from scenedepthestimation_tpu.benchmark import run_train_bench


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    runs = [
        ("mono_kitti_192x640_fp32", "supervised", 16),
        ("mono_kitti_192x640_fp32", "selfsup", 16),
        ("mono_kitti_384x1152_bench", "supervised", 16),
        ("stereo_256x512_b4", "supervised", 16),
        ("stereo_256x512_b4", "selfsup", 16),
        ("stereo_kitti2015_b16_bf16_v5e8", "supervised", 8),
    ]
    for config, mode, b in runs:
        try:
            r = run_train_bench(
                config=config, mode=mode, batch_size=b, iters=iters
            )
            print(json.dumps(r), flush=True)
        except Exception as e:
            print(f"{config}/{mode}/b{b}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
