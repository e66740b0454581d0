"""A/B the packed/collapsed stereo forward inside the TRAIN steps
(StereoConfig.collapsed_train) — the round-3 continuation lever: the
inference packed agg won +108% at config-5 b16; this measures the same
rewrite embedded in the supervised/selfsup train steps (forward AND
backward through the collapsed form).

Usage: python -u bench/probe_stereo_train_collapsed.py [iters]
"""

from __future__ import annotations

import dataclasses
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from scenedepthestimation_tpu import benchmark
from scenedepthestimation_tpu.configs import get


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rows = [
        ("stereo_256x512_b4", "supervised", 16),
        ("stereo_256x512_b4", "selfsup", 16),
        ("stereo_kitti2015_b16_bf16_v5e8", "supervised", 8),
    ]
    for name, mode, b in rows:
        for collapsed in (False, True):
            cfg = get(name)
            cfg = dataclasses.replace(
                cfg,
                stereo=dataclasses.replace(
                    cfg.stereo, collapsed_train=collapsed
                ),
            )
            r = benchmark.run_train_bench(
                cfg, mode=mode, batch_size=b, iters=iters
            )
            print(
                f"{name} {mode} b={b} collapsed={collapsed}: "
                f"{r['value']:8.1f} fps/chip ({r['step_ms']:.1f} ms/step)",
                flush=True,
            )


if __name__ == "__main__":
    main()
