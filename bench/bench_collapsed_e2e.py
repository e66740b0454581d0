"""End-to-end judged-config bench: collapsed decoder ON vs OFF.

Usage: python -u bench/bench_collapsed_e2e.py [batch] [iters]
"""

from __future__ import annotations

import dataclasses
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from scenedepthestimation_tpu import configs
from scenedepthestimation_tpu.benchmark import run_bench


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    # argv[3]: comma-separated packed,fold pairs like "00,10,11"
    combos = [
        (c[0] == "1", c[1] == "1")
        for c in (sys.argv[3].split(",") if len(sys.argv) > 3 else ["00", "10", "11"])
    ]
    for packed, fold in combos:
        cfg = configs.get("mono_kitti_384x1152_bench")
        name = f"_bench_collapsed_{packed}_{fold}"
        cfg = dataclasses.replace(
            cfg,
            name=name,
            mono=dataclasses.replace(
                cfg.mono, packed_decoder=packed, fold_bn=fold
            ),
        )
        configs.PRESETS[name] = cfg
        r = run_bench(config=name, batch_size=b, iters=iters)
        print(
            f"packed_decoder={packed} fold_bn={fold}: {r['value']:.1f} {r['unit']}"
            f" (vs_baseline {r['vs_baseline']:.0f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
