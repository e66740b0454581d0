"""A/B the bordered-carry start point: tail-only vs u10 vs u21.

_BORDERED_U21 starts the carry at upconv_2_1 — the largest strip
assembly outside the tail (+3.67 ms isolated per probe_border_cost) —
at the cost of two extra width units through every tail band (final
w=10 at the 192x576 grid). Judged config (mono bf16 b128 384x1152),
perturbed-operand fori_loop harness via run_bench.

Usage: python -u bench/probe_u21.py [batch] [iters]
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
    for label, kw in (
        ("tail", dict(u10=False, u21=False)),
        ("u10", dict(u10=True, u21=False)),
        ("u21", dict(u10=False, u21=True)),
    ):
        collapsed.set_use_bordered(True, full=False, **kw)
        r = run_bench(config="mono_kitti_384x1152_bench", batch_size=b, iters=iters)
        print(f"start={label}: {r['value']:.1f} {r['unit']}", flush=True)
    collapsed.set_use_bordered(True, full=False, u10=False, u21=False)


if __name__ == "__main__":
    main()
