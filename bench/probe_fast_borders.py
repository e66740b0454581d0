"""Measure the fast-border serving mode (MonoConfig.fast_borders).

The round-3 ceiling probe showed the border machinery costs ~8% of the
judged iteration (1822 zero-border ceiling vs 1682 exact). This probe
productizes that measurement: fps at the judged config AND the abs-rel
delta vs the torch re-derivation (fp32 + bf16) so the accuracy cost of
the zero-pad borders is recorded next to the speed.

Usage: python -u bench/probe_fast_borders.py [batch] [iters]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from scenedepthestimation_tpu.benchmark import parity_abs_rel, run_bench


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    for fast in (False, True):
        ov = {"mono.fast_borders": fast}
        r = run_bench(
            config="mono_kitti_384x1152_bench", batch_size=b, iters=iters,
            overrides=ov,
        )
        ar32 = parity_abs_rel(dtype="float32", overrides=ov)
        ar16 = parity_abs_rel(dtype="bfloat16", overrides=ov)
        print(
            f"fast_borders={fast}: {r['value']:.1f} {r['unit']}"
            f"  abs_rel fp32={ar32:.2e} bf16={ar16:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
