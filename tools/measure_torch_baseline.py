#!/usr/bin/env python
"""Measure the reference-CPU denominator for the 10x north-star target
(BASELINE.md "To fill in"): torch-2.13-CPU fp32 forward of the config-1
architecture (ResNet-18 U-Net mono) at the judged 384x1152 shape.

Writes goldens/torch_cpu_baseline.json. Run once per machine."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import torch
import torch_ref


def main() -> int:
    torch.manual_seed(0)
    model = torch_ref.MonoDepthNet().eval()
    x = torch.randn(1, 3, 384, 1152)
    with torch.no_grad():
        for _ in range(3):  # warmup
            model(x)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            model(x)
        dt = time.perf_counter() - t0
    fps = iters / dt
    out = {
        "frames_per_sec": round(fps, 4),
        "what": "torch-2.13-cpu fp32 mono ResNet18-UNet forward, b1 @ 384x1152",
        "machine": f"{os.cpu_count()} cpu core(s)",
        "iters": iters,
        "note": "reference published no numbers (BASELINE.json published:{}); "
        "this is the torch-CPU re-derivation denominator per SURVEY.md §6",
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "goldens",
        "torch_cpu_baseline.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
