"""XLA flag sweep on the judged config (and optionally config-5).

Each flag set runs run_bench in a fresh subprocess (XLA_FLAGS is read
at backend init, so in-process toggling is impossible). Compares
against the no-flag baseline measured the same way, same session.

RESULT (2026-08-19, this box): the axon PJRT jaxlib REJECTS the
standard TPU tuning flags — ``--xla_tpu_scoped_vmem_limit_kib`` and
``--xla_tpu_enable_latency_hiding_scheduler`` both die with "Unknown
flag in XLA_FLAGS" (fatal abort at backend init), so XLA flag tuning
is unavailable on this toolchain. Baseline re-measured 1680.0
fps/chip (within run-to-run noise of the recorded 1682.0).

Usage: python -u bench/probe_xla_flags.py [config] [iters]
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]

FLAG_SETS = {
    "baseline": "",
    "vmem64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem96m": "--xla_tpu_scoped_vmem_limit_kib=98304",
    "lhs": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "vmem64m+lhs": (
        "--xla_tpu_scoped_vmem_limit_kib=65536 "
        "--xla_tpu_enable_latency_hiding_scheduler=true"
    ),
}

CHILD = r"""
import json, sys
sys.path.insert(0, {repo!r})
from scenedepthestimation_tpu.benchmark import run_bench
r = run_bench(config={config!r}, iters={iters})
print("RESULT " + json.dumps(r))
"""


def main():
    config = sys.argv[1] if len(sys.argv) > 1 else "mono_kitti_384x1152_bench"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    for name, flags in FLAG_SETS.items():
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        code = CHILD.format(repo=str(REPO), config=config, iters=iters)
        try:
            out = subprocess.run(
                [sys.executable, "-c", code], env=env, timeout=900,
                capture_output=True, text=True,
            )
            line = next(
                (l for l in out.stdout.splitlines() if l.startswith("RESULT ")),
                None,
            )
            if line:
                r = json.loads(line[len("RESULT "):])
                print(f"{name:14s} {r['value']:8.1f} {r['unit']}", flush=True)
            else:
                tail = (out.stdout + out.stderr).strip().splitlines()[-3:]
                print(f"{name:14s} FAILED rc={out.returncode}: {tail}",
                      flush=True)
        except subprocess.TimeoutExpired:
            print(f"{name:14s} TIMEOUT", flush=True)


if __name__ == "__main__":
    main()
