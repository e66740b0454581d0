"""Pallas border-aware ConvBlock at the standard decoder levels (round 3).

VERDICT r2 / ROADMAP #1's last named mono idea: a conv that computes the
interior AND the exact reflect borders in ONE kernel pass, removing the
per-op strip assembly conv3x3_nopad pays (a full-tensor concat rewrite
per conv). The kernel already exists — ops/pallas/conv_block.py
(conv3x3_elu_pallas, round 1) — and its round-1 decline was specific to
C=16 lane padding at L0; the levels-4..2 ConvBlocks run C in 64..512
where the same kernel measured ~parity with the raw conv. If it reaches
the zero-pad ceiling at these shapes, the strips it replaces are pure
savings.

Times, per conv shape of the judged config (b128 bf16 384x1152):
  exact   — conv3x3_nopad(reflect) + bias + ELU   (production today)
  pallas  — conv3x3_elu_pallas border='reflect'   (one fused pass)
  zero    — zero-pad conv + bias + ELU            (ceiling, wrong borders)

Usage: python -u bench/probe_pallas_levels.py [batch] [iters]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from scenedepthestimation_tpu.ops.collapsed import conv3x3_nopad
from scenedepthestimation_tpu.ops.pallas.conv_block import conv3x3_elu_pallas

DN = ("NHWC", "HWIO", "NHWC")
DTYPE = jnp.bfloat16

# (name, H, W, Cin, Cout) at 384x1152 serving; ResNet-18 encoder widths.
SHAPES = [
    ("u40", 12, 36, 512, 256),
    ("u41", 24, 72, 512, 256),
    ("u30", 24, 72, 256, 128),
    ("u31", 48, 144, 256, 128),
    ("u20", 48, 144, 128, 64),
    ("u21", 96, 288, 128, 64),
    ("u10", 96, 288, 64, 32),
]


def timeit(fn, args, iters=12, warmup=2):
    for _ in range(warmup):
        float(fn(*args, 2))
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args, iters))
        best.append((time.perf_counter() - t0) / iters)
    return sorted(best)[1]


def loop(fn):
    @jax.jit
    def t(x, k, b, n):
        def body(i, acc):
            y = fn(x + (i * 1e-6).astype(DTYPE), k, b)
            return acc + y.mean().astype(jnp.float32)

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    return t


def exact(x, k, b):
    return jax.nn.elu(conv3x3_nopad(x, k, mode="reflect") + b)


def pallas(x, k, b):
    return conv3x3_elu_pallas(x, k, b, activation="elu")


def zero(x, k, b):
    y = lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN
    )
    return jax.nn.elu(y + b)


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    rng = np.random.default_rng(0)
    print(f"batch={batch} dtype=bf16 iters={iters}")
    print(f"{'op':>5} {'exact':>8} {'pallas':>8} {'zero':>8}  max|pal-ex|")
    tot = {"exact": 0.0, "pallas": 0.0, "zero": 0.0}
    for name, h, w, cin, cout in SHAPES:
        x = jnp.asarray(
            rng.standard_normal((batch, h, w, cin)), DTYPE
        )
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, DTYPE)
        b = jnp.asarray(rng.standard_normal((cout,)) * 0.05, DTYPE)
        # exactness first (fp32 small operands)
        xs = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
        ks, bs = k.astype(jnp.float32), jnp.zeros((cout,), jnp.float32)
        d = float(
            jnp.max(jnp.abs(exact(xs, ks, bs) - pallas(xs, ks, bs)))
        )
        ms = {}
        for label, fn in (("exact", exact), ("pallas", pallas), ("zero", zero)):
            try:
                ms[label] = timeit(loop(fn), (x, k, b), iters) * 1e3
            except Exception as e:  # pallas may fail to lower at a shape
                ms[label] = float("nan")
                print(f"  {label} failed at {name}: {type(e).__name__}: {e}")
            else:
                tot[label] += ms[label]
        print(
            f"{name:>5} {ms['exact']:8.2f} {ms['pallas']:8.2f}"
            f" {ms['zero']:8.2f}  {d:.2e}"
        )
    print(
        f"{'TOTAL':>5} {tot['exact']:8.2f} {tot['pallas']:8.2f}"
        f" {tot['zero']:8.2f}"
    )


if __name__ == "__main__":
    main()
