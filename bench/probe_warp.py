"""Where do the self-sup train steps' 1140/262 ms go? Isolate the
horizontal warp (gather) forward + backward at the mono-selfsup shapes,
and A/B the candidate fixes:

  * stop_gradient on the warped SOURCE image (it is data — the scatter
    -add backward for the gather is pure waste);
  * one-hot matmul warp (gather → MXU contraction) for the forward.

Usage: python -u bench/probe_warp.py [batch] [iters]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax import lax

from scenedepthestimation_tpu.ops.warp import warp_horizontal


def timeit(fn, args, iters=10, warmup=2):
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
    def t(img, disp, n):
        def body(i, acc):
            y = fn(img, disp + i * 1e-6)
            return acc + y

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    return t


def warp_onehot(img, disp):
    """One-hot matmul warp: recon[.., w, c] = sum_w' M[.., w, w'] I[.., w', c]."""
    b, h, w, c = img.shape
    x = jnp.arange(w, dtype=disp.dtype)[None, None, :]
    src = jnp.clip(x - disp, 0.0, w - 1.0)
    x0 = jnp.floor(src)
    f = src - x0
    i0 = x0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, w - 1)
    cols = jnp.arange(w, dtype=jnp.int32)[None, None, None, :]  # (1,1,1,W')
    m = (cols == i0[..., None]).astype(img.dtype) * (1.0 - f)[..., None] + (
        cols == i1[..., None]
    ).astype(img.dtype) * f[..., None]
    return jnp.einsum(
        "bhwk,bhkc->bhwc", m, img, preferred_element_type=jnp.float32
    )


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    h, w = 192, 640
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (b, h, w, 3), jnp.float32)
    disp = jax.random.uniform(key, (b, h, w), jnp.float32) * 60.0
    jax.block_until_ready(img)

    import numpy as np

    ref = np.asarray(warp_horizontal(img[:2], disp[:2]))
    got = np.asarray(warp_onehot(img[:2], disp[:2]))
    print("onehot max|diff|:", float(np.abs(got - ref).max()), flush=True)

    def g_full(i_, d_):
        return jax.grad(lambda dd: warp_horizontal(i_, dd).mean())(d_).mean()

    def g_stop(i_, d_):
        return jax.grad(
            lambda dd: warp_horizontal(lax.stop_gradient(i_), dd).mean()
        )(d_).mean()

    def g_onehot(i_, d_):
        return jax.grad(
            lambda dd: warp_onehot(lax.stop_gradient(i_), dd).mean()
        )(d_).mean()

    for name, fn in [
        ("gather fwd        ", lambda i_, d_: warp_horizontal(i_, d_).mean()),
        ("onehot fwd        ", lambda i_, d_: warp_onehot(i_, d_).mean()),
        ("gather grad full  ", g_full),
        ("gather grad stopimg", g_stop),
        ("onehot grad stopimg", g_onehot),
    ]:
        ms = timeit(loop(fn), (img, disp), iters) * 1e3
        print(f"{name}: {ms:8.2f} ms  (b{b}, {h}x{w})", flush=True)


if __name__ == "__main__":
    main()
