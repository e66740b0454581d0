"""Tracing / profiling harness (SURVEY §5.1).

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory.
* :func:`timed` — fori_loop-amortized device timing for any jittable fn
  (the same technique as benchmark.py: defeats dispatch latency and the
  no-op ``block_until_ready`` of tunneled dev platforms).
* :func:`hlo_text` / :func:`assert_fused` — compiled-HLO inspection: used
  to verify a Pallas kernel actually replaced the HLO it targets
  (custom-call present) and that DP programs contain no collectives.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
from jax import lax


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('/tmp/tb'): run()`` → TensorBoard trace in log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(
    fn: Callable, *args, iters: int = 8, warmup: int = 2
) -> float:
    """Milliseconds per call of ``fn(*args)`` on device.

    ``fn`` must return an array; the mean is accumulated across a
    device-side fori_loop and fetched once as a scalar (a real sync).
    The first array argument is perturbed by the loop index so XLA's
    loop-invariant code motion cannot hoist the body out of the loop
    (floats get ``+ 0.0*i`` — not foldable under IEEE since i could be
    non-finite; ints get ``+ i``, which changes values but not cost).
    """

    @jax.jit
    def loop(n, *a):
        def body(i, acc):
            a0 = a[0]
            if jnp.issubdtype(a0.dtype, jnp.floating):
                a0 = a0 + jnp.zeros((), a0.dtype) * i.astype(a0.dtype)
            else:
                a0 = a0 + i.astype(a0.dtype)
            return acc + fn(a0, *a[1:]).astype(jnp.float32).mean()

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(loop(warmup, *args))
    t0 = time.perf_counter()
    float(loop(iters, *args))
    return (time.perf_counter() - t0) / iters * 1000.0


def hlo_text(fn: Callable, *args, static_argnums=()) -> str:
    """Compiled (post-optimization) HLO of ``jit(fn)(*args)``."""
    return (
        jax.jit(fn, static_argnums=static_argnums)
        .lower(*args)
        .compile()
        .as_text()
    )


def count_ops(hlo: str, op: str) -> int:
    return sum(1 for line in hlo.splitlines() if f" {op}(" in line or f"%{op}" in line)


def assert_fused(
    hlo: str,
    must_contain: Iterable[str] = (),
    must_not_contain: Iterable[str] = (),
) -> None:
    for s in must_contain:
        if s not in hlo:
            raise AssertionError(f"expected {s!r} in compiled HLO")
    for s in must_not_contain:
        if s in hlo:
            raise AssertionError(f"unexpected {s!r} in compiled HLO")
