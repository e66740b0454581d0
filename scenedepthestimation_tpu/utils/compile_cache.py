"""Persistent XLA compilation cache — serving cold-start elimination.

The reference family pays no compile cost (eager torch); our design
trades that for one fused XLA program per (config, batch) — SURVEY §7 /
DESIGN.md core decision 1 — which costs a one-time 20–40 s trace+compile
the first time a process builds it. For a serving process that restarts
(deploy roll, crash recovery via ``infer.py``'s journal, autoscaling)
that cold start is pure waste: the program is deterministic in
(HLO, flags, jaxlib), so it can be compiled once and reloaded forever.

This module wires JAX's persistent compilation cache to a stable on-disk
location. Measured on the real v5e chip (bench/probe_compile_cache.py,
numbers in BASELINE.md): the axon PJRT plugin supports executable
serialization, and a cold process loading the judged 384x1152 b128
program drops from ~37 s compile to ~2 s cache load.

Opt-in, two ways:
* env var ``SCENEDEPTH_COMPILE_CACHE`` — set to a directory (or empty
  for the default ``~/.cache/scenedepthestimation_tpu/xla``); honored by
  every entry point at import via :func:`maybe_enable_from_env`.
* CLI flag ``--compile-cache [DIR]`` on every ``scenedepth`` subcommand.

The cache key includes the jaxlib version, backend, and compile flags,
so stale entries are misses, never wrong programs; entries are written
only for compiles slower than ``min_compile_time_secs`` to keep tiny
host programs out of the cache.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

ENV_VAR = "SCENEDEPTH_COMPILE_CACHE"

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "scenedepthestimation_tpu", "xla"
)


def enable_compile_cache(
    path: Optional[str] = None, *, min_compile_time_secs: float = 0.5
) -> str:
    """Enable JAX's persistent compilation cache at ``path``.

    ``path=None`` (or ``""``) resolves to ``$SCENEDEPTH_COMPILE_CACHE``
    and then to :data:`DEFAULT_DIR`. Returns the directory in use.
    Safe to call more than once; later calls re-point the cache.
    Compiles already performed in this process are not retroactively
    written — call before building programs (the CLI does).
    """
    path = path or os.environ.get(ENV_VAR) or DEFAULT_DIR
    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    repoint = jax.config.jax_compilation_cache_dir not in (None, path)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    if repoint:
        _reset_jax_cache_singleton()
    return path


def _reset_jax_cache_singleton() -> None:
    """JAX materializes its persistent-cache object lazily ONCE; after
    that, jax_compilation_cache_dir updates are silently ignored —
    re-pointing the cache (this module's documented contract, and what
    a long-lived process changing --compile-cache expects) requires
    dropping the singleton so the next compile re-reads the config.
    Private API, so a removal in a future jaxlib degrades to the old
    first-dir-wins behavior instead of crashing."""
    try:
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()
    except Exception:
        pass


def disable_compile_cache() -> None:
    """Turn the persistent cache off (test hygiene; not used in serving)."""
    if jax.config.jax_compilation_cache_dir is not None:
        jax.config.update("jax_compilation_cache_dir", None)
        _reset_jax_cache_singleton()


def maybe_enable_from_env() -> Optional[str]:
    """Enable the cache iff ``SCENEDEPTH_COMPILE_CACHE`` is set.

    An empty value selects :data:`DEFAULT_DIR`. Returns the directory or
    ``None`` when the env var is unset.
    """
    if ENV_VAR in os.environ:
        return enable_compile_cache()
    return None
