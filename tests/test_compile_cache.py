"""Persistent compilation cache (utils/compile_cache.py).

Serving cold-start: compiled XLA programs are persisted and reloaded
across processes. These tests run on the hermetic CPU backend; the
cross-process cold/warm measurement on the real chip lives in
bench/probe_compile_cache.py (numbers in BASELINE.md).
"""

import os

import jax
import jax.numpy as jnp

from scenedepthestimation_tpu.utils import compile_cache


def _restore_session_cache():
    """Point the cache back at the suite-wide dir (tests/conftest.py)
    rather than disabling it — later modules keep their warm compiles."""
    compile_cache.enable_compile_cache(
        os.environ["JAX_COMPILATION_CACHE_DIR"], min_compile_time_secs=0.5
    )


def test_enable_writes_entries(tmp_path):
    d = str(tmp_path / "xla")
    try:
        got = compile_cache.enable_compile_cache(d, min_compile_time_secs=0.0)
        assert got == d

        @jax.jit
        def f(x):
            return (x @ x.T).sum()

        f(jnp.ones((64, 64), jnp.float32)).block_until_ready()
        assert os.path.isdir(d)
        assert len(os.listdir(d)) >= 1
    finally:
        _restore_session_cache()


def test_env_var_resolution(tmp_path, monkeypatch):
    d = str(tmp_path / "envcache")
    monkeypatch.setenv(compile_cache.ENV_VAR, d)
    try:
        assert compile_cache.enable_compile_cache() == d
        # maybe_enable_from_env fires when the var is set
        assert compile_cache.maybe_enable_from_env() == d
    finally:
        _restore_session_cache()


def test_maybe_enable_noop_without_env(monkeypatch):
    monkeypatch.delenv(compile_cache.ENV_VAR, raising=False)
    assert compile_cache.maybe_enable_from_env() is None


def test_cli_flag_parses():
    from scenedepthestimation_tpu.cli import build_parser

    p = build_parser()
    a = p.parse_args(["bench", "--compile-cache"])
    assert a.compile_cache == ""  # "" -> default dir in main()
    a = p.parse_args(["bench", "--compile-cache", "/tmp/somewhere"])
    assert a.compile_cache == "/tmp/somewhere"
    a = p.parse_args(["bench"])
    assert a.compile_cache is None
    # the flag is shared by every subcommand
    a = p.parse_args(
        ["predict", "--image", "x.png", "--compile-cache", "/tmp/c"]
    )
    assert a.compile_cache == "/tmp/c"
