"""compile_cache.enable(): config wiring, env opt-out, never-raise."""

import jax

from uce_tpu.utils import compile_cache


def test_enable_points_jax_at_dir(tmp_path, monkeypatch):
    monkeypatch.delenv("UCE_COMPILE_CACHE", raising=False)
    d = str(tmp_path / "xla_cache")
    assert compile_cache.enable(d) == d
    assert jax.config.jax_compilation_cache_dir == d


def test_env_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv("UCE_COMPILE_CACHE", "0")
    assert compile_cache.enable(str(tmp_path)) is None


def test_env_dir_override(tmp_path, monkeypatch):
    monkeypatch.delenv("UCE_COMPILE_CACHE", raising=False)
    d = str(tmp_path / "override")
    monkeypatch.setenv("UCE_COMPILE_CACHE_DIR", d)
    assert compile_cache.enable() == d


def test_persisted_entry_roundtrip(tmp_path, monkeypatch):
    """An entry written by one compile is hit on re-compile (same process
    clears the in-memory executable by re-jitting a fresh function object
    with identical HLO)."""
    monkeypatch.delenv("UCE_COMPILE_CACHE", raising=False)
    d = str(tmp_path / "rt")
    assert compile_cache.enable(d) == d
    # force even instant CPU compiles to persist
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        import jax.numpy as jnp

        def f(x):
            return jnp.tanh(x @ x).sum()

        x = jnp.ones((64, 64), jnp.float32)
        jax.jit(f)(x).block_until_ready()
        import os

        entries = os.listdir(d)
        assert entries, "no cache entry persisted"
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
