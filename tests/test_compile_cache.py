"""Persistent XLA compilation cache: enabled at package import
(compile-once-per-machine; cold accum-scan compiles cost ~5-15 min
through the axon tunnel), opt-out + relocation env knobs, never fatal."""

import os

import jax

from t2ms_tpu.config import enable_persistent_compilation_cache


def test_enabled_at_import_and_relocatable(tmp_path, monkeypatch):
    # package import already set a cache dir
    assert jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("T2MS_COMPILE_CACHE_DIR", str(tmp_path / "c"))
    got = enable_persistent_compilation_cache()
    assert got == str(tmp_path / "c")
    assert os.path.isdir(got)
    assert jax.config.jax_compilation_cache_dir == got


def test_opt_out(monkeypatch):
    monkeypatch.setenv("T2MS_NO_COMPILE_CACHE", "1")
    assert enable_persistent_compilation_cache() is None
    monkeypatch.setenv("T2MS_NO_COMPILE_CACHE", "0")  # explicit off = on
    assert enable_persistent_compilation_cache() is not None
