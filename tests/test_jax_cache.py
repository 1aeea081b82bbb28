"""Per-host compilation-cache keying (utils/jax_cache.py): stale
XLA:CPU AOT entries from a different host crash natively, so the cache
directory must be host-local."""

import os

import jax

from i2sdf_tpu.utils.jax_cache import host_signature, set_compilation_cache


def test_host_signature_stable_and_short():
    a = host_signature()
    b = host_signature()
    assert a == b
    assert len(a) == 10
    assert a.isalnum()


def test_set_compilation_cache_uses_host_subdir(tmp_path):
    prev = jax.config.jax_compilation_cache_dir
    try:
        path = set_compilation_cache(str(tmp_path / "cache"))
        assert os.path.isdir(path)
        assert os.path.basename(path) == f"host-{host_signature()}"
        assert jax.config.jax_compilation_cache_dir == path
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_set_compilation_cache_respects_env_base(tmp_path, monkeypatch):
    prev = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "envbase"))
    try:
        path = set_compilation_cache()
        assert path.startswith(str(tmp_path / "envbase"))
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
