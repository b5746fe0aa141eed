"""Compilation-cache plumbing (utils/compile_cache.py): env gating and
idempotency. The actual cache hit behavior is backend-dependent and exercised
by the CLIs; what must hold everywhere is the configuration contract."""

import importlib

import wordgesture_gan_tpu.utils.compile_cache as cc


def test_disabled_via_env(monkeypatch, tmp_path):
    mod = importlib.reload(cc)
    monkeypatch.setenv("WGG_COMPILE_CACHE", "0")
    assert mod.enable_compilation_cache(str(tmp_path / "x")) is None


def test_enable_and_idempotent(monkeypatch, tmp_path):
    mod = importlib.reload(cc)
    monkeypatch.delenv("WGG_COMPILE_CACHE", raising=False)
    target = tmp_path / "xla"
    p1 = mod.enable_compilation_cache(str(target))
    assert p1 == str(target) and target.is_dir()
    # second call: same path, no error
    assert mod.enable_compilation_cache(str(target)) == str(target)

    import jax

    assert jax.config.jax_compilation_cache_dir == str(target)


def test_env_dir_override(monkeypatch, tmp_path):
    mod = importlib.reload(cc)
    monkeypatch.setenv("WGG_COMPILE_CACHE", str(tmp_path / "envdir"))
    assert mod.enable_compilation_cache() == str(tmp_path / "envdir")
