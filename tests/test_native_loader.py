"""The shared native-library loader (libzl_tpu/_native.py): lazy g++
build, rebuild-on-stale, ABI version gate, and graceful degradation to
None — the pattern every native helper (hostcore, WSOLA, FLAC) rides.
"""

import os
import time

import pytest

from libzl_tpu import _native


@pytest.fixture
def native_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(_native, "NATIVE_DIR", tmp_path)
    # the loader caches per stem (including failures) — isolate per test
    monkeypatch.setattr(_native, "_cache", {})
    return tmp_path


def _write_lib(d, stem, version):
    (d / f"{stem}.cpp").write_text(
        f'extern "C" int {stem}_abi() {{ return {version}; }}\n'
    )


def test_missing_source_degrades_to_none(native_dir):
    assert _native.load_native("no_such_lib", "no_such_lib_abi", 1) is None
    # the failure is cached, not retried per call
    assert "no_such_lib" in _native._cache


def test_build_load_and_abi_gate(native_dir):
    _write_lib(native_dir, "tlib", 7)
    lib = _native.load_native("tlib", "tlib_abi", 7)
    assert lib is not None and lib.tlib_abi() == 7

    # wrong expected version -> rejected (a stale .so from an older
    # source tree must not be trusted)
    _native._cache.clear()
    assert _native.load_native("tlib", "tlib_abi", 8) is None


def test_stale_so_is_rebuilt(native_dir):
    """_build's staleness rule: an up-to-date .so is reused untouched; a
    source newer than its .so triggers a recompile. (Checked at the build
    level: dlopen caches by path within a process, so a same-path reload
    cannot be observed in-process — production builds once per process.)"""
    _write_lib(native_dir, "tlib2", 1)
    so = _native._build("tlib2", "-O2")
    assert so is not None
    first_mtime = so.stat().st_mtime
    # unchanged source: reused, not recompiled
    assert _native._build("tlib2", "-O2") == so
    assert so.stat().st_mtime == first_mtime
    # source newer than the .so: recompiled
    _write_lib(native_dir, "tlib2", 2)
    future = time.time() + 5
    os.utime(native_dir / "tlib2.cpp", (future, future))
    assert _native._build("tlib2", "-O2") == so
    assert so.stat().st_mtime > first_mtime


def test_uncompilable_source_degrades_to_none(native_dir):
    (native_dir / "broken.cpp").write_text("this is not C++")
    assert _native.load_native("broken", "broken_abi", 1) is None


def test_lazy_top_level_api():
    """libzl_tpu.__getattr__: lazy names resolve, unknown names raise."""
    import libzl_tpu

    assert libzl_tpu.AudioEngine.__name__ == "AudioEngine"
    assert callable(libzl_tpu.make_mesh)
    with pytest.raises(AttributeError, match="no attribute"):
        libzl_tpu.not_a_real_name


def test_load_is_cached_per_stem(native_dir, monkeypatch):
    """A second load_native for the same stem returns the cached handle
    without re-invoking the build (the loader's whole-process contract)."""
    _write_lib(native_dir, "tlib3", 1)
    first = _native.load_native("tlib3", "tlib3_abi", 1)
    assert first is not None
    monkeypatch.setattr(
        _native, "_build",
        lambda *a, **k: pytest.fail("cache miss: _build re-invoked"))
    assert _native.load_native("tlib3", "tlib3_abi", 1) is first


def test_unloadable_so_degrades_to_none(native_dir, monkeypatch):
    """A built artifact dlopen cannot load (truncated/garbage .so) must
    degrade to None, not raise — same contract as a failed compile."""
    bogus = native_dir / "garbage.so"
    bogus.write_text("not an ELF")
    monkeypatch.setattr(_native, "_build", lambda *a, **k: bogus)
    assert _native.load_native("garbage", "garbage_abi", 1) is None


def test_missing_abi_symbol_degrades_to_none(native_dir):
    """A library that builds but lacks the ABI probe symbol is rejected
    (getattr on the CDLL raises AttributeError)."""
    _write_lib(native_dir, "tlib4", 1)  # exports tlib4_abi only
    assert _native.load_native("tlib4", "other_abi", 1) is None
