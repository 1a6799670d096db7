"""Discovery and prototype-declaration paths of io/alsa.py.

test_alsa_binding.py drives the marshalling layer through an injected
snd_*-level fake; what that cannot reach is the code that runs BEFORE any
fake exists — `get_alsa`'s one-shot real-library discovery (find_library +
CDLL + OSError fallback) and `_declare`'s ctypes prototype table (the
restype/argtypes contract every later call depends on). These tests drive
those with monkeypatched loaders, plus the few lib-absent / error-return
guards the snd-level fake never hits.
"""

import ctypes
import ctypes.util

import pytest

from libzl_tpu.io import alsa


class _Fn:
    """Stands in for a ctypes function pointer: accepts prototype writes."""

    def __init__(self):
        self.restype = None
        self.argtypes = None


class _FakeCDLL:
    """Attribute-on-demand CDLL stand-in; `free` presence is configurable."""

    def __init__(self, with_free: bool):
        self._with_free = with_free
        self._fns = {}

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        if name == "free" and not self._with_free:
            raise AttributeError(name)
        return self._fns.setdefault(name, _Fn())


@pytest.fixture
def clean_discovery(monkeypatch):
    """Reset the module's one-shot discovery state around each test."""
    monkeypatch.setattr(alsa, "_override", None)
    monkeypatch.setattr(alsa, "_real", None)
    monkeypatch.setattr(alsa, "_real_checked", False)
    yield
    # monkeypatch restores the originals on teardown


def test_declare_sets_prototypes_on_every_bound_symbol():
    lib = alsa._declare(_FakeCDLL(with_free=True))
    assert lib.snd_rawmidi_open.restype is ctypes.c_int
    assert lib.snd_rawmidi_open.argtypes[-1] is ctypes.c_int
    assert lib.snd_rawmidi_read.restype is ctypes.c_ssize_t
    assert lib.snd_pcm_readi.restype is ctypes.c_long
    assert lib.snd_pcm_writei.argtypes == [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_ulong]
    assert lib.snd_device_name_get_hint.restype is ctypes.c_void_p
    assert lib.snd_pcm_set_params.argtypes[0] is ctypes.c_void_p
    assert lib.free.restype is None
    assert lib.free.argtypes == [ctypes.c_void_p]


def test_declare_tolerates_libc_free_missing():
    # Some libasound builds do not re-export free(); _declare must not
    # require it (hint strings then leak a few bytes rather than crash).
    lib = alsa._declare(_FakeCDLL(with_free=False))
    assert lib.snd_rawmidi_close.argtypes == [ctypes.c_void_p]


def test_get_alsa_discovers_and_caches_real_library(
        clean_discovery, monkeypatch):
    fake = _FakeCDLL(with_free=True)
    calls = []
    monkeypatch.setattr(ctypes.util, "find_library",
                        lambda name: calls.append(name) or "libasound.so.2")
    monkeypatch.setattr(ctypes, "CDLL", lambda path: fake)
    lib = alsa.get_alsa()
    assert lib is fake
    assert lib.snd_rawmidi_open.restype is ctypes.c_int  # _declare ran
    assert alsa.available() is True
    # one-shot: a second call must not re-probe the loader
    monkeypatch.setattr(ctypes.util, "find_library",
                        lambda name: pytest.fail("re-probed"))
    assert alsa.get_alsa() is fake
    assert calls == ["asound"]


def test_get_alsa_absent_library(clean_discovery, monkeypatch):
    monkeypatch.setattr(ctypes.util, "find_library", lambda name: None)
    assert alsa.get_alsa() is None
    assert alsa.available() is False


def test_get_alsa_unloadable_library(clean_discovery, monkeypatch):
    monkeypatch.setattr(ctypes.util, "find_library", lambda n: "asound.so")
    def boom(path):
        raise OSError("bad ELF")
    monkeypatch.setattr(ctypes, "CDLL", boom)
    assert alsa.get_alsa() is None


class _NoLib:
    """Module state where libasound is known-absent."""

    def __enter__(self):
        self._saved = (alsa._override, alsa._real, alsa._real_checked)
        alsa._override = None
        alsa._real = None
        alsa._real_checked = True
        return self

    def __exit__(self, *exc):
        alsa._override, alsa._real, alsa._real_checked = self._saved


def test_lib_absent_guards_are_noops_or_loud():
    with _NoLib():
        assert alsa.get_alsa() is None
        # closes are silent no-ops so shutdown never raises
        alsa.rawmidi_close(object())
        alsa.pcm_close(object())
        alsa.pcm_drain_close(object())
        # opens fail loud
        with pytest.raises(RuntimeError, match="libasound not available"):
            alsa.pcm_open_capture("hw:0", 48000)


def test_enumerate_rawmidi_hint_error_returns_empty():
    class HintErr:
        def snd_device_name_hint(self, card, iface, byref_hints):
            return -1
    alsa.set_alsa_lib_for_testing(HintErr())
    try:
        assert alsa.enumerate_rawmidi() == []
    finally:
        alsa.set_alsa_lib_for_testing(None)


def test_pcm_open_capture_error_paths():
    class OpenFails:
        def snd_pcm_open(self, byref_handle, device, stream, mode):
            return -19  # -ENODEV
    alsa.set_alsa_lib_for_testing(OpenFails())
    try:
        with pytest.raises(RuntimeError, match=r"snd_pcm_open capture\(hw:9\): -19"):
            alsa.pcm_open_capture("hw:9", 48000)
    finally:
        alsa.set_alsa_lib_for_testing(None)

    class ParamsFail:
        def __init__(self):
            self.closed = 0
        def snd_pcm_open(self, byref_handle, device, stream, mode):
            return 0
        def snd_pcm_set_params(self, *a):
            return -22  # -EINVAL
        def snd_pcm_close(self, handle):
            self.closed += 1
            return 0
    pf = ParamsFail()
    alsa.set_alsa_lib_for_testing(pf)
    try:
        with pytest.raises(RuntimeError, match="snd_pcm_set_params"):
            alsa.pcm_open_capture("hw:9", 48000)
        assert pf.closed == 1  # handle not leaked on config failure
    finally:
        alsa.set_alsa_lib_for_testing(None)
