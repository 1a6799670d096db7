"""Native WSOLA stretcher (native/zl_stretch.cpp) tests.

The reference's stretch path is tracktion's TimeStretcher with the
SoundTouch backend (reference CMakeLists.txt:86), a time-domain WSOLA; the
native stretcher is our reimplementation of that algorithm class. The numpy
phase vocoder (ops/resample.time_stretch) remains the portable fallback —
these tests assert the WSOLA path matches it on the contract level
(durations, pitch, energy, transient sharpness) and that backend resolution
works.
"""

import numpy as np
import pytest

from libzl_tpu.ops import stretch_native as sn
from libzl_tpu.ops.resample import (
    render_playback,
    resolve_stretch_backend,
    stretch,
)

SR = 48000

pytestmark = pytest.mark.skipif(
    not sn.available(), reason="native stretcher unavailable (no g++?)"
)


def tone(freq=220.0, seconds=1.0, channels=2):
    t = np.arange(int(SR * seconds), dtype=np.float64) / SR
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)
    if channels == 1:
        return x[:, None]
    return np.stack([x] * channels, axis=1)


def zc_freq(sig):
    z = np.sum(np.abs(np.diff(np.sign(sig))) > 0)
    return z / 2 / (len(sig) / SR)


@pytest.mark.parametrize("factor", [0.5, 0.75, 1.25, 1.5, 2.0])
def test_duration_exact(factor):
    x = tone(seconds=1.0)
    y = sn.time_stretch_wsola(x, factor, SR)
    assert y.shape == (int(round(x.shape[0] * factor)), 2)
    assert y.dtype == np.float32


@pytest.mark.parametrize("factor", [0.75, 1.5])
def test_pitch_preserved(factor):
    x = tone(freq=220.0, seconds=2.0)
    y = sn.time_stretch_wsola(x, factor, SR)
    # ignore the edge windows
    core = y[SR // 4 : -SR // 4, 0]
    assert abs(zc_freq(core) - 220.0) < 3.0


def test_energy_preserved():
    x = tone(seconds=2.0)
    y = sn.time_stretch_wsola(x, 1.5, SR)
    rms_in = np.sqrt((x**2).mean())
    rms_out = np.sqrt((y**2).mean())
    assert abs(rms_out - rms_in) / rms_in < 0.05


def test_mono_dims_preserved():
    x = tone(seconds=0.5)[:, 0]  # 1-D
    y = sn.time_stretch_wsola(x, 1.25, SR)
    assert y.ndim == 1
    assert y.shape[0] == int(round(x.shape[0] * 1.25))


def test_short_input_no_crash():
    x = tone(seconds=0.01)  # shorter than one WSOLA window
    y = sn.time_stretch_wsola(x, 1.5, SR)
    assert y.shape[0] == int(round(x.shape[0] * 1.5))
    assert np.isfinite(y).all()


def test_deterministic():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((SR, 2)).astype(np.float32) * 0.3
    a = sn.time_stretch_wsola(x, 1.3, SR)
    b = sn.time_stretch_wsola(x, 1.3, SR)
    np.testing.assert_array_equal(a, b)


def test_transients_stay_impulsive():
    """A click train must stay a click train — impulses aren't smeared into
    noise (the artifact class the time-domain algorithm avoids by design)."""
    clicks = np.zeros((SR * 2, 1), np.float32)
    clicks[:: SR // 10] = 1.0
    out = sn.time_stretch_wsola(clicks, 1.5, SR)
    # nearly all output samples remain (near-)silent; the energy stays in
    # sharp impulses of near-unit amplitude
    loud = np.abs(out[:, 0]) > 0.1
    assert loud.mean() < 0.01
    assert np.abs(out).max() > 0.8


def test_backend_resolution(monkeypatch):
    monkeypatch.delenv("LIBZL_TPU_STRETCH", raising=False)
    assert resolve_stretch_backend("auto") == "wsola"
    # env overrides only the auto default
    monkeypatch.setenv("LIBZL_TPU_STRETCH", "vocoder")
    assert resolve_stretch_backend("auto") == "vocoder"
    # an explicit argument beats the env var
    assert resolve_stretch_backend("wsola") == "wsola"
    monkeypatch.setenv("LIBZL_TPU_STRETCH", "wsola")
    assert resolve_stretch_backend("vocoder") == "vocoder"


def test_explicit_wsola_unavailable_raises(monkeypatch):
    monkeypatch.delenv("LIBZL_TPU_STRETCH", raising=False)
    monkeypatch.setattr(sn, "available", lambda: False)
    with pytest.raises(ValueError, match="wsola"):
        resolve_stretch_backend("wsola")
    # auto falls back silently
    assert resolve_stretch_backend("auto") == "vocoder"


def test_wsola_empty_input_matches_vocoder_contract():
    out = sn.time_stretch_wsola(np.zeros((0, 2), np.float32), 1.5, SR)
    assert out.shape == (1, 2)
    assert not out.any()


def test_stretch_dispatcher_uses_wsola(monkeypatch):
    monkeypatch.delenv("LIBZL_TPU_STRETCH", raising=False)
    x = tone(seconds=0.5)
    via_dispatch = stretch(x, 1.25, SR, backend="wsola")
    direct = sn.time_stretch_wsola(x, 1.25, SR)
    np.testing.assert_array_equal(via_dispatch, direct)


def test_render_playback_wsola_backend(monkeypatch):
    monkeypatch.delenv("LIBZL_TPU_STRETCH", raising=False)
    x = tone(freq=330.0, seconds=1.0)
    y = render_playback(x, speed_ratio=0.8, sample_rate=SR, backend="wsola")
    # speed 0.8 => output longer by 1/0.8
    assert y.shape[0] == int(round(x.shape[0] / 0.8))
    core = y[SR // 4 : -SR // 4, 0]
    assert abs(zc_freq(core) - 330.0) < 4.0


def test_load_is_cached():
    lib = sn.load()
    assert lib is not None and sn.load() is lib


def test_load_degrades_when_loader_fails(monkeypatch):
    import libzl_tpu._native as native_mod

    monkeypatch.setattr(sn, "_lib", None)
    monkeypatch.setattr(native_mod, "load_native", lambda *a, **k: None)
    assert sn.load() is None
    assert sn.available() is False


def test_process_shortfall_fails_loud(monkeypatch):
    """zl_stretch_process returning fewer frames than promised is a native
    bug (or ABI drift) — the binding must raise, never hand back an
    uninitialized tail."""

    class ShortLib:
        def zl_stretch_out_len(self, n_in, stretch):
            return int(n_in * stretch)

        def zl_stretch_process(self, *a):
            return 7  # fewer than n_out

    monkeypatch.setattr(sn, "_lib", ShortLib())
    with pytest.raises(RuntimeError, match="zl_stretch_process failed"):
        sn.time_stretch_wsola(tone(seconds=0.05), 2.0, SR)
