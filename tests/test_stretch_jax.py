"""Accelerator-resident phase vocoder (ops/stretch_jax) vs the numpy
oracle (ops/resample.time_stretch) — duration, pitch, amplitude, backend
resolution (LIBZL_TPU_STRETCH=jax)."""

import numpy as np
import pytest

from libzl_tpu.ops.resample import (
    render_playback,
    resolve_stretch_backend,
    stretch,
    time_stretch,
)
from libzl_tpu.ops.stretch_jax import time_stretch_jax

SR = 48000.0


def tone(freq=440.0, seconds=1.0, sr=SR, stereo=False):
    t = np.arange(int(sr * seconds)) / sr
    x = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    if stereo:
        return np.stack([x, 0.8 * x], axis=1)
    return x[:, None]


def dominant_freq(x, sr=SR):
    x = x[:, 0] if x.ndim == 2 else x
    sp = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return float(np.fft.rfftfreq(len(x), 1 / sr)[sp.argmax()])


@pytest.mark.parametrize("factor", [0.5, 0.75, 1.5, 2.0])
def test_duration_matches_numpy_vocoder(factor):
    x = tone(330.0, 0.7)
    yj = time_stretch_jax(x, factor)
    yn = time_stretch(x, factor)
    assert yj.shape == yn.shape == (int(round(x.shape[0] * factor)), 1)


@pytest.mark.parametrize("factor", [0.5, 1.5, 2.0])
def test_pitch_preserved(factor):
    y = time_stretch_jax(tone(440.0), factor)
    assert dominant_freq(y) == pytest.approx(440.0, abs=6.0)


def test_matches_numpy_vocoder_closely():
    """Same algorithm, same window, same phase math: the two vocoders must
    agree to f32/FFT-backend noise on steady-state material."""
    x = tone(261.6, 0.6, stereo=True)
    yj = time_stretch_jax(x, 1.37)
    yn = time_stretch(x, 1.37)
    # compare away from the fade-in/out edges
    a, b = 4096, yj.shape[0] - 4096
    err = np.abs(yj[a:b] - yn[a:b]).max()
    ref = np.abs(yn[a:b]).max()
    assert err < 0.02 * ref, f"vocoders diverge: {err} vs peak {ref}"


def test_amplitude_preserved():
    x = tone(220.0, 0.8)
    y = time_stretch_jax(x, 1.5)
    mid = y[8192:-8192, 0]
    assert np.abs(mid).max() == pytest.approx(0.5, rel=0.1)


def test_identity_is_exact():
    x = tone(440.0, 0.3)
    assert time_stretch_jax(x, 1.0) is not None
    np.testing.assert_array_equal(time_stretch_jax(x, 1.0), x)


def test_env_backend_resolution(monkeypatch):
    monkeypatch.setenv("LIBZL_TPU_STRETCH", "jax")
    assert resolve_stretch_backend("auto") == "jax"
    # explicit choices unaffected by the env override
    assert resolve_stretch_backend("vocoder") == "vocoder"
    x = tone(392.0, 0.5)
    y = stretch(x, 1.25, backend="auto")
    assert y.shape[0] == int(round(x.shape[0] * 1.25))
    assert dominant_freq(y) == pytest.approx(392.0, abs=6.0)


def test_render_playback_via_jax(monkeypatch):
    monkeypatch.setenv("LIBZL_TPU_STRETCH", "jax")
    x = tone(440.0, 0.5)
    out = render_playback(x, speed_ratio=0.5, pitch_semitones=0.0,
                          gain_db=-6.0)
    # half speed -> double duration, gain baked
    assert out.shape[0] == int(round(x.shape[0] * 2.0))
    mid = out[8192:-8192, 0]
    assert np.abs(mid).max() == pytest.approx(0.5 * 10 ** (-6 / 20), rel=0.15)


def test_bucketed_shapes_reuse_compilation():
    """Re-renders of the same clip at different factors within a bucket
    must not recompile (the UI-sweep case)."""
    from libzl_tpu.ops import stretch_jax as sj

    x = tone(440.0, 0.5)
    sj.time_stretch_jax(x, 1.30)
    before = sj._stretch_kernel._cache_size()
    sj.time_stretch_jax(x, 1.31)
    sj.time_stretch_jax(x, 1.32)
    assert sj._stretch_kernel._cache_size() == before


def test_click_train_transients():
    """Onset reset: clicks stay clicks (the SoundTouch-class quality trait
    the numpy path asserts too)."""
    sr = int(SR)
    x = np.zeros((sr // 2, 1), np.float32)
    for k in range(0, sr // 2, 6000):
        x[k:k + 32, 0] = 1.0
    y = time_stretch_jax(x, 2.0)
    env = np.abs(y[:, 0])
    peaks = env > 0.35
    # count distinct click groups in the stretched output
    groups = np.diff(np.flatnonzero(peaks), prepend=-10)
    n_clicks = int((groups > 1000).sum())
    expected = len(range(0, sr // 2, 6000))
    assert abs(n_clicks - expected) <= 2


def test_deferred_rerender_uses_jax_backend(monkeypatch):
    """A clip speed/pitch change under the engine routes its deferred
    re-render through the accelerator vocoder when LIBZL_TPU_STRETCH=jax
    (the worker thread pays a dispatch, not a host-core STFT)."""
    import time

    from libzl_tpu.engine.commands import ClipCommand
    from libzl_tpu.engine.engine import AudioEngine
    from libzl_tpu.io.wav import AudioData
    from libzl_tpu.models.clip import ClipAudioSource

    monkeypatch.setenv("LIBZL_TPU_STRETCH", "jax")
    sr = 48000
    engine = AudioEngine(sample_rate=sr, backend="numpy", num_voices=8)
    t = np.arange(sr * 2) / sr
    clip = ClipAudioSource(engine, audio=AudioData(
        (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[:, None], sr))
    engine.start_transport(bpm=120)
    changed = []
    clip.playback_changed_callback = lambda: changed.append(True)
    cmd = ClipCommand.channel(clip.id, 0)
    cmd.midi_note = 60
    cmd.change_speed = True
    cmd.speed_ratio = 0.5
    engine.schedule_clip_command(cmd, 0)
    deadline = time.monotonic() + 30.0
    while not changed and time.monotonic() < deadline:
        engine.process_block()
        time.sleep(0.01)
    assert changed, "deferred jax render never landed"
    # half speed -> double duration
    assert clip.playback_audio.samples.shape[0] == pytest.approx(
        2 * sr * 2, abs=4)


def test_jax_short_input_and_non_divisible_hop():
    """Mirror of the numpy edge contracts: a sub-fft-size input still
    stretches to the rounded target length, and a synthesis hop that does
    not divide the FFT size takes the scatter-add overlap fallback (the
    exact-wrap phase table needs fft % hop == 0) with pitch intact."""
    short = tone(440.0, 0.01)  # 480 frames < fft_size 2048
    out = time_stretch_jax(short, 2.0)
    assert out.shape[0] == round(short.shape[0] * 2.0)
    assert np.isfinite(out).all()

    x = tone(440.0, 0.4)
    out = time_stretch_jax(x, 1.5, fft_size=1500, hop=490)
    assert out.shape[0] == round(x.shape[0] * 1.5)
    assert abs(dominant_freq(out) - 440.0) < 6.0
