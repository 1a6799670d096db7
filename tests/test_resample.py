"""Offline stretch/pitch render tests (the tracktion render-pass analog)."""

import numpy as np
import pytest

from libzl_tpu.ops.resample import (
    linear_resample,
    pitch_shift,
    render_playback,
    time_stretch,
)

SR = 48000.0


def tone(freq=440.0, seconds=1.0, sr=SR):
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)[:, None]


def dominant_freq(x, sr=SR):
    x = x[:, 0] if x.ndim == 2 else x
    sp = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return float(np.fft.rfftfreq(len(x), 1 / sr)[sp.argmax()])


def test_linear_resample_ratio_and_pitch():
    x = tone(440.0)
    y = linear_resample(x, 2.0)
    assert abs(y.shape[0] - x.shape[0] / 2) <= 1
    assert dominant_freq(y) == pytest.approx(880.0, abs=4.0)


def test_time_stretch_preserves_pitch():
    x = tone(440.0)
    for stretch in (0.5, 1.5, 2.0):
        y = time_stretch(x, stretch)
        assert y.shape[0] == int(round(x.shape[0] * stretch))
        assert dominant_freq(y) == pytest.approx(440.0, abs=6.0)


def test_pitch_shift_preserves_duration():
    x = tone(440.0)
    for semis, want in ((12.0, 880.0), (-12.0, 220.0), (7.0, 659.3)):
        y = pitch_shift(x, semis)
        assert y.shape[0] == x.shape[0]
        assert dominant_freq(y) == pytest.approx(want, abs=8.0)


def test_render_playback_combined():
    x = tone(330.0)
    # speed 2x (half duration), up a fifth, -6 dB
    y = render_playback(x, speed_ratio=2.0, pitch_semitones=7.0, gain_db=-6.0)
    assert y.shape[0] == pytest.approx(x.shape[0] / 2, abs=2)
    assert dominant_freq(y) == pytest.approx(330.0 * 2 ** (7 / 12), abs=10.0)
    # amplitude scaled by ~0.5 (window edges excluded)
    assert 0.15 < np.abs(y[2000:-2000]).max() < 0.35


def test_identity_passthrough_is_exact():
    x = tone(440.0)
    y = render_playback(x, 1.0, 0.0, 0.0)
    np.testing.assert_array_equal(x, y)


def test_stereo_stretch():
    t = np.arange(int(SR)) / SR
    x = np.stack(
        [0.5 * np.sin(2 * np.pi * 440 * t), 0.3 * np.sin(2 * np.pi * 550 * t)],
        axis=1,
    ).astype(np.float32)
    y = time_stretch(x, 1.5)
    assert y.shape == (int(SR * 1.5), 2)
    assert dominant_freq(y[:, :1]) == pytest.approx(440.0, abs=6.0)
    assert dominant_freq(y[:, 1:]) == pytest.approx(550.0, abs=6.0)


def test_loop_crossfade_bake():
    from libzl_tpu.ops.resample import bake_loop_crossfade

    x = tone(440.0, seconds=1.0)
    start, stop, fade = 4800, 43200, 960
    out = bake_loop_crossfade(x, start, stop, fade)
    # untouched outside the fade region
    np.testing.assert_array_equal(out[: stop - fade], x[: stop - fade])
    np.testing.assert_array_equal(out[stop:], x[stop:])
    # the loop seam is continuous: last faded sample ~ the sample just
    # before the loop start (equal-power blend endpoint)
    assert abs(out[stop - 1, 0] - x[start - 1, 0]) < 0.02
    # equal-power: mid-fade magnitude stays bounded
    assert np.abs(out[stop - fade : stop]).max() <= 1.0
    # no pre-start material -> no-op
    np.testing.assert_array_equal(bake_loop_crossfade(x, 0, 43200, 960), x)


def test_clip_crossfade_render(tmp_path):
    from libzl_tpu.engine.engine import AudioEngine
    from libzl_tpu.io.wav import AudioData
    from libzl_tpu.models.clip import ClipAudioSource

    engine = AudioEngine(backend="numpy", num_voices=8, sample_rate=48000)
    x = tone(333.0, seconds=1.0)
    clip = ClipAudioSource(engine, audio=AudioData(x, 48000))
    clip.set_start_position(0.2)
    clip.set_loop_crossfade(0.01)
    # playback buffer re-rendered with the bake; loop seam region changed
    pb = clip.playback_audio.samples
    stop = min(int(clip.get_stop_position() * 48000), pb.shape[0])
    assert not np.array_equal(pb[stop - 480 : stop], x[stop - 480 : stop])
    np.testing.assert_array_equal(pb[: stop - 480], x[: stop - 480])
