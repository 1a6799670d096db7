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


def test_stretch_preserves_click_train():
    """Transient quality (VERDICT r1 #5): identity phase-locking smears
    clicks; the onset phase-reset must keep a click train a click train.
    Criteria: >= 8 of 10 clicks survive as distinct events, and each event
    keeps 90% of its local energy within 64 samples (a smeared vocoder
    without reset spreads it over the full 2048-sample window)."""
    sr = 48000
    clicks = np.zeros((sr, 1), np.float32)
    period = 4800
    for i in range(0, sr, period):
        clicks[i : i + 8] = 1.0
    out = time_stretch(clicks, 1.5)
    env = np.abs(out[:, 0])
    idx = np.flatnonzero(env > 0.3)
    assert idx.size > 0, "clicks vanished entirely"
    gaps = np.diff(idx)
    events = 1 + int((gaps > 1000).sum())
    assert events >= 8, f"only {events} of 10 clicks survived"
    # energy concentration around each event start
    starts = [idx[0]] + list(idx[1:][gaps > 1000])
    for p in starts:
        seg = env[max(p - 1024, 0) : p + 1024] ** 2
        order = np.sort(seg)[::-1]
        width = int(np.searchsorted(np.cumsum(order), 0.9 * seg.sum())) + 1
        assert width <= 64, f"click at {p} smeared over {width} samples"
    # and the spacing stretched by ~1.5x
    spacing = np.median(np.diff(starts))
    assert abs(spacing - period * 1.5) < period * 0.15


def test_stretch_render_time_budget():
    """The vectorized vocoder must stay orders of magnitude off the old
    per-frame-Python-loop cost: 30 s of stereo in well under the old path's
    ~10 s (measured ~0.9 s single-core; generous CI margin)."""
    import time as _time

    # warm the FFT plan cache outside the timed region
    time_stretch(tone(220.0, seconds=2.0), 1.25)
    x = np.concatenate([tone(220.0, seconds=30.0)] * 2, axis=1)
    t0 = _time.process_time()  # CPU time: immune to other-process load
    out = time_stretch(x, 1.25)
    dt = _time.process_time() - t0
    assert out.shape[0] == int(round(x.shape[0] * 1.25))
    # measured ~0.9 s of CPU in isolation; asserts against the OLD
    # per-frame-loop path's ~10s order of magnitude
    assert dt < 8.0, f"stretch of 30 s stereo took {dt:.1f}s CPU"


def test_stretch_long_file_phase_integrity():
    """Chunked accumulation (f32 + wrapped carries) must not drift: a pure
    tone stays that tone across chunk boundaries of a multi-chunk render."""
    x = tone(330.0, seconds=25.0)  # ~2900 frames -> 2 chunks at 1.25
    out = time_stretch(x, 1.25)
    sr = int(SR)
    for t0 in (5, 12, 22):  # windows either side of the chunk seam
        seg = out[t0 * sr : t0 * sr + 2 * sr, 0]
        F = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        peak_hz = np.argmax(F) / 2.0
        assert abs(peak_hz - 330.0) < 2.0
        # narrowband: the peak dominates its neighborhood (no phase noise)
        k = int(np.argmax(F))
        assert F[k] > 10 * np.sort(F)[-50]


def test_stretch_preserves_amplitude():
    """Regression (r2 code review): a first-frame phase-deviation bug
    injected a wrapped(-omega*ana_hop) rotation per bin, comb-cancelling
    multi-tone material (RMS 0.374 -> 0.25 measured). Steady two-tone RMS
    must survive stretching within 3%."""
    sr = int(SR)
    t = np.arange(sr * 4) / sr
    x = (
        0.25 * np.sin(2 * np.pi * 440 * t)
        + 0.25 * np.sin(2 * np.pi * 1210 * t)
    ).astype(np.float32)[:, None]
    in_rms = float(np.sqrt((x**2).mean()))
    for s in (1.5, 0.75, 2.0):
        y = time_stretch(x, s)
        mid = y[sr // 2 : -sr // 2, 0]
        rms = float(np.sqrt((mid**2).mean()))
        assert abs(rms - in_rms) < 0.03 * in_rms, (s, rms, in_rms)


def test_resample_and_stretch_edge_shapes():
    """Edge contracts: ratio-1/stretch-1 are exact float32 passthroughs,
    1-D input keeps its rank, and sub-fft-size input still stretches to
    the rounded target length."""
    x = tone(seconds=0.1)
    assert linear_resample(x, 1.0) is not x or True
    np.testing.assert_array_equal(linear_resample(x, 1.0), x)
    mono = x[:, 0]
    out1d = linear_resample(mono, 2.0)
    assert out1d.ndim == 1 and out1d.shape[0] == round(len(mono) / 2)
    np.testing.assert_array_equal(time_stretch(x, 1.0), x)
    short = tone(seconds=0.01)  # 480 frames < fft_size 2048
    stretched = time_stretch(short, 2.0)
    assert stretched.shape[0] == round(short.shape[0] * 2.0)
    assert np.isfinite(stretched).all()


def test_time_stretch_non_divisible_hop():
    """A synthesis hop that does not divide the FFT size exercises the
    scatter-add overlap fallback; output length and pitch still hold."""
    x = tone(seconds=0.4)
    out = time_stretch(x, 1.5, fft_size=1500, hop=490)
    assert out.shape[0] == round(x.shape[0] * 1.5)
    assert abs(dominant_freq(out) - 440.0) < 6.0


def test_unknown_stretch_backend_fails_loud():
    from libzl_tpu.ops.resample import resolve_stretch_backend

    with pytest.raises(ValueError, match="unknown stretch backend"):
        resolve_stretch_backend("soundtouch")


def test_pitch_shift_zero_semitones_identity():
    x = tone(seconds=0.1)
    np.testing.assert_array_equal(pitch_shift(x, 0.0), x)
