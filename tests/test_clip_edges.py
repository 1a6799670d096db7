"""Clip model edge paths: constructor validation, deferred-render worker
lifecycle and failure reporting, superseded-render drops, slice-list
bounds, and the mono crossfade promotion.

Reference analogs: ClipAudioSource construction/slice rules
(lib/ClipAudioSource.cpp:148-176, 495-578) and the needsRender deferred
re-render path (lib/ClipAudioSource.cpp:404-413), whose failure mode here
must be a recorded error + stale-buffer keep, never a crash of the worker.
"""

import time

import numpy as np
import pytest

from libzl_tpu.io.wav import AudioData
from libzl_tpu.models import clip as clip_mod
from libzl_tpu.models.clip import ClipAudioSource

SR = 48000


def mono_clip(seconds=0.2, engine=None, one_d=False):
    t = np.arange(int(SR * seconds)) / SR
    x = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    if not one_d:
        x = x[:, None]
    return ClipAudioSource(engine, audio=AudioData(x, SR))


def test_constructor_requires_source():
    with pytest.raises(ValueError, match="need filepath or audio"):
        ClipAudioSource(None)


def test_speed_ratio_must_be_positive():
    c = mono_clip()
    with pytest.raises(ValueError, match="speed ratio must be > 0"):
        c.set_speed_ratio(0.0)
    with pytest.raises(ValueError, match="speed ratio must be > 0"):
        c.set_speed_ratio(-1.5)


def test_slice_list_rules():
    c = mono_clip()
    n0 = c.slices
    c.set_slices(n0)                      # same count: no-op
    assert c.slices == n0
    c.set_slices(0)
    assert c.slice_positions == []
    assert c.slice_for_midi_note(60) == -1   # no slices -> -1
    c.set_slices(4)
    assert c.slices == 4
    c.set_slice_position(2, 0.65)
    assert c.slice_positions[2] == 0.65
    before = list(c.slice_positions)
    c.set_slice_position(17, 0.1)            # out of range: ignored
    c.set_slice_position(-1, 0.1)
    assert c.slice_positions == before


def test_audio_level_property_default():
    c = mono_clip()
    assert c.audio_level == c._last_level


def test_attach_loaded_audio_ignored_when_not_pending():
    c = mono_clip()
    src = c.source
    c._attach_loaded_audio(AudioData(np.zeros((8, 1), np.float32), SR))
    assert c.source is src


def test_superseded_render_is_dropped():
    c = mono_clip()
    old = c.playback_audio
    c._render_generation += 1
    c._finish_playback_update(
        np.zeros((4, 1), np.float32), gen=c._render_generation - 1
    )
    assert c.playback_audio is old


def test_deferred_render_failure_keeps_stale_buffer(capsys):
    c = mono_clip()
    old = c.playback_audio

    def boom():
        raise RuntimeError("stft exploded")

    c._compute_playback = boom
    c._update_playback(defer=True)
    deadline = time.monotonic() + 10.0
    while c.last_render_error is None and time.monotonic() < deadline:
        time.sleep(0.01)
    assert isinstance(c.last_render_error, RuntimeError)
    assert c.playback_audio is old
    err = capsys.readouterr().err
    assert "deferred render failed" in err


def test_deferred_render_without_engine_applies_directly():
    c = mono_clip(engine=None)
    old = c.playback_audio
    c.set_speed_ratio(2.0, defer=True)
    deadline = time.monotonic() + 10.0
    while c.playback_audio is old and time.monotonic() < deadline:
        time.sleep(0.01)
    assert c.playback_audio is not old
    assert c.playback_audio.num_frames == pytest.approx(
        old.num_frames / 2.0, rel=0.05)


def test_render_worker_sentinel_shutdown():
    clip_mod._ensure_render_worker()
    t = clip_mod._render_thread
    clip_mod._render_queue.put((None, 0))
    t.join(timeout=10.0)
    assert not t.is_alive()
    # the next deferred render restarts the worker transparently
    clip_mod._ensure_render_worker()
    assert clip_mod._render_thread.is_alive()
    assert clip_mod._render_thread is not t


def test_mono_crossfade_render_promotes_rank():
    """A 1-D source with a loop crossfade must promote to [n, 1] before
    the crossfade bake (bake_loop_crossfade is rank-2)."""
    c = mono_clip(one_d=True)
    c.set_loop_crossfade(0.02)
    out = c.playback_audio.samples
    assert out.ndim == 2 and out.shape[1] == 1
    assert np.isfinite(out).all()
