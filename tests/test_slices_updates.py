"""Slice playback and live-voice update command semantics."""

import numpy as np
import pytest

from libzl_tpu.engine.commands import ClipCommand
from libzl_tpu.engine.engine import AudioEngine
from libzl_tpu.io.wav import AudioData
from libzl_tpu.models.clip import ClipAudioSource

SR = 48000


def make_session(seconds=1.0):
    engine = AudioEngine(sample_rate=SR, backend="numpy", num_voices=16)
    t = np.arange(int(SR * seconds)) / SR
    samples = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[:, None]
    clip = ClipAudioSource(engine, audio=AudioData(samples, SR))
    return engine, clip


def test_slice_positions_default_grid():
    _, clip = make_session()
    # 16 slices fitted evenly over [0, 1) (lib/ClipAudioSource.cpp:495-528)
    assert clip.slices == 16
    np.testing.assert_allclose(
        clip.slice_positions, np.arange(16) / 16, atol=1e-9
    )
    # start/stop of slice k span [k/16, (k+1)/16] of the length
    assert clip.get_start_position(4) == pytest.approx(0.25)
    assert clip.get_stop_position(4) == pytest.approx(0.3125)
    # last slice runs to the clip end
    assert clip.get_stop_position(15) == pytest.approx(1.0)


def test_slice_for_midi_note_rotation():
    _, clip = make_session()
    clip.slice_base_midi_note = 60
    # rotation rule (lib/ClipAudioSource.cpp:575-578)
    assert clip.slice_for_midi_note(60) == (16 - 60 % 16 + 60) % 16
    base = clip.slice_for_midi_note(60)
    assert clip.slice_for_midi_note(61) == (base + 1) % 16


def test_play_specific_slice():
    engine, clip = make_session()
    cmd = ClipCommand.channel(clip.id, 0)
    cmd.midi_note = 60
    cmd.change_slice = True
    cmd.slice = 8  # starts at 0.5 s into the clip
    cmd.start_playback = True
    cmd.change_volume = True
    cmd.volume = 1.0
    engine.schedule_clip_command(cmd, 0)
    engine.process_block()
    v = engine.pool.active.argmax()
    assert engine.pool.has_slice[v]
    assert engine.pool.slice_idx[v] == 8
    assert engine.pool.istart[v] == int(0.5 * SR)
    assert engine.pool.stop[v] == int(0.5625 * SR)
    # slice identity: a stop for a different slice must NOT stop this voice
    stop_other = ClipCommand.channel(clip.id, 0)
    stop_other.midi_note = 60
    stop_other.change_slice = True
    stop_other.slice = 3
    stop_other.stop_playback = True
    engine.schedule_clip_command(stop_other, 0)
    engine.process_block()
    assert engine.pool.active[v]
    # matching slice stop works
    stop_match = ClipCommand.channel(clip.id, 0)
    stop_match.change_slice = True
    stop_match.slice = 8
    stop_match.stop_playback = True
    engine.schedule_clip_command(stop_match, 0)
    for _ in range(40):
        engine.process_block()
    assert not engine.pool.active[v]


def test_live_voice_update_volume_and_looping():
    engine, clip = make_session(seconds=0.2)
    clip.play(loop=True, midi_channel=0)
    engine.process_block()
    v = engine.pool.active.argmax()
    assert engine.pool.gain[v] == 1.0
    assert engine.pool.looping[v]

    # update command (neither start nor stop): merge into the live voice
    # (lib/SamplerSynthVoice.cpp:58-98)
    upd = ClipCommand.channel(clip.id, 0)
    upd.midi_note = 60
    upd.change_volume = True
    upd.volume = 0.25
    upd.change_looping = True
    upd.looping = False
    engine.schedule_clip_command(upd, 0)
    engine.process_block()
    assert engine.pool.gain[v] == np.float32(0.25)
    assert not engine.pool.looping[v]
    # no longer looping: the voice now runs off the clip end and dies
    for _ in range(120):
        engine.process_block()
    assert not engine.pool.active[v]


def test_update_does_not_touch_other_notes():
    engine, clip = make_session()
    for note in (60, 64):
        cmd = ClipCommand.channel(clip.id, 0)
        cmd.midi_note = note
        cmd.start_playback = True
        cmd.change_volume = True
        cmd.volume = 1.0
        cmd.looping = True
        engine.schedule_clip_command(cmd, 0)
    engine.process_block()
    assert engine.pool.active.sum() == 2
    upd = ClipCommand.channel(clip.id, 0)
    upd.midi_note = 64
    upd.change_volume = True
    upd.volume = 0.1
    engine.schedule_clip_command(upd, 0)
    engine.process_block()
    gains = {
        int(engine.pool.midi_note[v]): float(engine.pool.gain[v])
        for v in np.flatnonzero(engine.pool.active)
    }
    assert gains[60] == 1.0 and gains[64] == np.float32(0.1)


def test_live_slice_change_moves_loop_points():
    engine, clip = make_session()
    cmd = ClipCommand.channel(clip.id, 0)
    cmd.midi_note = 60
    cmd.change_slice = True
    cmd.slice = 2
    cmd.start_playback = True
    cmd.looping = True
    engine.schedule_clip_command(cmd, 0)
    engine.process_block()
    v = engine.pool.active.argmax()
    assert engine.pool.istart[v] == int(2 / 16 * SR)
    upd = ClipCommand.channel(clip.id, 0)
    upd.change_slice = True
    upd.slice = 2  # identity matches slice 2...
    engine.schedule_clip_command(upd, 0)
    engine.process_block()
    # ...and a slice-identified update retargets loop points when the
    # command carries a new slice value on a matching voice
    upd2 = ClipCommand.channel(clip.id, 0)
    upd2.change_slice = True
    upd2.slice = 2
    upd2.change_volume = True
    upd2.volume = 0.5
    engine.schedule_clip_command(upd2, 0)
    # a tick lands every ~250 samples vs 128-frame blocks: allow two blocks
    engine.process_block()
    engine.process_block()
    assert engine.pool.gain[v] == np.float32(0.5)


def test_scheduled_pitch_change_renders_off_the_block_path():
    """A sequenced change_pitch command must NOT run the whole-clip STFT
    inside process_block (r2 code review): the old buffer keeps playing and
    the new render lands at a later block boundary, like the reference's
    needsRender -> playbackFileChanged flow."""
    import time

    import numpy as np

    from libzl_tpu.engine.commands import ClipCommand
    from libzl_tpu.engine.engine import AudioEngine
    from libzl_tpu.io.wav import AudioData
    from libzl_tpu.models.clip import ClipAudioSource

    sr = 48000
    engine = AudioEngine(sample_rate=sr, backend="numpy", num_voices=8)
    # a long clip so a synchronous render would be clearly measurable
    t = np.arange(sr * 10) / sr
    clip = ClipAudioSource(engine, audio=AudioData(
        (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[:, None], sr))
    engine.start_transport(bpm=120)
    changed = []
    clip.playback_changed_callback = lambda: changed.append(True)

    cmd = ClipCommand.channel(clip.id, 0)
    cmd.midi_note = 60
    cmd.change_pitch = True
    cmd.pitch_change = 3.0
    engine.schedule_clip_command(cmd, 0)

    t0 = time.perf_counter()
    engine.process_block()
    dispatch_ms = (time.perf_counter() - t0) * 1e3
    # the 10 s STFT takes ~1 s; the block must come back far faster
    assert dispatch_ms < 200, f"block stalled {dispatch_ms:.0f} ms on render"
    assert clip.pitch_change == 3.0
    assert not changed, "render applied synchronously inside the block"

    # the worker finishes and the swap lands at a block boundary
    deadline = time.monotonic() + 30.0
    while not changed and time.monotonic() < deadline:
        engine.process_block()
        time.sleep(0.01)
    assert changed, "deferred render never landed"
    # rendered pitch actually moved: dominant frequency of the playback
    seg = clip.playback_audio.samples[sr : 2 * sr, 0]
    F = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    hz = np.argmax(F)
    assert abs(hz - 220 * 2 ** (3 / 12)) < 4
