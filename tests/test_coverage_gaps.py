"""Coverage-driven edge tests (tools/cov.py found these paths unexercised).

Each test pins behavior that existed but had no test: the fader curve's
public helpers, positions-model callbacks, command coalescing branches,
sampler-map unassign/slice mode, sound-bank growth, thumbnail shape edges,
and the disk recorder's 24/32-bit and failure paths.
"""

from __future__ import annotations

import numpy as np
import pytest

SR = 48000


# --------------------------------------------------------------- fader curve

def test_fader_mute_rule_and_roundtrip():
    """decibelsToVolumeFaderPosition's -40 dB mute rule + dBFromVolume
    inverse (lib/libzl.cpp:429; models/fader.py documents the substituted
    power-law)."""
    from libzl_tpu.models.fader import (
        DB_FLOOR,
        db_to_fader_position,
        db_to_gain,
        fader_position_to_db,
    )

    # at or below -40 dB the fader snaps to 0 (mute)
    assert db_to_fader_position(-40.0) == 0.0
    assert db_to_fader_position(-60.0) == 0.0
    # unity and the top clamp
    assert db_to_fader_position(0.0) == pytest.approx(1.0)
    assert db_to_fader_position(12.0) == 1.0
    # position -> dB: floor at 0 position, clamp above 1
    assert fader_position_to_db(0.0) == DB_FLOOR
    assert fader_position_to_db(-0.5) == DB_FLOOR
    assert fader_position_to_db(1.5) == pytest.approx(0.0)
    # roundtrip on the live range (above the mute threshold)
    for db in (-39.0, -20.0, -6.0, -1.0, 0.0):
        assert fader_position_to_db(db_to_fader_position(db)) == pytest.approx(db)
    # amplitude conversion
    assert db_to_gain(0.0) == pytest.approx(1.0)
    assert db_to_gain(-6.0) == pytest.approx(10 ** (-6 / 20))


# --------------------------------------------------------- positions model

def _fake_clock():
    t = [0.0]

    def clock():
        return t[0]

    return t, clock


def test_positions_callbacks_and_missing_ids():
    """Peak-gain / first-progress callbacks fire only on change
    (lib/ClipAudioSourcePositionsModel.cpp:126-138,160-185); updates to
    unknown ids are silently ignored like the reference's row lookup."""
    from libzl_tpu.models.positions import PositionsModel

    t, clock = _fake_clock()
    m = PositionsModel(clock=clock)
    peaks, progresses = [], []
    m.on_peak_gain_changed = peaks.append
    m.on_first_progress_changed = progresses.append

    m.create_position(7)
    m.set_gain_and_progress(7, 0.5, 0.25)
    assert peaks == [0.5] and progresses == [0.25]
    # same gain again: no peak callback, progress callback still fires
    m.set_gain_and_progress(7, 0.5, 0.30)
    assert peaks == [0.5] and progresses[-1] == 0.30
    # unknown id: no crash, no callbacks
    m.set_gain_and_progress(999, 1.0, 1.0)
    assert peaks == [0.5]
    # set_many skips unknown ids but applies the rest
    m.set_many([7, 999], [0.8, 0.9], [0.4, 0.5])
    assert peaks[-1] == 0.8 and progresses[-1] == 0.4
    # reaper returns the number dropped and peak returns to 0
    t[0] += 10.0
    assert m.cleanup() == 1
    assert len(m) == 0 and m.peak_gain() == 0.0


def test_positions_callbacks_absent_is_cheap_noop():
    """Without listeners, updates must not compute or emit anything (the
    watch-gated scan in set_gain_and_progress)."""
    from libzl_tpu.models.positions import PositionsModel

    t, clock = _fake_clock()
    m = PositionsModel(clock=clock)
    m.create_position(1)
    m.set_gain_and_progress(1, 0.9, 0.1)  # no callbacks registered
    assert m.peak_gain() == pytest.approx(0.9)
    assert m.first_progress() == pytest.approx(0.1)


# ------------------------------------------------------------ clip commands

def test_clip_command_merge_all_change_flags():
    """Coalescing merge copies every flagged field and leaves unflagged
    fields alone (lib/SyncTimer.cpp:1014-1041)."""
    from libzl_tpu.engine.commands import ClipCommand

    dst = ClipCommand(clip_id=3)
    src = ClipCommand(
        clip_id=3,
        change_looping=True, looping=True,
        change_pitch=True, pitch_change=2.5,
        change_speed=True, speed_ratio=1.5,
        change_gain_db=True, gain_db=-3.0,
        change_volume=True, volume=0.7,
        start_playback=True,
    )
    dst.merge_from(src)
    assert dst.looping and dst.change_looping
    assert dst.pitch_change == 2.5 and dst.change_pitch
    assert dst.speed_ratio == 1.5 and dst.change_speed
    assert dst.gain_db == -3.0 and dst.change_gain_db
    assert dst.volume == 0.7 and dst.change_volume
    assert dst.start_playback
    # an all-defaults source leaves the merged state untouched
    dst.merge_from(ClipCommand(clip_id=3))
    assert dst.pitch_change == 2.5 and dst.volume == 0.7


def test_clip_command_factories_channel_conventions():
    """Factory channels match lib/ClipCommand.h:44-72 (-2 uneffected,
    -1 effected, 0..9 channel)."""
    from libzl_tpu.engine.commands import (
        CHANNEL_GLOBAL_EFFECTED,
        CHANNEL_GLOBAL_UNEFFECTED,
        ClipCommand,
    )

    assert ClipCommand.no_effect(1).midi_channel == CHANNEL_GLOBAL_UNEFFECTED
    assert ClipCommand.effected(1).midi_channel == CHANNEL_GLOBAL_EFFECTED
    assert ClipCommand.channel(1, 4).midi_channel == 4


# ------------------------------------------------------------- sampler map

def _sampler_engine():
    from libzl_tpu.engine.engine import AudioEngine

    return AudioEngine(sample_rate=SR, backend="numpy", num_voices=8)


def test_sampler_map_unassign_and_truncated_bytes():
    """unassign() stops the mapping; truncated MIDI bytes must not crash
    the block loop (the VirtualMidiPort.feed raw-bytes guard)."""
    from libzl_tpu.io.wav import AudioData
    from libzl_tpu.midi import messages as mm
    from libzl_tpu.midi.devices import VirtualMidiPort
    from libzl_tpu.midi.router import Destination
    from libzl_tpu.models.clip import ClipAudioSource

    engine = _sampler_engine()
    tone = (0.5 * np.sin(2 * np.pi * 220 * np.arange(SR // 4) / SR))
    clip = ClipAudioSource(
        engine, audio=AudioData(tone.astype(np.float32)[:, None], SR)
    )
    engine.router.set_channel_destination(2, Destination.SAMPLER)
    engine.sampler_map.assign(2, clip)
    engine.sampler_map.unassign(2, clip)
    engine.sampler_map.unassign(2, clip)  # idempotent
    pads = VirtualMidiPort("pads")
    engine.router.registry.add_input(pads)
    engine.router.current_channel = 2

    pads.feed(mm.note_on(64, 100, ch=0))
    pads.feed(bytes([0x92]))  # truncated note-on, no note byte
    engine.process_block()
    assert engine.pool.active.sum() == 0  # unassigned: nothing triggers


def test_sampler_map_slice_mode_selects_slice():
    """slice_mode assignments set change_slice with the rotation rule
    (lib/ClipAudioSource.cpp:575-578)."""
    from libzl_tpu.io.wav import AudioData
    from libzl_tpu.midi import messages as mm
    from libzl_tpu.midi.devices import VirtualMidiPort
    from libzl_tpu.midi.router import Destination
    from libzl_tpu.models.clip import ClipAudioSource

    engine = _sampler_engine()
    tone = (0.5 * np.sin(2 * np.pi * 220 * np.arange(SR // 2) / SR))
    clip = ClipAudioSource(
        engine, audio=AudioData(tone.astype(np.float32)[:, None], SR)
    )
    clip.set_slices(4)
    engine.router.set_channel_destination(2, Destination.SAMPLER)
    engine.sampler_map.assign(2, clip, slice_mode=True)
    pads = VirtualMidiPort("pads")
    engine.router.registry.add_input(pads)
    engine.router.current_channel = 2

    note = 62
    pads.feed(mm.note_on(note, 100, ch=0))
    engine.process_block()
    assert engine.pool.active.sum() == 1
    v = int(engine.pool.active.argmax())
    # the voice starts inside the selected slice, not at the clip head
    want = clip.slice_for_midi_note(note)
    assert want == 2  # rotation of note 62 around the default base
    start = clip.slice_positions[want] * len(tone)
    assert engine.pool.istart[v] >= start - 1


# -------------------------------------------------------------- sound bank

def test_soundbank_growth_preserves_regions():
    """Loading past capacity doubles the flat array (multiple of 1024)
    and keeps existing regions bit-identical."""
    from libzl_tpu.engine.soundbank import SoundBank
    from libzl_tpu.io.wav import AudioData

    bank = SoundBank(capacity_frames=8192)
    a = np.linspace(-1, 1, 3000, dtype=np.float32)[:, None]
    s1 = bank.load(AudioData(a, SR))
    v0 = bank.version
    big = np.full((20000, 1), 0.25, dtype=np.float32)
    s2 = bank.load(AudioData(big, SR))
    assert bank.capacity_frames > 8192
    assert bank.capacity_frames % 1024 == 0
    assert bank.version > v0
    got1 = bank.data[0, s1.base : s1.base + s1.length]
    np.testing.assert_array_equal(got1, a[:, 0])
    got2 = bank.data[1, s2.base : s2.base + s2.length]
    np.testing.assert_array_equal(got2, big[:, 0])
    # slot() accessor returns the live table entry
    assert bank.slot(s2.slot).length == 20000


def test_soundbank_replace_larger_appends_region():
    """replace() reuses the region when the new audio fits, appends when
    it does not (lib/SamplerSynthSound.cpp:68 reload semantics)."""
    from libzl_tpu.engine.soundbank import SoundBank
    from libzl_tpu.io.wav import AudioData

    bank = SoundBank()
    small = np.zeros((100, 1), np.float32)
    s = bank.load(AudioData(small, SR))
    base0 = s.base
    # fits: same region
    s = bank.replace(s.slot, AudioData(np.ones((50, 1), np.float32), SR))
    assert s.base == base0 and s.length == 50
    # doesn't fit: new region, same slot id
    s = bank.replace(s.slot, AudioData(np.ones((5000, 1), np.float32), SR))
    assert s.base != base0 and s.length == 5000


# --------------------------------------------------------------- thumbnails

def test_thumbnail_mono_1d_and_short_window():
    from libzl_tpu.ops.thumbnail import thumbnail_math

    # 1-D mono input is promoted to [T, 1]
    mono = np.sin(np.linspace(0, 20, 4096)).astype(np.float32)
    mins, maxs = thumbnail_math(np, mono, 512)
    assert mins.shape == (512, 1) and maxs.shape == (512, 1)
    assert (maxs >= mins).all()

    # window shorter than the bucket count: edge-pad, never crash
    short = np.linspace(-0.5, 0.5, 37, dtype=np.float32)[:, None]
    mins, maxs = thumbnail_math(np, short, 512)
    assert mins.shape == (512, 1)
    # padded tail repeats the final sample
    assert maxs[-1, 0] == pytest.approx(0.5)
    assert mins[0, 0] == pytest.approx(-0.5)


# ------------------------------------------------------------ disk recorder

def _push_tone(rec, frames=4096):
    t = np.arange(frames) / SR
    block = np.stack(
        [0.5 * np.sin(2 * np.pi * 440 * t), 0.25 * np.sin(2 * np.pi * 220 * t)],
        axis=1,
    ).astype(np.float32)
    rec.push(block)
    return block


@pytest.mark.parametrize("depth", [24, 32])
def test_recorder_deep_bit_depths_roundtrip(tmp_path, depth):
    """24/32-bit recording paths (the reference's DiskWriter is 16-bit WAV
    only; depth is this build's extension) — read back within one LSB."""
    from libzl_tpu.engine.recorder import DiskRecorder
    from libzl_tpu.io.wav import read_audio

    rec = DiskRecorder(bit_depth=depth)
    path = tmp_path / f"take{depth}.wav"
    rec.start(path, SR)
    block = _push_tone(rec)
    rec.stop()
    assert rec.frames_written == block.shape[0] and not rec.failed
    a = read_audio(path)
    assert a.sample_rate == SR and a.samples.shape == block.shape
    np.testing.assert_allclose(
        a.samples, block, atol=1.5 / (2 ** (depth - 1))
    )


def test_recorder_writer_failure_marks_failed_and_drains(tmp_path):
    """A writer whose writeframes dies (disk full / target deleted) marks
    the session failed, stops recording, and keeps draining so producers
    never block on a permanently-full queue."""
    from libzl_tpu.engine.recorder import DiskRecorder

    rec = DiskRecorder()
    rec.start(tmp_path / "take.wav", SR)

    def boom(raw):
        raise OSError("disk full")

    # the writer thread captured this session's wave object at start();
    # fail it in place so the next writeframes dies like a full disk
    rec._wave.writeframes = boom
    for _ in range(50):
        _push_tone(rec, frames=128)
    deadline = __import__("time").time() + 5.0
    while not rec.failed and __import__("time").time() < deadline:
        __import__("time").sleep(0.01)
    assert rec.failed and not rec.is_recording
    rec.stop()
    assert rec.frames_written == 0  # nothing credited post-failure
    # producers never wedge after the failure: pushes become cheap no-ops
    _push_tone(rec, frames=128)


def test_recorder_transcode_failure_keeps_sidecar_wav(tmp_path, monkeypatch):
    """A failing post-roll transcode must never lose audio: the sidecar
    WAV stays on disk and the recorder reports failed."""
    from libzl_tpu.engine import recorder as rec_mod
    from libzl_tpu.io import codecs
    from libzl_tpu.io.wav import read_audio

    def boom(*a, **k):
        raise RuntimeError("no encoder")

    monkeypatch.setattr(codecs, "write_ogg", boom)
    rec = rec_mod.DiskRecorder()
    target = tmp_path / "take.ogg"
    rec.start(target, SR)
    block = _push_tone(rec)
    rec.stop()
    assert rec.failed
    assert not target.exists()
    sidecar = tmp_path / "take.ogg.part.wav"
    assert sidecar.exists()
    a = read_audio(sidecar)
    assert a.samples.shape[0] == block.shape[0]


def test_channel_lane_mapping_bounds():
    """The channel convention (-2 uneffected-global, -1 effected-global,
    0-9 channels; reference ClipCommand.h:44-72) and its inverse must
    reject out-of-range values loudly."""
    from libzl_tpu.constants import channel_to_lane, lane_to_channel

    assert channel_to_lane(-2) == 0
    assert channel_to_lane(9) == 11
    with pytest.raises(ValueError, match="sampler channel out of range"):
        channel_to_lane(10)
    with pytest.raises(ValueError, match="sampler channel out of range"):
        channel_to_lane(-3)
    assert lane_to_channel(0) == -2
    assert lane_to_channel(11) == 9
    with pytest.raises(ValueError, match="sampler lane out of range"):
        lane_to_channel(12)
    with pytest.raises(ValueError, match="sampler lane out of range"):
        lane_to_channel(-1)


def test_transport_position_and_empty_event():
    """TransportManager.position() exposes BBT for external observers
    (the timebase-master callback analog, lib/TransportManager.cpp:120-137)
    and empty MIDI payloads are skipped."""
    from libzl_tpu.engine.engine import AudioEngine

    engine = AudioEngine(backend="numpy", num_voices=8)
    engine.start_transport(bpm=120)
    engine.process_block()
    bbt = engine.transport.position()
    assert bbt.bar >= 0 and bbt.beat >= 0
    # an empty payload must not crash or change transport state
    engine.transport.handle_passthrough([(0, b"")])
    assert engine.transport_running
