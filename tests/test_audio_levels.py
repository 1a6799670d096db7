"""AudioLevels metering + recording tests."""

import numpy as np
import pytest

from libzl_tpu.engine.engine import AudioEngine
from libzl_tpu.io.wav import AudioData, read_wav
from libzl_tpu.models.clip import ClipAudioSource
from libzl_tpu.ops.meters import add_dbfs, to_dbfs

SR = 48000


def make_session():
    engine = AudioEngine(sample_rate=SR, backend="numpy", num_voices=16)
    t = np.arange(SR) / SR
    samples = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[:, None]
    clip = ClipAudioSource(engine, audio=AudioData(samples, SR))
    return engine, clip


def run_blocks(engine, n):
    for _ in range(n):
        res = engine.process_block()
        engine.update_session(res)
    return res


def test_dbfs_semantics():
    assert to_dbfs(0.0) == -200.0
    assert to_dbfs(-1.0) == -200.0
    assert to_dbfs(1.0) == pytest.approx(0.0)
    assert to_dbfs(0.5) == pytest.approx(-6.0206, abs=1e-3)
    # power sum of two equal levels is +10*log10(2) ~ +3.01 dB
    assert add_dbfs(-6.0, -6.0) == pytest.approx(-6.0 + 10 * np.log10(2))


def test_meters_track_playback():
    engine, clip = make_session()
    run_blocks(engine, 25)
    assert engine.levels.playback_a == -200.0  # silence
    clip.play(loop=True, midi_channel=2)
    run_blocks(engine, 40)
    # mono sine at 0.5 through M/S pan halves to 0.25 per side = -12 dBFS,
    # plus the reference's deliberate x0.2 int->float factor (-14 dB,
    # lib/AudioLevels.cpp:348) => ~ -26 dB displayed
    assert -35 < engine.levels.playback_a < -20
    assert -35 < engine.levels.channels_a[2] < -20
    assert engine.levels.channels_a[5] == -200.0
    assert engine.levels.playback_a_hold >= engine.levels.playback_a - 1e-6


def test_peak_hold_decays_after_stop():
    engine, clip = make_session()
    clip.play(loop=True, midi_channel=0)
    run_blocks(engine, 40)
    peak_during = engine.levels.playback_a_hold
    clip.stop(0)
    run_blocks(engine, 500)
    assert engine.levels.playback_a == -200.0
    assert engine.levels.playback_a_hold < peak_during - 10


def test_global_playback_recording(tmp_path):
    engine, clip = make_session()
    target = tmp_path / "take.wav"
    engine.levels.set_record_global_playback(True)
    engine.levels.set_global_playback_filename_prefix(str(target))
    clip.play(loop=True, midi_channel=0)
    engine.levels.start_recording()
    assert engine.levels.is_recording
    run_blocks(engine, 80)
    engine.levels.stop_recording()
    assert not engine.levels.is_recording
    back = read_wav(target)
    assert back.num_frames == 80 * 128
    assert np.abs(back.samples).max() > 0.05


def test_port_recording_lane_tap(tmp_path):
    engine, clip = make_session()
    prefix = str(tmp_path / "ports.wav")
    engine.levels.set_should_record_ports(True)
    engine.levels.set_record_ports_filename_prefix(prefix)
    engine.levels.add_record_port("lane:2", 0)
    engine.levels.add_record_port("lane:2", 1)
    clip.play(loop=True, midi_channel=0)  # lane 2
    engine.levels.start_recording()
    run_blocks(engine, 40)
    engine.levels.stop_recording()
    back = read_wav(prefix)
    assert back.num_frames == 40 * 128
    assert np.abs(back.samples).max() > 0.05


def test_channel_recording(tmp_path):
    engine, clip = make_session()
    engine.levels.set_record_ports_filename_prefix(str(tmp_path) + "/")
    engine.levels.set_channels_to_record([3])
    clip.play(loop=True, midi_channel=3)
    engine.levels.start_recording()
    run_blocks(engine, 30)
    engine.levels.stop_recording()
    files = list(tmp_path.glob("channel4-*.wav"))
    assert len(files) == 1
    assert read_wav(files[0]).num_frames == 30 * 128


def test_timestamped_vs_exact_filenames(tmp_path):
    from libzl_tpu.engine.recorder import timestamped_filename

    exact = str(tmp_path / "exact.wav")
    assert timestamped_filename(exact) == exact
    stamped = timestamped_filename(str(tmp_path / "take-"))
    assert stamped.startswith(str(tmp_path / "take-"))
    assert stamped.endswith(".wav") and stamped != str(tmp_path / "take-")


def test_per_channel_record_toggles_and_prefixes(tmp_path):
    engine, clip = make_session()
    engine.levels.set_channel_to_record(2, True)
    engine.levels.set_channel_to_record(7, True)
    engine.levels.set_channel_to_record(7, False)
    assert engine.levels.channels_to_record == [2]
    engine.levels.set_channel_filename_prefix(2, str(tmp_path / "take2.wav"))
    clip.play(loop=True, midi_channel=2)
    engine.levels.start_recording()
    run_blocks(engine, 20)
    engine.levels.stop_recording()
    back = read_wav(tmp_path / "take2.wav")
    assert back.num_frames == 20 * 128
    assert np.abs(back.samples).max() > 0.01


def test_pump_cadence_meters_move():
    """Regression: the C-API pump consumes block N-1 after dispatching N and
    only calls update_session at the 50 ms cadence. With the old modulo gate
    (total_blocks % every == 0, checked one block late) analyze() never ran
    and every meter stayed at the -200 floor. Reproduce the pump's exact
    call pattern and assert meters move."""
    engine, clip = make_session()
    clip.play(loop=True, midi_channel=2)
    every = engine._levels_every
    prev = None
    prev_block_no = 0
    for _ in range(3 * every + 2):
        res = engine.process_block()
        if prev is not None:
            if prev_block_no % every == 0:
                engine.update_session(prev, include_recorders=False)
            else:
                engine.accumulate_peaks(prev)
        prev = res
        prev_block_no = engine.total_blocks
    assert engine.levels.playback_a > -200.0
    assert engine.levels.channels_a[2] > -200.0


def test_accumulated_peaks_catch_transients():
    """A one-block transient landing between analysis points must still
    register (accumulate_peaks folds skipped blocks' maxima)."""
    engine, clip = make_session()
    every = engine._levels_every
    # silence through the first analysis, then a short un-looped hit that
    # dies before the next update_session call
    res = engine.process_block()
    engine.update_session(res)
    clip.play(loop=False, midi_channel=1)
    collected = []
    for _ in range(every - 1):
        r = engine.process_block()
        engine.accumulate_peaks(r)
        collected.append(r)
    clip.stop(1)
    r = engine.process_block()
    engine.update_session(r)
    assert engine.levels.channels_a[1] > -200.0


def test_rms_metering():
    engine, clip = make_session()
    clip.play(loop=True, midi_channel=4)
    run_blocks(engine, 30)
    # a 0.25-peak sine has RMS ~ peak/sqrt(2) => ~ -15 dBFS (no x0.2 factor
    # on the RMS path)
    assert -20 < engine.levels.channels_rms[4] < -10
    assert engine.levels.channels_rms[0] == -200.0


def test_quiet_steady_signal_reads_true_peak():
    """Decay order regression (lib/AudioLevels.cpp:359-383): the current
    block's peak must display at FULL value — decaying before conversion
    pinned steady signals below ~-22 dBFS (raw peak < decay step) at the
    -200 floor."""
    engine, clip = make_session()
    clip.set_volume(-26.0)  # quiet: raw master peak well under 0.076
    clip.play(loop=True, midi_channel=2)
    res = run_blocks(engine, 40)
    raw_peak = float(np.asarray(res.outputs.master_peak).max())
    assert 0.001 < raw_peak < 0.076, raw_peak  # in the regression regime
    want_db = 20 * np.log10(raw_peak) - 14.0  # x0.2 int->float factor
    assert engine.levels.playback_a > -200.0, "meter pinned at the floor"
    assert abs(engine.levels.playback_a - want_db) < 3.0, (
        engine.levels.playback_a, want_db)


def test_multiport_recording_one_channel_per_port(tmp_path):
    """The reference's ports writer records recordPorts.count() channels —
    one per (port, channel) pair (lib/AudioLevels.cpp:548); more than two
    ports must not be silently dropped."""
    engine, clip = make_session()
    prefix = str(tmp_path / "multi.wav")
    lv = engine.levels
    lv.set_should_record_ports(True)
    lv.set_record_ports_filename_prefix(prefix)
    for p in (("lane:2", 0), ("lane:2", 1), ("master", 0), ("capture", 0)):
        lv.add_record_port(*p)
    clip.play(loop=True, midi_channel=0)
    lv.start_recording()
    run_blocks(engine, 20)
    lv.stop_recording()
    back = read_wav(prefix)
    assert back.samples.shape == (20 * 128, 4)
    assert np.abs(back.samples[:, 0]).max() > 0.05   # lane tap
    assert np.abs(back.samples[:, 2]).max() > 0.05   # master tap
    assert np.abs(back.samples[:, 3]).max() == 0.0   # no capture source


def test_bad_record_port_raises_at_add_not_in_pump():
    """Malformed port names raise to the API caller; the pump's per-block
    feed records silence for anything unresolvable instead of dying (100
    consecutive feed failures would kill audio)."""
    import pytest

    engine, clip = make_session()
    lv = engine.levels
    for bad in ("lane:12", "lane:x", "strip:0:wet3", "strip:11:dry"):
        with pytest.raises(ValueError):
            lv.add_record_port(bad, 0)
    # tolerant feed: even a name that slipped in (old session state) only
    # records silence
    lv.record_ports.append(("lane:99", 0))
    lv.set_should_record_ports(True)
    lv.set_record_ports_filename_prefix("/tmp/tolerant_ports.wav")
    lv.start_recording()
    run_blocks(engine, 10)
    lv.stop_recording()
    assert read_wav("/tmp/tolerant_ports.wav").num_frames == 10 * 128


def test_take_shares_one_timestamp(tmp_path, monkeypatch):
    """All recorders of one take get the SAME '-<stamp>' suffix (the
    reference's single QString timestamp) so files group together."""
    engine, clip = make_session()
    lv = engine.levels
    lv.set_record_global_playback(True)
    lv.set_global_playback_filename_prefix(str(tmp_path / "glob"))
    lv.set_channels_to_record([0, 3])
    lv.set_record_ports_filename_prefix(str(tmp_path) + "/")
    clip.play(loop=True, midi_channel=0)
    lv.start_recording()
    run_blocks(engine, 10)
    lv.stop_recording()
    stamps = set()
    for f in tmp_path.glob("*.wav"):
        name = f.name[:-4]
        stamps.add(name.rsplit("-", 2)[-2] + "-" + name.rsplit("-", 2)[-1])
    assert len(stamps) == 1, f"take split across stamps: {stamps}"


def test_wedged_writer_drops_fast_instead_of_blocking():
    """With a full queue and a writer making no progress, push must drop
    immediately after the first bounded wait — not wait PUSH_TIMEOUT_S per
    block under the engine lock (a de-facto freeze)."""
    import time as _time

    from libzl_tpu.engine.recorder import DiskRecorder

    rec = DiskRecorder()
    rec._recording = True
    rec.frames_written = 0
    rec.dropped_blocks = 0
    rec._frames_at_last_full = -1
    import queue as _q

    rec._queue = _q.Queue(maxsize=1)
    rec._queue.put_nowait(np.zeros((128, 2), np.float32))  # full, no writer
    rec.PUSH_TIMEOUT_S = 0.2
    t0 = _time.perf_counter()
    rec.push(np.zeros((128, 2), np.float32))   # first full event: may wait
    first = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    for _ in range(10):
        rec.push(np.zeros((128, 2), np.float32))
    rest = _time.perf_counter() - t0
    assert rec.dropped_blocks == 11
    assert first <= 1.0 and rest < 0.1, (first, rest)


def test_strip_port_tap_recording(tmp_path):
    """strip:<idx>:<dry|wet1|wet2> record ports tap the passthrough sends
    (the FXPassthrough-ChannelN wet ports a reference user records)."""
    engine, clip = make_session()
    engine.set_strip(0, wet1=0.8, dry=0.5)
    engine.levels.set_record_ports_filename_prefix(
        str(tmp_path / "strip.wav"))
    # strip index 1 = channel 0 (index 0 is the global strip)
    engine.levels.add_record_port("strip:1:wet1", 0)
    engine.levels.add_record_port("strip:1:wet1", 1)
    engine.levels.set_should_record_ports(True)
    engine.levels.start_recording()
    clip.play(loop=True, midi_channel=0)
    engine.start_transport(bpm=120)
    run_blocks(engine, 40)
    engine.levels.stop_recording()
    rec = read_wav(tmp_path / "strip.wav")
    assert rec.num_frames > 0 and np.abs(rec.samples).max() > 0.01


def test_strip_port_validation_and_unknown_fallback(tmp_path):
    engine, _ = make_session()
    with pytest.raises(ValueError, match="strip out of range"):
        engine.levels.add_record_port("strip:11:wet1", 0)
    # unknown names are accepted and resolve to the master tap in the pump
    # (the reference's failed jack_connect records silence, not a crash)
    engine.levels.add_record_port("no-such-port", 0)
    res = engine.process_block()
    mono = engine.levels._resolve_port(res.outputs, "no-such-port", 0)
    assert mono.shape == (engine.block_frames,)
    # a malformed strip spec inside the pump feed degrades to silence
    bad = engine.levels._resolve_port(res.outputs, "strip:nope:wet9", 0)
    assert not bad.any()


def test_record_port_list_editing():
    engine, _ = make_session()
    lv = engine.levels
    lv.add_record_port("master", 0)
    lv.remove_record_port("master", 0)
    lv.remove_record_port("master", 0)      # absent: no-op, like jack_disconnect
    assert lv.record_ports == []
    lv.add_record_port("master", 1)
    lv.clear_record_ports()
    assert lv.record_ports == []
    # channel list setters clamp to the 10 tracks
    lv.set_channels_to_record([0, 5, 99, -1])
    assert lv.channels_to_record == [0, 5]
    lv.set_channel_to_record(3, True)
    lv.set_channel_to_record(42, True)      # out of range: ignored
    assert 3 in lv.channels_to_record and 42 not in lv.channels_to_record
    lv.set_channel_to_record(3, False)
    assert 3 not in lv.channels_to_record


def test_mono_capture_ingest():
    """A mono AudioSource block meters on both capture channels."""
    engine, _ = make_session()
    mono = np.full(engine.block_frames, 0.25, np.float32)
    engine.levels.ingest_capture(mono)
    engine.levels.analyze()
    assert engine.levels.capture_a > -200.0
    assert engine.levels.capture_b > -200.0


def test_recorder_mp3_target_and_restart(tmp_path):
    """A .mp3 record target transcodes post-roll via lame; starting a new
    session while recording stops the old one cleanly (file_path follows
    the active session)."""
    from libzl_tpu.engine.recorder import DiskRecorder
    from libzl_tpu.io import codecs

    if not (codecs.mp3_read_available() and codecs.mp3_write_available()):
        pytest.skip("no system mp3 libraries")
    rec = DiskRecorder()
    first = tmp_path / "a.mp3"
    second = tmp_path / "b.mp3"
    rec.start(first, SR)
    assert rec.file_path == first
    rec.push(np.full((4096, 2), 0.25, np.float32))
    rec.start(second, SR)        # implicit stop of the first session
    assert rec.file_path == second
    rec.push(np.full((4096, 2), 0.25, np.float32))
    rec.stop()
    assert first.exists() and second.exists()
    assert not rec.failed
    a = codecs.read_mp3(second)
    assert a.sample_rate == SR and a.samples.shape[0] > 0


def test_port_list_edits_midtake_apply_next_take(tmp_path):
    """Editing record_ports during a live take must not change the width
    of blocks fed to the fixed-channel WAV writer (the wave module would
    silently interleave the mismatch and garble the whole take). Edits
    land on the NEXT take, like the reference's connect-at-start wiring
    (lib/AudioLevels.cpp:484-499, 548)."""
    engine, clip = make_session()
    lv = engine.levels
    first = str(tmp_path / "take1.wav")
    lv.set_should_record_ports(True)
    lv.set_record_ports_filename_prefix(first)
    lv.add_record_port("lane:2", 0)
    clip.play(loop=True, midi_channel=0)
    lv.start_recording()
    run_blocks(engine, 10)
    # mid-take edits: add one, and only_global must still see the take
    lv.add_record_port("master", 0)
    assert not lv.only_global_recording()
    run_blocks(engine, 10)
    lv.remove_record_port("lane:2", 0)
    run_blocks(engine, 10)
    lv.stop_recording()
    back = read_wav(first)
    assert back.samples.shape == (30 * 128, 1)   # snapshot width held
    assert np.abs(back.samples).max() > 0.05     # and it stayed the lane tap
    # the next take picks the edits up: now just ("master", 0)
    second = str(tmp_path / "take2.wav")
    lv.set_record_ports_filename_prefix(second)
    lv.start_recording()
    run_blocks(engine, 5)
    lv.stop_recording()
    back2 = read_wav(second)
    assert back2.samples.shape == (5 * 128, 1)
    assert np.abs(back2.samples).max() > 0.05


def test_channel_list_edits_midtake_apply_next_take(tmp_path):
    """Removing a channel from channels_to_record mid-take must not starve
    its still-live recorder, and must not flip only_global_recording()
    True while it records (the bounce drain would switch to its
    global-only feed and gap the channel's file)."""
    engine, clip = make_session()
    lv = engine.levels
    lv.set_record_global_playback(True)
    lv.set_global_playback_filename_prefix(str(tmp_path / "master.wav"))
    lv.set_channel_filename_prefix(0, str(tmp_path / "ch1.wav"))
    lv.set_channels_to_record([0])
    clip.play(loop=True, midi_channel=0)  # channel 0 = lane 2
    lv.start_recording()
    run_blocks(engine, 10)
    lv.set_channels_to_record([])         # mid-take edit
    assert not lv.only_global_recording() # channel recorder still live
    run_blocks(engine, 10)
    lv.stop_recording()
    back = read_wav(tmp_path / "ch1.wav")
    assert back.num_frames == 20 * 128    # fed for the whole take
    assert np.abs(back.samples).max() > 0.05
    # the next take records no channels: the edit took effect
    lv.set_channel_filename_prefix(0, str(tmp_path / "ch1b.wav"))
    lv.start_recording()
    run_blocks(engine, 5)
    assert lv.only_global_recording()
    lv.stop_recording()
    assert not (tmp_path / "ch1b.wav").exists()
