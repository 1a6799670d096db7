"""In-process drive of the C-bridge module functions (capi/bridge.py).

tests/test_capi.py exercises this surface through the real C shim in a
subprocess — which proves the ABI, but leaves the Python glue invisible to
in-process tooling and lets a signature drift surface only as a subprocess
failure. This file drives the same module-level entry points directly:
clip property plumbing, ctypes callback marshalling, timer and levels
groups, and the error paths a C client can hit.

Reference behaviors under test carry their own citations in bridge.py;
this file asserts the glue reaches the engine objects.
"""

import ctypes
import os

import numpy as np
import pytest

from libzl_tpu.io.wav import read_wav, write_wav

SR = 48000


@pytest.fixture
def rt(tmp_path):
    os.environ.update(
        LIBZL_TPU_BACKEND="numpy",
        LIBZL_TPU_VOICES="32",
        LIBZL_TPU_NO_PUMP="1",
    )
    from libzl_tpu.capi import bridge

    bridge.init_engine()
    yield bridge._rt()
    bridge.shutdown_engine()
    for k in ("LIBZL_TPU_BACKEND", "LIBZL_TPU_VOICES", "LIBZL_TPU_NO_PUMP"):
        os.environ.pop(k, None)


def _make_clip(bridge, tmp_path, seconds=0.5, name="clip.wav"):
    t = np.arange(int(SR * seconds)) / SR
    path = tmp_path / name
    write_wav(path, (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), SR)
    return bridge.clip_new(str(path))


def test_rt_before_init_raises():
    from libzl_tpu.capi import bridge

    assert bridge._runtime is None
    with pytest.raises(RuntimeError):
        bridge._rt()


def test_clip_property_plumbing(rt, tmp_path):
    from libzl_tpu.capi import bridge

    cid = _make_clip(bridge, tmp_path)
    clip = bridge.clip_by_id(cid)

    assert bridge.clip_get_duration(cid) == pytest.approx(0.5, abs=1e-3)
    assert bridge.clip_get_filename(cid) == "clip.wav"

    bridge.clip_set_start_position(cid, 0.1)
    assert clip.get_start_position() == pytest.approx(0.1)
    bridge.clip_set_length(cid, 0.5, 120)  # half a beat at 120 BPM = 0.25 s
    assert clip.get_stop_position() == pytest.approx(0.35)

    bridge.clip_set_pan(cid, 0.5)
    assert clip.pan == pytest.approx(0.5)
    bridge.clip_set_volume(cid, -6.0)
    assert clip.get_volume_db() == pytest.approx(-6.0)

    bridge.clip_set_slices(cid, 4)
    assert clip.slices == 4
    bridge.clip_set_keyzone_start(cid, 40)
    bridge.clip_set_keyzone_end(cid, 80)
    bridge.clip_set_root_note(cid, 64)
    assert bridge.clip_keyzone_start(cid) == 40
    assert bridge.clip_keyzone_end(cid) == 80
    assert bridge.clip_root_note(cid) == 64

    bridge.clip_set_adsr_attack(cid, 0.01)
    bridge.clip_set_adsr_decay(cid, 0.02)
    bridge.clip_set_adsr_sustain(cid, 0.6)
    bridge.clip_set_adsr_release(cid, 0.09)
    assert bridge.clip_adsr_attack(cid) == pytest.approx(0.01)
    assert bridge.clip_adsr_decay(cid) == pytest.approx(0.02)
    assert bridge.clip_adsr_sustain(cid) == pytest.approx(0.6)
    assert bridge.clip_adsr_release(cid) == pytest.approx(0.09)


def test_clip_deferred_render_setters(rt, tmp_path):
    """speed/pitch/gain/crossfade route to the deferred offline re-render
    and land at a block boundary (the needsRender analog)."""
    from libzl_tpu.capi import bridge

    cid = _make_clip(bridge, tmp_path)
    clip = bridge.clip_by_id(cid)
    before = clip.playback_audio.num_frames

    bridge.clip_set_speed_ratio(cid, 2.0)
    bridge.clip_set_pitch(cid, 3.0)
    bridge.clip_set_gain(cid, -3.0)
    bridge.clip_set_loop_crossfade(cid, 0.01)
    # the render worker swaps the buffer in at a block boundary; poll on
    # the wall clock (step_blocks outruns the worker thread on tiny pools)
    import time

    deadline = time.monotonic() + 30.0
    while time.monotonic() < deadline:
        rt.step_blocks(1)
        if clip.playback_audio.num_frames != before:
            break
        time.sleep(0.005)
    assert clip.speed_ratio == pytest.approx(2.0)
    assert clip.pitch_change == pytest.approx(3.0)
    assert clip.gain_db == pytest.approx(-3.0)
    # speed 2.0 halves the duration (WSOLA durations are exact)
    assert clip.playback_audio.num_frames == pytest.approx(before / 2, rel=0.05)


def test_clip_callbacks_via_ctypes_pointers(rt, tmp_path):
    """The C shim hands raw function pointers; the bridge must marshal
    float args through ctypes without keeping the only reference."""
    from libzl_tpu.capi import bridge

    cid = _make_clip(bridge, tmp_path, seconds=1.0)
    progress, levels = [], []
    prog_cb = bridge._PROGRESS_CB(lambda v: progress.append(v))
    lvl_cb = bridge._LEVEL_CB(lambda v: levels.append(v))
    bridge.clip_set_progress_callback(
        cid, ctypes.cast(prog_cb, ctypes.c_void_p).value)
    bridge.clip_set_audio_level_callback(
        cid, ctypes.cast(lvl_cb, ctypes.c_void_p).value)

    bridge.timer_start(120)
    bridge.clip_play(cid, True, 2)
    every = rt.engine._levels_every
    rt.step_blocks(4 * every)
    clip = bridge.clip_by_id(cid)
    clip.sync_progress(now=1e9)
    clip.sync_audio_level(now=1e9)
    bridge.clip_stop(cid, 2)
    # the progress callback reports SECONDS into the clip
    # (lib/ClipAudioSource.cpp:232: progress * getDuration())
    assert progress and 0.0 <= progress[-1] <= clip.get_duration()
    # the level callback reports dB (lib/ClipAudioSource.cpp:88-113): a
    # playing clip sits above the -200 floor
    assert levels and -200.0 < levels[-1] < 6.0


def test_timer_group(rt, tmp_path):
    from libzl_tpu.capi import bridge
    from libzl_tpu.constants import BEAT_SUBDIVISIONS, TICKS_PER_BAR

    assert bridge.timer_get_multiplier() == BEAT_SUBDIVISIONS

    ticks = []
    timer_cb = bridge._TIMER_CB(lambda t: ticks.append(t))
    ptr = ctypes.cast(timer_cb, ctypes.c_void_p).value
    bridge.timer_register_callback(ptr)

    bridge.timer_start(120)
    assert rt.engine.transport_running
    assert rt.engine.bpm == pytest.approx(120.0)
    bridge.timer_set_bpm(150.0)
    assert rt.engine.bpm == pytest.approx(150.0)

    # ~ one bar at 150 BPM: 384 ticks * (60/150/96) s/tick = 1.6 s
    rt.step_blocks(int(1.7 * SR / rt.engine.block_frames))
    assert ticks, "timer callback never fired"
    assert all(0 <= t < TICKS_PER_BAR for t in ticks)

    fired = len(ticks)
    bridge.timer_deregister_callback(ptr)
    rt.step_blocks(8)
    assert len(ticks) == fired, "callback fired after deregistration"

    cid = _make_clip(bridge, tmp_path)
    bridge.timer_queue_clip_to_start(cid, 2)   # next-bar quantize
    bridge.timer_queue_clip_to_stop(cid, 2)
    bridge.timer_stop()
    assert not rt.engine.transport_running


def test_levels_port_recording_group(rt, tmp_path):
    from libzl_tpu.capi import bridge

    cid = _make_clip(bridge, tmp_path)
    bridge.levels_set_record_ports_filename_prefix(
        str(tmp_path / "ports.wav"))
    bridge.levels_add_record_port("master", 0)
    bridge.levels_add_record_port("master", 1)
    bridge.levels_set_should_record_ports(True)
    assert not bridge.levels_is_recording()
    bridge.levels_start_recording()
    assert bridge.levels_is_recording()

    bridge.timer_start(120)
    bridge.clip_play(cid, True, 2)
    rt.step_blocks(40)
    bridge.levels_stop_recording()
    assert not bridge.levels_is_recording()
    rec = read_wav(tmp_path / "ports.wav")
    assert rec.num_frames > 0 and np.abs(rec.samples).max() > 0.01

    # removing/clearing ports takes effect for the next recording
    bridge.levels_remove_record_port("master", 0)
    bridge.levels_clear_record_ports()
    bridge.levels_set_should_record_ports(False)


def test_passthrough_and_misc(rt, tmp_path):
    from libzl_tpu.capi import bridge

    for key, value in (("dry", 0.7), ("wet1", 0.3), ("wet2", 0.2),
                       ("pan", -0.5), ("muted", 1.0)):
        bridge.passthrough_set(3, key, value)
        assert bridge.passthrough_get(3, key) == pytest.approx(value)
    # channel -1 = global strip
    bridge.passthrough_set(-1, "dry", 0.9)
    assert bridge.passthrough_get(-1, "dry") == pytest.approx(0.9)
    with pytest.raises(KeyError):
        bridge.passthrough_set(3, "nonsense", 1.0)

    # dBFromVolume: unity -> 0 dB, 0 -> -inf floor (fader law)
    assert bridge.db_from_volume(1.0) == pytest.approx(0.0)
    assert bridge.db_from_volume(0.0) <= -100.0

    # stop_clips tolerates unknown ids (the reference iterates a C array)
    cid = _make_clip(bridge, tmp_path)
    bridge.clip_play(cid, True, 2)
    bridge.stop_clips([cid, 999999])

    with pytest.raises(KeyError):
        bridge._clip(424242)

    bridge.clip_destroy(cid)
    assert bridge.clip_by_id(cid) is None


def test_reload_configuration_env(rt, monkeypatch):
    from libzl_tpu.capi import bridge
    from libzl_tpu.midi.router import Destination

    monkeypatch.setenv("ZYNTHIAN_MIDI_FILTER_OUTPUT", "1")
    bridge.reload_zynthian_configuration()
    router = rt.engine.router
    assert router.filter_midi_out
    # channel destinations survive a reload (reference re-reads env only)
    router.set_channel_destination(0, Destination.SAMPLER)
    bridge.reload_zynthian_configuration()
    assert router.outputs[0].destination == Destination.SAMPLER


def test_init_engine_env_knobs(tmp_path):
    """init_engine reads the full LIBZL_TPU_* env surface (docs/API.md):
    pipeline depth, bounce drain, explicit lookahead, rate and block."""
    from libzl_tpu.capi import bridge

    assert bridge._runtime is None
    os.environ.update(
        LIBZL_TPU_BACKEND="numpy",
        LIBZL_TPU_VOICES="32",
        LIBZL_TPU_NO_PUMP="1",
        LIBZL_TPU_RATE="44100",
        LIBZL_TPU_BLOCK="256",
        LIBZL_TPU_PIPELINE="3",
        LIBZL_TPU_BOUNCE_DRAIN="4",
        LIBZL_TPU_LOOKAHEAD="0",
    )
    try:
        bridge.init_engine()
        rt = bridge._rt()
        assert rt.engine.sample_rate == 44100
        assert rt.engine.block_frames == 256
        assert rt.pipeline_depth == 3
        assert rt.bounce_drain_blocks == 4
        assert rt.engine._lookahead == 0
    finally:
        bridge.shutdown_engine()
        for k in ("LIBZL_TPU_BACKEND", "LIBZL_TPU_VOICES",
                  "LIBZL_TPU_NO_PUMP", "LIBZL_TPU_RATE", "LIBZL_TPU_BLOCK",
                  "LIBZL_TPU_PIPELINE", "LIBZL_TPU_BOUNCE_DRAIN",
                  "LIBZL_TPU_LOOKAHEAD"):
            os.environ.pop(k, None)


def test_init_engine_bad_source_spec_does_not_publish(tmp_path):
    """A bad LIBZL_TPU_SOURCE must abort init WITHOUT publishing the
    singleton or leaking the already-attached sink (bridge.init_engine's
    cleanup path)."""
    from libzl_tpu.capi import bridge

    assert bridge._runtime is None
    os.environ.update(
        LIBZL_TPU_BACKEND="numpy",
        LIBZL_TPU_VOICES="32",
        LIBZL_TPU_NO_PUMP="1",
        LIBZL_TPU_SINK="null",
        LIBZL_TPU_SOURCE="bogus-kind",
    )
    try:
        with pytest.raises(ValueError, match="source spec"):
            bridge.init_engine()
        assert bridge._runtime is None
        # a good retry still works
        os.environ.pop("LIBZL_TPU_SOURCE")
        bridge.init_engine()
        assert bridge._rt() is not None
    finally:
        bridge.shutdown_engine()
        for k in ("LIBZL_TPU_BACKEND", "LIBZL_TPU_VOICES",
                  "LIBZL_TPU_NO_PUMP", "LIBZL_TPU_SINK",
                  "LIBZL_TPU_SOURCE"):
            os.environ.pop(k, None)


def test_pump_survives_failing_sink():
    """The pump's per-block error guard (bridge._run): a sink that raises
    must record pump_error and keep the pump alive (the reference's JACK
    callback never dies to a client error), and a later healthy sink
    resumes delivery."""
    import time

    from libzl_tpu.capi.bridge import EngineRuntime
    from libzl_tpu.io.sinks import AudioSink

    class BoomSink(AudioSink):
        def __init__(self):
            self.calls = 0

        def write(self, block):
            self.calls += 1
            raise RuntimeError("boom")

    class CountSink(AudioSink):
        def __init__(self):
            self.blocks = 0

        def write(self, block):
            self.blocks += 1

    rt = EngineRuntime(backend="numpy", num_voices=16)
    boom = BoomSink()
    rt.set_sink(boom)
    rt.start_pump()
    try:
        deadline = time.monotonic() + 5.0
        while boom.calls == 0 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert boom.calls > 0
        assert isinstance(rt.pump_error, RuntimeError)
        assert rt._running  # still alive after the failure
        good = CountSink()
        rt.set_sink(good)
        deadline = time.monotonic() + 5.0
        while good.blocks == 0 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert good.blocks > 0
    finally:
        rt.stop_pump()
        rt.set_sink(None)


def test_phase_stats_formatting(rt):
    rt._phase("render", 0.0021)
    rt._phase("render", 0.0009)
    rt._phase("sink", 0.0005)
    stats = rt.phase_stats()
    assert stats["render_ms"] == 3.0 and stats["render_n"] == 2
    assert stats["sink_ms"] == 0.5 and stats["sink_n"] == 1
    for k in stats:
        assert k.endswith("_ms") or k.endswith("_n")


def test_step_blocks_refused_while_pump_runs():
    import time

    from libzl_tpu.capi.bridge import EngineRuntime

    rt = EngineRuntime(backend="numpy", num_voices=16)
    rt.start_pump()
    try:
        with pytest.raises(RuntimeError, match="requires the pump"):
            rt.step_blocks(1)
    finally:
        rt.stop_pump()


def test_set_source_retires_old_source_under_pump():
    """Replacing the capture source while the pump runs must hand the old
    one to the pump for closing (no close while a read may be in flight),
    and the pump must actually close it."""
    import time

    from libzl_tpu.capi.bridge import EngineRuntime

    class FakeSource:
        def __init__(self):
            self.closed = 0

        def read(self, frames):
            return np.zeros((frames, 2), np.float32)

        def close(self):
            self.closed += 1

    rt = EngineRuntime(backend="numpy", num_voices=16)
    first, second = FakeSource(), FakeSource()
    rt.set_source(first)
    rt.start_pump()
    try:
        rt.set_source(second)
        deadline = time.monotonic() + 5.0
        while first.closed == 0 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert first.closed == 1
        assert second.closed == 0
    finally:
        rt.stop_pump()
        rt.set_source(None)


def test_drain_flushes_before_per_block_resume(tmp_path):
    """Bounce-drained blocks must land in the sink BEFORE the first
    per-block write once per-block semantics resume (a multi-target
    recording starts mid-bounce) — order and count both matter."""
    from libzl_tpu.capi.bridge import EngineRuntime
    from libzl_tpu.io.sinks import make_sink

    rt = EngineRuntime(backend="numpy", num_voices=16, bounce_drain=8)
    out = tmp_path / "bounce.wav"
    rt.set_sink(make_sink(f"file:{out}", SR))
    try:
        # drive _consume directly: step_blocks force-flushes at return,
        # but the wall-clock pump does not — this is its sequence
        for _ in range(3):
            res = rt.engine.process_block()
            rt._consume(rt.engine.total_blocks, res)
        assert len(rt._drain_buf) == 3   # buffered, below the threshold
        # per-block semantics resume: a ports recording starts
        levels = rt.engine.levels
        levels.set_should_record_ports(True)
        levels.record_ports = [("master", 0)]
        levels.set_record_ports_filename_prefix(str(tmp_path / "ports"))
        levels.start_recording()
        res = rt.engine.process_block()
        rt._consume(rt.engine.total_blocks, res)
        assert rt._drain_buf == [] and rt._pending_drain is None
        levels.stop_recording()
    finally:
        rt.set_sink(None)
    a = read_wav(out)
    # 3 drained + 1 per-block, in order, none duplicated
    assert a.num_frames == 4 * rt.engine.block_frames


def test_rt_priority_thread_scoped():
    """_set_realtime_priority elevates ONLY the calling thread to
    SCHED_FIFO (reference parity: the RT tick thread runs SCHED_FIFO,
    lib/SyncTimer.cpp:139-142). Where the caller lacks CAP_SYS_NICE the
    call must be a silent no-op — never an exception on the pump path."""
    import os
    import threading

    from libzl_tpu.capi.bridge import _set_realtime_priority

    if not hasattr(os, "sched_getscheduler"):
        pytest.skip("no sched API on this platform")
    main_policy = os.sched_getscheduler(0)
    seen = {}

    def body():
        _set_realtime_priority()
        seen["policy"] = os.sched_getscheduler(0)

    t = threading.Thread(target=body)
    t.start()
    t.join()
    if os.geteuid() == 0:
        assert seen["policy"] == os.SCHED_FIFO
    # thread-scoped: the main thread's policy is untouched either way
    assert os.sched_getscheduler(0) == main_policy


def test_spec_workers_are_niced():
    """The speculative sim/dispatch workers run at +10 niceness so their
    multi-ms native sims never timeslice-delay the pump's ~0.05 ms emit
    blocks on few-core hosts (storm-soak slo_worst attribution, NOTES
    round-5 campaign #5)."""
    import os
    import sys

    from libzl_tpu.engine.engine import AudioEngine

    if not sys.platform.startswith("linux"):
        pytest.skip("per-thread setpriority is Linux-specific")
    nice = AudioEngine._spec_sim_executor().submit(
        lambda: os.getpriority(os.PRIO_PROCESS, 0)).result()
    assert nice == 10
    nice = AudioEngine._spec_executor().submit(
        lambda: os.getpriority(os.PRIO_PROCESS, 0)).result()
    assert nice == 10


def test_run_ahead_covers_lookahead_budget():
    """The adopt/horizon H-block SLO budget is honest only while the
    pump's run-ahead margin covers >= H blocks — a build/adoption that
    legitimately takes up to H periods must not starve the sink."""
    from libzl_tpu.capi.bridge import EngineRuntime

    rt = EngineRuntime(backend="numpy", num_voices=16)
    assert rt.run_ahead_blocks() >= getattr(rt.engine, "_lookahead", 0) + 2
    assert rt.run_ahead_blocks() >= 4
    # and under a forced deep horizon the margin scales with it
    # (lookahead needs the jax backend; forced CPU by conftest)
    rt2 = EngineRuntime(backend="jax", num_voices=16, lookahead=16)
    assert rt2.engine._lookahead == 16
    assert rt2.run_ahead_blocks() >= 18
