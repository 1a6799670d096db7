"""Observability primitives: profiler, SLO/xrun counter, DSP load, watchdog.

The reference counts xruns and prints JackD DSP load per bar
(lib/SyncTimer.cpp:704-709, lib/SamplerSynth.cpp:142-145); these are the
first-class analogs, plus their wiring into AudioEngine.process_block.
"""

import numpy as np
import pytest

from libzl_tpu.utils.profiling import (
    BlockProfiler,
    DspLoad,
    EventWatchdog,
    SloCounter,
)


def test_profiler_percentiles_and_span():
    p = BlockProfiler()
    for ms in (1, 2, 3, 4, 100):
        p.record("stage", ms / 1e3)
    with p.span("stage"):
        pass
    s = p.summary()["stage"]
    assert s["count"] == 6
    assert s["max_ms"] == pytest.approx(100.0)
    assert s["p50_ms"] <= s["p90_ms"] <= s["p99_ms"] <= s["max_ms"]
    # the span recorded something tiny but real
    assert s["p50_ms"] >= 0.0


def test_slo_counter_misses_and_worst_overrun():
    slo = SloCounter(budget_seconds=0.010)
    assert slo.observe(0.005) is True
    assert slo.observe(0.015) is False
    assert slo.observe(0.030) is False
    assert slo.total_blocks == 3
    assert slo.missed_blocks == 2
    assert slo.miss_rate == pytest.approx(2 / 3)
    assert slo.worst_overrun == pytest.approx(0.020)
    assert SloCounter(0.01).miss_rate == 0.0  # no division by zero


def test_dsp_load_converges_to_ratio():
    load = DspLoad(period_seconds=0.010, smoothing=0.9)
    for _ in range(300):
        load.observe(0.005)  # half the period busy
    assert load.load == pytest.approx(0.5, abs=1e-3)


def test_event_watchdog():
    w = EventWatchdog()
    w.on_scheduled(3)
    w.on_delivered(3)
    assert w.check() and w.mismatches == 0
    w.on_scheduled()
    assert not w.check() and w.mismatches == 1


def test_engine_wires_observability():
    from libzl_tpu.engine.engine import AudioEngine
    from libzl_tpu.io.wav import AudioData
    from libzl_tpu.models.clip import ClipAudioSource

    engine = AudioEngine(backend="numpy", num_voices=8, sample_rate=48000)
    t = np.arange(4800) / 48000.0
    clip = ClipAudioSource(
        engine,
        audio=AudioData(
            (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[:, None],
            48000,
        ),
    )
    clip.play(loop=True, midi_channel=0)
    for _ in range(20):
        engine.process_block()
    assert engine.slo.total_blocks == 20
    assert engine.dsp_load.load > 0.0
    assert engine.profiler.summary()["process_block"]["count"] == 20


def test_watchdog_wired_into_engine():
    """Production wiring (MidiRouter.cpp:135-188 analog): every scheduled
    MIDI event must be accounted by the routing fabric each block; a router
    that LOSES events trips the watchdog with the lost count."""
    from libzl_tpu.engine.engine import AudioEngine

    engine = AudioEngine(backend="numpy", num_voices=8, sample_rate=48000)
    engine.start_transport(bpm=120)
    for i in range(8):
        engine.schedule_note(60 + i, 0, True, 100, duration=4, delay=i)
    for _ in range(10):
        engine.process_block()
    wd = engine.watchdog
    assert wd.scheduled > 0, "no events reached the fabric"
    assert wd.delivered == wd.scheduled
    assert wd.mismatches == 0 and wd.lost == 0
    assert engine.stats()["watchdog_mismatches"] == 0

    # now a fabric that drops every second event AFTER accepting it
    real_route = engine.router.route_internal

    def droppy(events):
        kept = []
        for i, ev in enumerate(events):
            if i % 2 and ev[1]:
                engine.router.in_count += 1  # entered, then lost
            else:
                kept.append(ev)
        real_route(kept)

    engine.router.route_internal = droppy
    for i in range(8):
        engine.schedule_note(60 + i, 0, True, 100, duration=4, delay=i)
    for _ in range(10):
        engine.process_block()
    assert wd.mismatches > 0
    assert wd.lost > 0
    assert engine.stats()["watchdog_lost"] == wd.lost


def test_summary_skips_empty_series():
    p = BlockProfiler()
    p.record("busy", 0.001)
    with p.span("never"):  # context adds one sample to "never"
        pass
    p._samples["empty"]  # touch: defaultdict creates an empty deque
    s = p.summary()
    assert "busy" in s and "never" in s and "empty" not in s


def test_device_trace_context(tmp_path):
    """utils.profiling.device_trace wraps jax.profiler start/stop and
    leaves a trace directory behind (works on the CPU backend too)."""
    import jax
    import jax.numpy as jnp

    from libzl_tpu.utils.profiling import device_trace

    out = tmp_path / "trace"
    with device_trace(str(out)):
        jax.block_until_ready(jnp.ones(8) * 2)
    assert out.exists() and any(out.rglob("*"))
