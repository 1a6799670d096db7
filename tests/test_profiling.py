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
