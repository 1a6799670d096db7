"""Property tests for the musical timebase (SURVEY.md §7 step 1)."""

import math

import pytest

from libzl_tpu import timebase as tb
from libzl_tpu.constants import BEAT_SUBDIVISIONS, TICKS_PER_BAR


def test_ticks_nanoseconds_roundtrip():
    for bpm in (50, 60, 120, 137, 200):
        for ticks in (1, 3, 96, 384, 32768):
            ns = tb.ticks_to_nanoseconds(bpm, ticks)
            assert tb.nanoseconds_to_ticks(bpm, ns) == pytest.approx(ticks, rel=1e-12)


def test_known_values_at_120bpm():
    # At 120 BPM a quarter note is 0.5 s; 96 ticks per quarter.
    assert tb.ticks_to_seconds(120, 96) == pytest.approx(0.5)
    assert tb.ticks_to_seconds(120, 1) == pytest.approx(0.5 / 96)
    # getInterval reference semantics: integer ms per tick (SyncTimer.cpp:931-933)
    assert tb.tick_interval_ms(120) == 60000 // (120 * 96)
    # one beat at 120bpm/48kHz = 24000 samples; one tick = 250 samples
    assert tb.ticks_to_samples(120, BEAT_SUBDIVISIONS, 48000) == pytest.approx(24000)
    assert tb.ticks_to_samples(120, 1, 48000) == pytest.approx(250)


def test_bpm_clamping():
    # subbeatCountToSeconds clamps to [50, 200] (SyncTimer.cpp:936-943)
    assert tb.ticks_to_seconds(10, 96) == tb.ticks_to_seconds(50, 96)
    assert tb.ticks_to_seconds(10000, 96) == tb.ticks_to_seconds(200, 96)


def test_schedule_ahead():
    # Latency of zero still schedules one tick ahead (SyncTimer.cpp:711-715).
    assert tb.schedule_ahead_ticks(120, 0.0) == 1
    # 10 ms at 120bpm = 10ms / 5.208ms per tick = 1.92 ticks -> 1 + 1 = 2
    assert tb.schedule_ahead_ticks(120, 0.010) == 2


def test_next_bar_delay():
    assert tb.next_bar_delay(0) == TICKS_PER_BAR
    assert tb.next_bar_delay(1) == TICKS_PER_BAR - 1
    assert tb.next_bar_delay(TICKS_PER_BAR) == TICKS_PER_BAR
    assert tb.next_bar_delay(TICKS_PER_BAR + 10) == TICKS_PER_BAR - 10


def test_decompose_tick():
    p = tb.decompose_tick(0)
    assert (p.bar, p.beat, p.tick, p.bar_start_tick) == (1, 1, 0, 0)
    p = tb.decompose_tick(TICKS_PER_BAR + BEAT_SUBDIVISIONS + 5)
    assert (p.bar, p.beat, p.tick) == (2, 2, 5)
    assert p.bar_start_tick == TICKS_PER_BAR


class TestBlockClock:
    def test_tick_offsets_within_block(self):
        clock = tb.BlockClock(sample_rate=48000, block_frames=128, bpm=120)
        # 250 samples per tick at 120bpm/48k; block 0 contains only tick 0 @ frame 0
        ticks = clock.ticks_in_next_block()
        assert ticks == [(0, 0)]
        clock.advance_block()
        # block 1 spans samples [128, 256): tick 1 at sample 250 -> offset 122
        ticks = clock.ticks_in_next_block()
        assert ticks == [(1, 250 - 128)]

    def test_no_drift_over_many_blocks(self):
        clock = tb.BlockClock(sample_rate=48000, block_frames=128, bpm=137)
        n_blocks = 5000
        seen: list[tuple[int, int]] = []
        for b in range(n_blocks):
            for t, off in clock.ticks_in_next_block():
                seen.append((t, b * 128 + off))
            clock.advance_block()
        # ticks must be consecutive starting at 0
        tick_ids = [t for t, _ in seen]
        assert tick_ids == list(range(len(seen)))
        # absolute sample time of each tick matches the closed form within 1 frame
        spt = 60.0 / (137 * 96) * 48000
        for t, abs_sample in seen:
            assert abs(abs_sample - t * spt) <= 1.0

    def test_bpm_change_continuity(self):
        clock = tb.BlockClock(sample_rate=48000, block_frames=128, bpm=120)
        for _ in range(100):
            clock.advance_block()
        tick_before = clock.tick_position
        t_before = clock.tick_time_samples(tick_before)
        clock.set_bpm(60)
        # the last emitted tick keeps its time; spacing changes after it
        assert clock.tick_time_samples(tick_before) == pytest.approx(t_before)
        assert clock.samples_per_tick == pytest.approx(60.0 / (60 * 96) * 48000)
        # ticks keep monotonically increasing with no duplicates
        prev = clock.tick_position - 1
        for _ in range(200):
            for t, _off in clock.ticks_in_next_block():
                assert t == prev + 1
                prev = t
            clock.advance_block()

    def test_bpm_clamped(self):
        clock = tb.BlockClock(sample_rate=48000, block_frames=128, bpm=120)
        clock.set_bpm(1000)
        assert clock.bpm == 200
        clock.set_bpm(1)
        assert clock.bpm == 50


def test_schedule_ahead_uses_floor_truncated_interval():
    """nanosecondsToSubbeatCount divides by the FLOOR-truncated per-tick
    interval (quint64 math, lib/SyncTimer.cpp:184-186): at 140 bpm the
    interval is 4464285 ns, so 89285700 ns of latency covers 20 ticks
    (+1 guard = 21) — exact float math would say 19+1."""
    from libzl_tpu.timebase import schedule_ahead_ticks

    assert schedule_ahead_ticks(140, 0.0892857) == 21
    # exact divisors unchanged: 125 bpm -> 5 ms/tick
    assert schedule_ahead_ticks(125, 0.010) == 3
