"""BPM-ramp parity: per-period quantized BPM blend + mid-block tick spacing.

The reference blends BPM changes into a per-JACK-period time-weighted value
for the timebase (updatedJackBeatsPerMinute, lib/SyncTimer.cpp:636-673,
rounded to 2 decimals at :673), and updates the per-tick step length at the
exact step where a SetBpm command fires (:636-641). These tests drive the
engine through scheduled BPM sweeps and check both behaviors against a
scalar oracle mirroring the reference loop."""

import numpy as np

from libzl_tpu.constants import BEAT_SUBDIVISIONS
from libzl_tpu.engine.commands import Operation, TimerCommand
from libzl_tpu.engine.engine import AudioEngine

SR = 48000
B = 128


def oracle_period_bpm(block_frames, sample_rate, tick_events, start_bpm,
                      n_blocks, start_sample=0.0, start_tick=0):
    """Scalar mirror of the reference's per-period BPM blend
    (lib/SyncTimer.cpp:636-673), in the sample domain: walk ticks block by
    block; each inter-tick segment weighs the BPM in effect during it; a
    SetBpm at tick t changes the spacing of ticks > t immediately; the
    per-block result rounds to 2 decimals.

    tick_events: {tick_number: new_bpm}
    """
    bpm = float(start_bpm)
    anchor_s = float(start_sample)
    anchor_t = int(start_tick)
    t = int(start_tick)
    sample_pos = float(start_sample)
    out = []
    spt = lambda b: 60.0 / (b * BEAT_SUBDIVISIONS) * sample_rate  # noqa: E731
    for _ in range(n_blocks):
        block_end = sample_pos + block_frames
        blend = 0.0
        seg_start = sample_pos
        while True:
            ts = anchor_s + (t - anchor_t) * spt(bpm)
            if ts >= block_end:
                break
            seg_end = min(max(ts, sample_pos), block_end)
            blend += bpm * (seg_end - seg_start)
            seg_start = seg_end
            if t in tick_events:
                # re-anchor at this tick, new spacing for following ticks
                anchor_s = ts
                anchor_t = t
                bpm = float(tick_events[t])
            t += 1
        blend += bpm * (block_end - seg_start)
        out.append(round(blend / block_frames * 100.0) / 100.0)
        sample_pos = block_end
    return out


def schedule_bpm(engine, tick, bpm):
    cmd = TimerCommand(operation=Operation.SET_BPM)
    cmd.parameter = bpm
    engine.schedule_timer_command(cmd, tick)


def test_period_bpm_matches_oracle_for_sweep():
    engine = AudioEngine(sample_rate=SR, block_frames=B, backend="numpy",
                         num_voices=8)
    engine.start_transport(bpm=120)
    # an automation sweep: +5 bpm every 8 ticks, 120 -> 160
    events = {}
    for i, tick in enumerate(range(8, 72, 8)):
        events[tick] = 125 + 5 * i
        schedule_bpm(engine, tick, 125 + 5 * i)
    n_blocks = 300
    got = []
    for _ in range(n_blocks):
        engine.process_block()
        got.append(engine.period_bpm)
    want = oracle_period_bpm(B, SR, events, 120, n_blocks)
    assert got == want
    # the sweep actually blends: some period values sit strictly between
    # the step levels (sub-0.01 quantized intermediate values)
    levels = {120.0, 125.0, 130.0, 135.0, 140.0, 145.0, 150.0, 155.0, 160.0}
    blended = [v for v in got if v not in levels]
    assert blended, "no blended per-period values — the ramp steps like r1"
    assert got[-1] == 160.0


def test_mid_block_bpm_change_moves_same_block_ticks():
    """At 200 bpm a tick lands every 150 samples (<B), so a SetBpm firing at
    an early tick must change the offsets of later ticks in the SAME block.
    Compare tick offsets against the oracle's tick times."""
    engine = AudioEngine(sample_rate=SR, block_frames=B, backend="numpy",
                         num_voices=8)
    engine.start_transport(bpm=200)  # spt = 150 samples
    schedule_bpm(engine, 1, 50)      # at tick 1, slam to 50 (spt = 600)
    ticks_seen = []
    engine.timer_callbacks.append(lambda t: ticks_seen.append(t))
    for _ in range(20):
        engine.process_block()
    # oracle tick times: t0 @ 0, t1 @ 150, then 600-sample spacing
    # block 0 (samples 0..128): t0 only. tick 1 @ 150 in block 1;
    # tick 2 @ 750 (block 5), NOT @ 300 (block 2) as a stale walk would say
    assert ticks_seen[:3] == [0, 1, 2]
    want = oracle_period_bpm(B, SR, {1: 50}, 200, 8)
    got = []
    e2 = AudioEngine(sample_rate=SR, block_frames=B, backend="numpy",
                     num_voices=8)
    e2.start_transport(bpm=200)
    schedule_bpm(e2, 1, 50)
    for _ in range(8):
        e2.process_block()
        got.append(e2.period_bpm)
    assert got == want
    # block 1 blends 200 and 50 (the change fired mid-walk)
    assert 50.0 < got[1] < 200.0


def test_tick_sample_mapping_monotone_under_ramp():
    """Property: under any ramp the tick->frame mapping stays monotone and
    gapless (every tick fires exactly once, in order)."""
    rng = np.random.default_rng(7)
    engine = AudioEngine(sample_rate=SR, block_frames=B, backend="numpy",
                         num_voices=8)
    engine.start_transport(bpm=90)
    for tick in range(5, 400, 5):
        schedule_bpm(engine, tick, float(rng.uniform(50, 200)))
    seen = []
    engine.timer_callbacks.append(lambda t: seen.append(t))
    for _ in range(600):
        engine.process_block()
    assert seen == list(range(len(seen)))
    # 600 blocks = 1.6 s; 50-200 bpm spans 80-320 ticks/s
    assert 128 <= len(seen) <= 520


def test_steady_state_period_bpm_equals_bpm():
    engine = AudioEngine(sample_rate=SR, block_frames=B, backend="numpy",
                         num_voices=8)
    engine.start_transport(bpm=137.5)
    for _ in range(50):
        engine.process_block()
    assert engine.period_bpm == 137.5
