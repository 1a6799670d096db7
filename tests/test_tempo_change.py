"""Beat-quantized loops stay phase-locked across tempo changes
(the SURVEY.md §7 'hard part': wall-clock-coupled loop wraps re-derived as
sample arithmetic without drift)."""

import numpy as np

from libzl_tpu.engine.engine import AudioEngine
from libzl_tpu.io.wav import AudioData
from libzl_tpu.models.clip import ClipAudioSource
from libzl_tpu.timebase import BlockClock
from libzl_tpu.engine.voicestate import VoicePool

SR = 48000.0
B = 128


def test_bq_wrap_follows_tempo_change():
    clock = BlockClock(sample_rate=SR, block_frames=int(B), bpm=120)
    pool = VoicePool(4, int(B), SR)
    frames = 40000
    pool.note_on(
        0, clip_id=1, midi_note=60, midi_channel=0, lane=2,
        base=0, length=frames, source_rate=SR, root_note=60,
        start_sec=0.0, stop_sec=frames / SR, gain=1.0, clip_volume=1.0,
        pan=0.0, attack=0.0, decay=0.1, sustain=1.0, release=0.05,
        looping=True, length_beats=1.0, start_tick=0,
    )
    # at 120 bpm the first wrap would land at sample 24000 (tick 96);
    # switching to 200 bpm at ~sample 12800 moves tick 96 earlier
    switch_block = 100
    wrap_sample = None
    prev_pos = -1
    for b in range(400):
        if b == switch_block:
            clock.set_bpm(200)
            expected = clock.tick_time_samples(int(pool.next_loop_tick[0]))
        prog = pool.build_program(
            block_start_sample=float(clock.sample_position),
            tick_anchor_sample=clock.anchor_sample,
            tick_anchor=clock.anchor_tick,
            samples_per_tick=clock.samples_per_tick,
        )
        # find an in-block wrap segment (position resets to istart)
        seg = np.asarray(prog.seg_start[0])
        if wrap_sample is None and seg[1] < B:
            wrap_sample = clock.sample_position + int(seg[1])
        pool.advance(prog)
        if wrap_sample is None and pool.pos_int[0] == pool.istart[0] and b > 0:
            wrap_sample = clock.sample_position + B  # boundary reset
        clock.advance_block()
    assert wrap_sample is not None
    # tick 96 under the re-anchored 200 bpm clock (not 24000, not 96*240)
    assert abs(wrap_sample - expected) <= 1.0
    # sanity: the tempo change actually moved the wrap
    assert wrap_sample < 23000


def test_engine_bpm_change_keeps_looping_audible():
    engine = AudioEngine(sample_rate=int(SR), backend="numpy", num_voices=16)
    t = np.arange(int(SR)) / SR
    clip = ClipAudioSource(
        engine,
        audio=AudioData(
            (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)[:, None],
            int(SR),
        ),
    )
    clip.set_length(1.0, 120)  # exactly one beat: beat-quantized looping
    engine.start_transport(bpm=120)
    clip.play(loop=True, midi_channel=0)
    for _ in range(200):
        engine.process_block()
    engine.set_bpm(187)
    out = []
    for _ in range(800):
        out.append(np.asarray(engine.process_block().outputs.master))
    audio = np.concatenate(out, axis=0)
    # still looping and audible throughout after the tempo change
    assert np.abs(audio[:4800]).max() > 0.01
    assert np.abs(audio[-4800:]).max() > 0.01
    assert engine.pool.active.sum() == 1
