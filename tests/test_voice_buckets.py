"""Bucketed prefix rendering (engine voice_buckets="auto").

First-idle allocation (lib/SamplerSynth.cpp:204-215) keeps live voices at
low indices, so the engine renders only the smallest ladder bucket
covering the highest active index. Outputs must be bit-identical to the
full-pool render, bucket choice must track the active high-water mark,
and output shapes (voice_peaks) must stay stable.
"""

import numpy as np

from libzl_tpu.engine.commands import ClipCommand
from libzl_tpu.engine.engine import AudioEngine
from libzl_tpu.io.wav import AudioData
from libzl_tpu.models.clip import ClipAudioSource

SR = 48000


def _make_engine(**kw):
    # lookahead off: this suite asserts BIT equality of bucketed vs full
    # dispatch, the per-block path's contract. The lookahead horizon graph
    # is only tolerance-equal across bucket sizes (XLA picks a different
    # reduction tree for different contraction widths at window scale) —
    # covered by test_lookahead_bucket_tolerance below.
    kw.setdefault("lookahead", 0)
    eng = AudioEngine(
        sample_rate=SR, block_frames=128, num_voices=128, backend="jax", **kw
    )
    t = np.arange(SR // 4) / SR
    wave = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[:, None]
    clip = ClipAudioSource(eng, audio=AudioData(wave, SR))
    eng.start_transport(bpm=120)
    return eng, clip


def _play(eng, clip, note, channel=0):
    cmd = ClipCommand.channel(clip.id, channel)
    cmd.midi_note = note
    cmd.start_playback = True
    cmd.looping = True
    eng.schedule_clip_command(cmd, 0)


def test_ladder_shape():
    eng, _ = _make_engine()
    assert eng._bucket_ladder == [64, 128]
    eng_off, _ = _make_engine(voice_buckets="off")
    assert eng_off._bucket_ladder is None
    eng_small = AudioEngine(
        sample_rate=SR, block_frames=128, num_voices=64, backend="jax"
    )
    assert eng_small._bucket_ladder is None  # <= smallest bucket: no-op
    eng_big = AudioEngine(
        sample_rate=SR, block_frames=128, num_voices=1024, backend="jax"
    )
    assert eng_big._bucket_ladder == [64, 128, 256, 512, 1024]
    import pytest

    with pytest.raises(ValueError):
        AudioEngine(sample_rate=SR, num_voices=128, voice_buckets="banana")


def test_warmup_compiles_ladder():
    eng, clip = _make_engine()
    assert eng.warmup() == 2  # ladder [64, 128]
    _play(eng, clip, 60)
    res = eng.process_block()
    assert np.asarray(res.outputs.master).shape == (128, 2)
    eng_np = AudioEngine(
        sample_rate=SR, block_frames=128, num_voices=128, backend="numpy"
    )
    assert eng_np.warmup() == 0


def test_capture_trace_writes_profile(tmp_path):
    eng, clip = _make_engine()
    _play(eng, clip, 60)
    out = tmp_path / "trace"
    eng.capture_trace(3, str(out))
    files = [p for p in out.rglob("*") if p.is_file()]
    assert files, "profiler trace produced no files"
    eng_np = AudioEngine(
        sample_rate=SR, block_frames=128, num_voices=128, backend="numpy"
    )
    import pytest

    with pytest.raises(RuntimeError):
        eng_np.capture_trace(1, str(out))


def test_bucketed_matches_full_render():
    eng_a, clip_a = _make_engine()
    eng_b, clip_b = _make_engine(voice_buckets="off")
    for i in range(6):
        _play(eng_a, clip_a, 60 + i, channel=i % 4)
        _play(eng_b, clip_b, 60 + i, channel=i % 4)
    for b in range(8):
        ra = eng_a.process_block()
        rb = eng_b.process_block()
        assert eng_a._render_bucket() == 64
        for field in ("master", "lane_mix", "strip_dry", "strip_wet1",
                      "strip_wet2", "lane_peaks", "lane_rms", "master_peak",
                      "voice_peaks"):
            va = np.asarray(getattr(ra.outputs, field))
            vb = np.asarray(getattr(rb.outputs, field))
            assert va.shape == vb.shape, (field, b)
            np.testing.assert_array_equal(va, vb, err_msg=f"{field} block {b}")


def test_dying_high_voice_renders_final_block():
    """Regression: the bucket must come from the packed program's active
    column, not pool.active — under the native host core the pool has
    already been advanced past this block's voice deaths at dispatch time,
    and a dying high-index voice still renders its final partial frames
    (lib/SamplerSynthVoice.cpp:248-257). Bucketed output must stay
    bit-identical to the full render through the entire death sequence."""
    eng_a, clip_a = _make_engine()
    eng_b, clip_b = _make_engine(voice_buckets="off")
    for eng, clip in ((eng_a, clip_a), (eng_b, clip_b)):
        for i in range(70):
            _play(eng, clip, 30 + i % 60, channel=i % 10)
    for _ in range(2):
        ra = eng_a.process_block(); rb = eng_b.process_block()
        np.testing.assert_array_equal(
            np.asarray(ra.outputs.master), np.asarray(rb.outputs.master))
    # stop all but the last voice, then the last one a block later; the
    # high voice's release tail and final dying block must survive the
    # bucket shrink
    for eng, clip in ((eng_a, clip_a), (eng_b, clip_b)):
        for i in range(69):
            cmd = ClipCommand.channel(clip.id, i % 10)
            cmd.midi_note = 30 + i % 60
            cmd.stop_playback = True
            eng.schedule_clip_command(cmd, 0)
    ra = eng_a.process_block(); rb = eng_b.process_block()
    np.testing.assert_array_equal(
        np.asarray(ra.outputs.master), np.asarray(rb.outputs.master))
    for eng, clip in ((eng_a, clip_a), (eng_b, clip_b)):
        cmd = ClipCommand.channel(clip.id, 69 % 10)
        cmd.midi_note = 30 + 69 % 60
        cmd.stop_playback = True
        eng.schedule_clip_command(cmd, 0)
    for b in range(30):
        ra = eng_a.process_block(); rb = eng_b.process_block()
        np.testing.assert_array_equal(
            np.asarray(ra.outputs.master), np.asarray(rb.outputs.master),
            err_msg=f"death-sequence block {b}")
        va = np.asarray(ra.outputs.voice_peaks)
        assert va.shape == (128,)


def test_bucket_churn_equivalence_fuzz():
    """Randomized traffic crossing bucket boundaries both directions:
    bucketed and full renders must stay bit-identical block for block."""
    rng = np.random.default_rng(11)
    eng_a, clip_a = _make_engine()
    eng_b, clip_b = _make_engine(voice_buckets="off")
    notes_on = set()
    for b in range(120):
        roll = rng.random()
        if roll < 0.45:
            note = int(rng.integers(24, 96))
            ch = int(rng.integers(0, 10))
            looping = bool(rng.integers(0, 2))  # draw ONCE: both engines
            for eng, clip in ((eng_a, clip_a), (eng_b, clip_b)):
                cmd = ClipCommand.channel(clip.id, ch)
                cmd.midi_note = note
                cmd.start_playback = True
                cmd.looping = looping
                eng.schedule_clip_command(cmd, 0)
            notes_on.add((note, ch))
        elif roll < 0.75 and notes_on:
            note, ch = list(notes_on)[int(rng.integers(0, len(notes_on)))]
            notes_on.discard((note, ch))
            for eng, clip in ((eng_a, clip_a), (eng_b, clip_b)):
                cmd = ClipCommand.channel(clip.id, ch)
                cmd.midi_note = note
                cmd.stop_playback = True
                eng.schedule_clip_command(cmd, 0)
        ra = eng_a.process_block()
        rb = eng_b.process_block()
        np.testing.assert_array_equal(
            np.asarray(ra.outputs.master), np.asarray(rb.outputs.master),
            err_msg=f"block {b}")
        np.testing.assert_array_equal(
            np.asarray(ra.outputs.voice_peaks),
            np.asarray(rb.outputs.voice_peaks), err_msg=f"peaks block {b}")
        assert np.array_equal(eng_a.pool.active, eng_b.pool.active)


def test_bucket_tracks_high_water():
    eng, clip = _make_engine()
    for i in range(4):
        _play(eng, clip, 60 + i)
    eng.process_block()
    assert eng._render_bucket() == 64
    # push allocations past the first bucket
    for i in range(70):
        _play(eng, clip, 30 + (i % 60), channel=1 + i % 9)
    res = eng.process_block()
    assert int(eng.pool.active.sum()) > 64
    assert eng._render_bucket() == 128
    assert np.asarray(res.outputs.voice_peaks).shape == (128,)
    # voices die off -> the reaper frees high indices and the bucket drops
    # (stop commands must match note+channel, the reference's
    # stop-all-matching semantics — lib/SamplerSynth.cpp:187-230)
    for i in range(4):
        cmd = ClipCommand.channel(clip.id, 0)
        cmd.midi_note = 60 + i
        cmd.stop_playback = True
        eng.schedule_clip_command(cmd, 0)
    for i in range(70):
        cmd = ClipCommand.channel(clip.id, 1 + i % 9)
        cmd.midi_note = 30 + (i % 60)
        cmd.stop_playback = True
        eng.schedule_clip_command(cmd, 0)
    for _ in range(40):
        res = eng.process_block()
        if not eng.pool.active.any():
            break
    # fully idle engines take the zero-output shortcut; re-arm a low voice
    _play(eng, clip, 72)
    eng.process_block()
    assert eng._render_bucket() == 64


def test_lookahead_bucket_tolerance():
    """Bucketed lookahead horizons match full-pool lookahead within f32
    reduction-order tolerance (bit-equality is the per-block contract)."""
    eng_a, clip_a = _make_engine(lookahead=8)
    eng_b, clip_b = _make_engine(lookahead=8, voice_buckets="off")
    for eng, clip in ((eng_a, clip_a), (eng_b, clip_b)):
        for i in range(12):
            _play(eng, clip, 40 + i, channel=i % 10)
    # 24 blocks: horizons engage at 3 and roll over at 11/19 (H=8), so
    # bucketed-vs-full covers build, adoption and emission phases
    for b in range(24):
        ra = eng_a.process_block()
        rb = eng_b.process_block()
        np.testing.assert_allclose(
            np.asarray(ra.outputs.master), np.asarray(rb.outputs.master),
            atol=1e-5, err_msg=f"block {b}")
    assert eng_a._h_slices and eng_b._h_slices  # horizons engaged
