"""Randomized soak: thousands of blocks of adversarial command traffic.

Asserts the invariants that matter for a long-running engine: no exceptions,
no NaN/inf in the output, voice accounting stays consistent, positions stay
inside their sounds, and the engine keeps producing audio.
"""

import numpy as np

from libzl_tpu.engine.commands import ClipCommand, Operation, TimerCommand
from libzl_tpu.engine.engine import AudioEngine
from libzl_tpu.io.wav import AudioData
from libzl_tpu.models.clip import ClipAudioSource

SR = 48000


def _soak(backend, n_blocks, seed, extended=False, tmp_dir=None):
    """extended=True adds the heavier traffic classes: deferred
    stretch/pitch re-renders (the render-worker path), recording toggles
    and session checkpoints (requires tmp_dir)."""
    import tempfile

    if extended and tmp_dir is None:
        tmp_dir = tempfile.mkdtemp(prefix="libzl_soak_")
    rng = np.random.default_rng(seed)
    engine = AudioEngine(sample_rate=SR, backend=backend, num_voices=24)
    engine.start_transport(bpm=120)

    clips = []
    for i in range(6):
        frames = int(rng.integers(2000, 30000))
        t = np.arange(frames) / SR
        wave = (0.4 * np.sin(2 * np.pi * (110 + 70 * i) * t)).astype(
            np.float32
        )[:, None]
        clips.append(ClipAudioSource(engine, audio=AudioData(wave, SR)))

    audible_blocks = 0
    for b in range(n_blocks):
        # random command traffic
        roll = rng.random()
        clip = clips[int(rng.integers(0, len(clips)))]
        ch = int(rng.integers(-2, 10))
        if roll < 0.15:
            cmd = ClipCommand.channel(clip.id, ch)
            cmd.midi_note = int(rng.integers(30, 90))
            cmd.start_playback = True
            cmd.looping = bool(rng.integers(0, 2))
            cmd.change_volume = True
            cmd.volume = float(rng.uniform(0, 1))
            if rng.random() < 0.3:
                cmd.change_slice = True
                cmd.slice = int(rng.integers(0, 16))
            engine.schedule_clip_command(cmd, int(rng.integers(0, 8)))
        elif roll < 0.25:
            cmd = ClipCommand.channel(clip.id, ch)
            cmd.midi_note = int(rng.integers(30, 90))
            cmd.stop_playback = True
            engine.schedule_clip_command(cmd, int(rng.integers(0, 4)))
        elif roll < 0.28:
            engine.schedule_timer_command(
                TimerCommand(operation=Operation.SET_BPM,
                             parameter=int(rng.integers(40, 220))), 0
            )
        elif roll < 0.30:
            lane = int(rng.integers(-2, 10))
            engine.schedule_timer_command(
                TimerCommand(
                    operation=Operation.SAMPLER_CHANNEL_ENABLED_STATE,
                    parameter=lane, parameter2=int(rng.integers(0, 2)),
                ), 0
            )
        elif roll < 0.315:
            # strip fabric fuzz: direct API and timer-command paths
            ch = int(rng.integers(-1, 10))
            if rng.random() < 0.5:
                engine.set_strip(
                    ch,
                    dry=float(rng.uniform(0, 1)),
                    pan=float(rng.uniform(-1, 1)),
                    muted=float(rng.integers(0, 2)),
                )
            else:
                engine.schedule_timer_command(
                    TimerCommand(
                        operation=Operation.PASSTHROUGH_CLIENT,
                        parameter=ch,
                        parameter2=int(rng.integers(0, 5)),
                        parameter3=int(rng.integers(0, 101)),
                    ), 0
                )
        elif roll < 0.32:
            engine.schedule_note(
                int(rng.integers(30, 90)), int(rng.integers(0, 16)),
                velocity=int(rng.integers(1, 128)),
                duration=int(rng.integers(1, 200)),
                delay=int(rng.integers(0, 16)),
            )
        elif roll < 0.33 and engine.transport_running:
            engine.stop_transport()
        elif roll < 0.34 and not engine.transport_running:
            engine.start_transport()
        elif extended and roll < 0.355:
            # scheduled stretch/pitch/gain mutation: routes through
            # _apply_clip_command's DEFERRED offline re-render (the
            # needsRender/playbackFileChanged path + render worker + WSOLA)
            cmd = ClipCommand.channel(clip.id, ch)
            which = rng.random()
            if which < 0.4:
                cmd.change_speed = True
                cmd.speed_ratio = float(rng.uniform(0.5, 2.0))
            elif which < 0.8:
                cmd.change_pitch = True
                cmd.pitch_change = float(rng.uniform(-7, 7))
            else:
                cmd.change_gain_db = True
                cmd.gain_db = float(rng.uniform(-12, 3))
            engine.schedule_clip_command(cmd, int(rng.integers(0, 4)))
        elif extended and roll < 0.365:
            # recording toggles mid-flight (threaded WAV writers)
            if engine.levels.is_recording:
                engine.levels.stop_recording()
            else:
                engine.levels.set_record_global_playback(True)
                engine.levels.set_global_playback_filename_prefix(
                    str(tmp_dir) + "/soak-"
                )
                engine.levels.start_recording()
        elif extended and roll < 0.37:
            from libzl_tpu.models.session import save_session

            save_session(engine, str(tmp_dir) + "/soak_session.json")

        res = engine.process_block()
        master = np.asarray(res.outputs.master)
        assert np.isfinite(master).all(), f"non-finite output at block {b}"
        # liveness is measured PRE-strip (lane mixes): the strip fuzz can
        # legitimately mute the global playback strip for the rest of a run
        # (master goes silent by console state, not by engine failure)
        if np.abs(np.asarray(res.outputs.lane_mix)).max() > 1e-4:
            audible_blocks += 1

        # invariants: positions stay in-range for positional/non-looping
        # voices (beat-quantized loops may legitimately play past the end of
        # a short sound until the musical wrap, SamplerSynthVoice.cpp:231).
        # The bound is max(length, stop), not length: after a speed-up
        # shrinks the playback render, the stop position (seconds into the
        # playback file, unclamped — reference parity with
        # SamplerSynthSound::stopPosition applied to a shorter tracktion
        # render) can exceed the buffer; the voice then plays
        # reference-correct silence (fetch masked past the end) until the
        # positional wrap/stop at `stop`.
        pool = engine.pool
        act = pool.active
        assert (pool.pos_int[act] >= 0).all()
        bounded = act & ~(pool.looping & pool.beat_quantized)
        limit = (
            np.maximum(pool.length[bounded], pool.stop[bounded])
            + pool.rate_int[bounded] + 2
        )
        assert (pool.pos_int[bounded] <= limit).all(), (
            f"position escaped its sound at block {b}"
        )
        assert 50 <= engine.bpm <= 200

        if b % 10 == 0:
            engine.update_session(res)

    if engine.levels.is_recording:
        engine.levels.stop_recording()
    # the session actually made sound for a substantial share of its life
    assert audible_blocks > n_blocks // 6
    # meters/profiling kept up
    assert engine.slo.total_blocks == n_blocks
    s = engine.profiler.summary()["process_block"]
    assert s["count"] > 0


def test_soak_random_traffic():
    _soak("numpy", 3000, 1234)


def test_soak_jax_backend():
    """Shorter run through the jit dispatch path: exercises program packing,
    the device strip cache (fuzzes invalidation), and the idle shortcut."""
    from tests._budget import fuzz_blocks

    _soak("jax", fuzz_blocks(quick=300, full=600), 99)


def test_soak_extended_traffic(tmp_path):
    """Deferred re-renders (render worker + WSOLA), recording toggles and
    checkpoints under the same adversarial traffic."""
    _soak("numpy", 1200, 4321, extended=True, tmp_dir=str(tmp_path))
