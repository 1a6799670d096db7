"""Engine-level super-block mode (1024-frame blocks, throughput config)."""

import numpy as np
import pytest

from libzl_tpu.engine.engine import AudioEngine
from libzl_tpu.io.wav import AudioData
from libzl_tpu.models.clip import ClipAudioSource

SR = 48000


def test_superblock_equals_small_blocks():
    """Rendering in 1024-frame super-blocks must produce the same audio as
    128-frame blocks (same session, same commands)."""
    outs = {}
    for B in (128, 1024):
        engine = AudioEngine(
            sample_rate=SR, block_frames=B, backend="numpy", num_voices=16
        )
        t = np.arange(SR // 4) / SR
        clip = ClipAudioSource(
            engine,
            audio=AudioData(
                (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[:, None],
                SR,
            ),
        )
        engine.start_transport(bpm=120)
        clip.play(loop=True, midi_channel=0)
        blocks = []
        total = 98304  # ~2 s, divisible by both block sizes
        for _ in range(total // B):
            res = engine.process_block()
            blocks.append(np.asarray(res.outputs.master))
        outs[B] = np.concatenate(blocks, axis=0)
    np.testing.assert_allclose(outs[128], outs[1024], atol=1e-6)


def test_superblock_sample_accurate_stop():
    """A stop scheduled on a mid-super-block tick lands at its exact frame
    offset inside the 1024-frame block."""
    engine = AudioEngine(
        sample_rate=SR, block_frames=1024, backend="numpy", num_voices=16
    )
    t = np.arange(SR) / SR
    clip = ClipAudioSource(
        engine,
        audio=AudioData(
            np.ones_like(t, dtype=np.float32)[:, None] * 0.5, SR
        ),
    )
    clip.adsr_release = 0.0  # immediate cut on stop
    engine.start_transport(bpm=120)
    clip.play(loop=True, midi_channel=0)
    engine.process_block()
    # schedule the stop 3 ticks ahead: tick cadence is 250 samples, so the
    # cut should land mid-super-block
    from libzl_tpu.engine.commands import ClipCommand

    cmd = ClipCommand.channel(clip.id, 0)
    cmd.midi_note = 60
    cmd.stop_playback = True
    engine.schedule_clip_command(cmd, 3)
    res = engine.process_block()
    master = np.asarray(res.outputs.master)
    level = np.abs(master).max(axis=1)
    cut = np.flatnonzero(level < 1e-6)
    assert len(cut) > 0, "stop did not land inside the super-block"
    first_cut = cut[0]
    # ticks due in this block start at sample 1250 absolute = offset 226;
    # 3 ticks later = 226 + 750 = 976
    assert first_cut == 976
