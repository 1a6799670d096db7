"""Deferred missing-file loads: the reference polls a sample file that
does not exist yet every 100 ms until it appears
(lib/SamplerSynthSound.cpp:55-58; WaveFormItem.cpp:130-143 retries
thumbnails the same way). ClipAudioSource(wait_for_file=True) plays a
silent placeholder until the file lands, then loads it off-thread and
swaps the audio in at a block boundary through the deferred-render path.
"""

import time

import numpy as np
import pytest

from libzl_tpu.engine.engine import AudioEngine
from libzl_tpu.io.wav import write_wav
from libzl_tpu.models import clip as clip_mod
from libzl_tpu.models.clip import ClipAudioSource

SR = 48000


def _tone(seconds=0.25, freq=440.0):
    t = np.arange(int(SR * seconds)) / SR
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _wait_until(cond, timeout=5.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if cond():
            return True
        time.sleep(0.02)
    return False


def test_missing_file_without_wait_raises(tmp_path):
    engine = AudioEngine(block_frames=128, num_voices=8, backend="numpy")
    with pytest.raises(Exception):
        ClipAudioSource(engine, str(tmp_path / "nope.wav"))


def test_pending_file_loads_when_it_appears(tmp_path):
    engine = AudioEngine(block_frames=128, num_voices=8, backend="numpy")
    path = tmp_path / "late.wav"
    clip = ClipAudioSource(engine, str(path), wait_for_file=True)
    try:
        assert clip.pending_file
        # placeholder is silent and tiny
        assert float(np.abs(clip.playback_audio.samples).max()) == 0.0

        # the clip is playable NOW (silence), no exception
        clip.play(loop=True, midi_channel=0)
        engine.start_transport(bpm=120)
        res = None
        for _ in range(4):
            res = engine.process_block()
        assert float(np.abs(np.asarray(res.outputs.master)).max()) == 0.0

        write_wav(str(path), _tone(), SR)
        assert _wait_until(lambda: not clip.pending_file)
        # the swap lands at a block boundary via engine._pending_renders:
        # pump a few blocks until the loaded audio is live
        def _swapped():
            engine.process_block()
            return clip.playback_audio.samples.shape[0] > SR * 0.1

        assert _wait_until(_swapped)
        assert clip.length_seconds == pytest.approx(0.25, abs=0.01)

        # and it actually sounds once retriggered
        clip.play(loop=True, midi_channel=0)
        peak = 0.0
        for _ in range(8):
            res = engine.process_block()
            peak = max(peak,
                       float(np.abs(np.asarray(res.outputs.master)).max()))
        assert peak > 0.01
    finally:
        clip.destroy()


def test_partial_write_keeps_polling(tmp_path):
    """A truncated file (still being written) must not kill the watcher —
    the retry loop tolerates decode failures."""
    engine = AudioEngine(block_frames=128, num_voices=8, backend="numpy")
    path = tmp_path / "slow.wav"
    clip = ClipAudioSource(engine, str(path), wait_for_file=True)
    try:
        # drop a garbage partial file: exists but cannot decode
        path.write_bytes(b"RIFF\x00\x00")
        time.sleep(0.35)
        assert clip.pending_file  # still waiting, watcher alive
        write_wav(str(path), _tone(0.1), SR)
        assert _wait_until(lambda: not clip.pending_file)
    finally:
        clip.destroy()


def test_destroy_while_pending_stops_watching(tmp_path):
    engine = AudioEngine(block_frames=128, num_voices=8, backend="numpy")
    path = tmp_path / "never.wav"
    clip = ClipAudioSource(engine, str(path), wait_for_file=True)
    clip.destroy()
    # clearing pending_file makes the watcher drop the entry next tick
    assert _wait_until(
        lambda: all(c is not clip for c in clip_mod._watch_list)
    )
    # late file appearance must not resurrect the destroyed clip
    # (destroy cleared pending_file, so the watcher ignores it)
    write_wav(str(path), _tone(0.1), SR)
    time.sleep(0.3)
    assert not clip.pending_file
    # still the silent placeholder, not the late file's tone
    assert not clip.source.samples.any()


def test_parameter_change_while_pending_keeps_watching(tmp_path):
    """Setting gain/pitch before the awaited file lands (a normal UI
    sequence) bumps the render generation — that must NOT cancel the
    poll; the first real render applies the current parameters."""
    import numpy as np

    from libzl_tpu.io.wav import write_wav

    engine = AudioEngine(block_frames=128, num_voices=8, backend="numpy")
    path = tmp_path / "late.wav"
    clip = ClipAudioSource(engine, str(path), wait_for_file=True)
    clip.set_gain(-6.0)           # generation bump while pending
    clip.set_pitch(2.0, defer=True)
    assert clip.pending_file
    body = (0.4 * np.sin(2 * np.pi * 220 * np.arange(4800) / 48000)
            ).astype(np.float32)
    write_wav(path, body, 48000)
    assert _wait_until(lambda: not clip.pending_file)
    assert clip.source.num_frames == 4800
