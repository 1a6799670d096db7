"""Session checkpoint/resume + profiling tests."""

import numpy as np

from libzl_tpu.engine.engine import AudioEngine
from libzl_tpu.io.wav import write_wav
from libzl_tpu.midi.router import Destination
from libzl_tpu.models.clip import ClipAudioSource
from libzl_tpu.models.session import load_session, save_session

SR = 48000


def test_session_roundtrip(tmp_path):
    wav = tmp_path / "src.wav"
    t = np.arange(SR // 2) / SR
    write_wav(wav, (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), SR)

    e1 = AudioEngine(sample_rate=SR, backend="numpy", num_voices=16)
    clip = ClipAudioSource(e1, filepath=str(wav))
    clip.set_pan(-0.4)
    clip.set_volume(-6.0)
    clip.adsr_attack = 0.02
    clip.keyzone_start, clip.keyzone_end = 48, 72
    clip.root_note = 57
    e1.set_bpm(93)
    e1.set_strip(3, dry=0.7, pan=0.25)
    e1.lane_enabled[5] = False
    e1.router.set_channel_destination(
        2, Destination.EXTERNAL, external_channel=7
    )
    save_session(e1, tmp_path / "take.zlsession")

    e2 = AudioEngine(sample_rate=SR, backend="numpy", num_voices=16)
    id_map = load_session(e2, tmp_path / "take.zlsession")
    assert len(id_map) == 1
    c2 = id_map[clip.id]
    assert c2.pan == clip.pan
    assert abs(c2.volume_absolute - clip.volume_absolute) < 1e-9
    assert c2.adsr_attack == 0.02
    assert (c2.keyzone_start, c2.keyzone_end, c2.root_note) == (48, 72, 57)
    assert e2.bpm == 93
    assert e2.get_strip(3, "dry") == np.float32(0.7)
    assert not e2.lane_enabled[5]
    out2 = e2.router.outputs[2]
    assert out2.destination == Destination.EXTERNAL
    assert out2.external_channel == 7
    # the restored session renders
    c2.play(loop=True, midi_channel=0)
    res = e2.process_block()
    assert np.abs(np.asarray(res.outputs.master)).max() > 0.01


def test_profiler_and_slo_counters():
    engine = AudioEngine(sample_rate=SR, backend="numpy", num_voices=16)
    for _ in range(20):
        engine.process_block()
    s = engine.profiler.summary()
    assert "process_block" in s and s["process_block"]["count"] == 20
    assert engine.slo.total_blocks == 20
    assert 0.0 <= engine.dsp_load.load
