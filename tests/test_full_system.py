"""Full-system integration: every subsystem at once, deterministically.

One engine runtime drives: discovered (fake-ALSA) MIDI hardware input with
CC transport translation, note->sampler keyzone mapping, looped clips, the
strip fabric, an audio sink AND capture source, global recording, meters,
feedback ports, and a session checkpoint — stepped exact block counts, no
wall-clock dependence. The closest thing to the reference's live groovebox
session (test/playtest.py + hardware) the CI host can express."""

import os

import numpy as np
import pytest

from libzl_tpu.io import alsa
from libzl_tpu.io.wav import read_wav, write_wav

SR = 48000


class FakeAlsa:
    def __init__(self):
        self.devices = [
            dict(name="hw:CARD=Pad,DEV=0", desc="ATM SQ ATM SQ", ioid=""),
        ]
        self.midi_in = bytearray()
        self.midi_out = b""

    def py_enumerate_rawmidi(self):
        return list(self.devices)

    def py_rawmidi_open(self, device, direction):
        return (device, direction)

    def py_rawmidi_read(self, handle, maxlen):
        out = bytes(self.midi_in[:maxlen])
        del self.midi_in[:maxlen]
        return out

    def py_rawmidi_write(self, handle, data):
        self.midi_out += data

    def py_rawmidi_close(self, handle):
        pass


@pytest.fixture
def fake(tmp_path):
    f = FakeAlsa()
    alsa.set_alsa_lib_for_testing(f)
    os.environ.update(
        LIBZL_TPU_BACKEND="numpy",
        LIBZL_TPU_VOICES="32",
        LIBZL_TPU_NO_PUMP="1",
        LIBZL_TPU_SINK=f"file:{tmp_path / 'sink.wav'}",
    )
    yield f
    from libzl_tpu.capi import bridge

    bridge.shutdown_engine()
    alsa.set_alsa_lib_for_testing(None)
    for k in ("LIBZL_TPU_BACKEND", "LIBZL_TPU_VOICES", "LIBZL_TPU_NO_PUMP",
              "LIBZL_TPU_SINK"):
        os.environ.pop(k, None)


def test_everything_at_once(fake, tmp_path):
    from libzl_tpu.capi import bridge
    from libzl_tpu.io.sources import FileSource
    from libzl_tpu.midi.router import Destination
    from libzl_tpu.models.session import load_session, save_session

    # source material
    t = np.arange(SR // 2) / SR
    loop_wav = tmp_path / "loop.wav"
    write_wav(loop_wav,
              (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), SR)
    mic_wav = tmp_path / "mic.wav"
    write_wav(mic_wav,
              (0.3 * np.sin(2 * np.pi * 97 * t)).astype(np.float32), SR)

    bridge.init_engine()
    rt = bridge._rt()
    engine = rt.engine
    rt.set_source(FileSource(str(mic_wav)))

    # hardware appears: discovery opens it and wires translations
    engine.router.auto_discover = True
    assert engine.router.scanner.rescan()
    (entry,) = engine.router.registry.inputs
    assert "ATM SQ" in entry.port.human_name
    assert entry.cc_translations, "device CC translation table missing"

    # a clip looping on channel 2 + keyzone clip triggered from hardware
    cid = bridge.clip_new(str(loop_wav))
    clip = bridge.clip_by_id(cid)
    engine.router.set_channel_destination(0, Destination.SAMPLER)
    engine.router.current_channel = 0
    engine.sampler_map.assign(0, clip)

    bridge.levels_set_record_global_playback(True)
    bridge.levels_set_global_playback_filename_prefix(str(tmp_path / "rec.wav"))
    bridge.levels_start_recording()
    bridge.timer_start(int(60000 / (120 * 96)))
    bridge.clip_play(cid, True, 2)

    every = engine._levels_every
    rt.step_blocks(2 * every)

    # hardware note-on lands on the keyzone-mapped sampler (note 60 = root)
    fake.midi_in += bytes([0x90, 60, 100])
    rt.step_blocks(2 * every)
    # two independent playback positions now live: the loop + the note
    assert len(clip.positions_model) >= 2

    # transport CC translation: ATOM SQ CC85 val 127 -> MIDI stop
    # (DeviceMessageTranslations.h:13-41)
    fake.midi_in += bytes([0xB0, 85, 127])
    rt.step_blocks(2)

    # meters: playback moving, capture moving, channel 2 moving
    rt.step_blocks(every + 1)
    lv = engine.levels
    assert lv.playback_a > -200.0
    assert lv.capture_a > -200.0
    assert lv.channels_a[2] > -200.0

    # checkpoint mid-session
    save_session(engine, tmp_path / "mid.zlsession")

    fake.midi_in += bytes([0x80, 60, 0])  # note off
    rt.step_blocks(2 * every)
    bridge.levels_stop_recording()
    total_blocks = engine.total_blocks

    # recording exists, sink stream is sample-identical to it
    rec = read_wav(tmp_path / "rec.wav")
    assert rec.num_frames > 0 and np.abs(rec.samples).max() > 0.05
    rt.set_sink(None)  # flush + close the file sink
    sunk = read_wav(tmp_path / "sink.wav").samples
    s0 = int(np.flatnonzero(np.abs(sunk[:, 0]) > 0)[0])
    r0 = int(np.flatnonzero(np.abs(rec.samples[:, 0]) > 0)[0])
    m = min(len(sunk) - s0, rec.num_frames - r0)
    assert m > 1000
    assert np.array_equal(sunk[s0 : s0 + m], rec.samples[r0 : r0 + m])

    # the checkpoint restores into a fresh engine and renders
    from libzl_tpu.engine.engine import AudioEngine

    e2 = AudioEngine(sample_rate=SR, backend="numpy", num_voices=32)
    idmap = load_session(e2, tmp_path / "mid.zlsession")
    assert len(idmap) == 1
    c2 = next(iter(idmap.values()))
    c2.play(loop=True, midi_channel=2)
    res = e2.process_block()
    assert np.abs(np.asarray(res.outputs.master)).max() > 0.01
    assert total_blocks > 4 * every
