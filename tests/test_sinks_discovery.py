"""Audio sinks + ALSA MIDI discovery/hot-plug + feedback-port routing.

All hardware behavior is driven through a fake libasound injected via
io/alsa.set_alsa_lib_for_testing — the py_* hook surface lets the fake stay
plain Python. Reference behaviors covered: the audible output path
(lib/SamplerSynth.cpp:101-102 connects every channel to system:playback),
hardware discovery + added/removed signals (lib/MidiRouter.cpp:788-824,
607-693), and ENABLED_FB feedback ports (parsed at lib/MidiRouter.cpp:1004;
see PARITY.md for the documented intent-implementation)."""

import os
import time

import numpy as np
import pytest

from libzl_tpu.io import alsa
from libzl_tpu.io.sinks import AlsaPcmSink, FileSink, NullSink, make_sink
from libzl_tpu.io.wav import read_wav, write_wav

SR = 48000


class FakeAlsa:
    """Plain-Python libasound stand-in using io/alsa's py_* hook surface."""

    def __init__(self):
        self.devices = []           # dicts {name, desc, ioid}
        self.midi_in_data = {}      # device -> bytearray to be read
        self.midi_out_data = {}     # device -> bytes written
        self.pcm_written = {}       # device -> [blocks]
        self.pcm_closed = []
        self.open_fail = set()      # device names whose open should fail

    # enumeration
    def py_enumerate_rawmidi(self):
        return list(self.devices)

    # rawmidi
    def py_rawmidi_open(self, device, direction):
        if device in self.open_fail:
            raise RuntimeError(f"busy: {device}")
        self.midi_in_data.setdefault(device, bytearray())
        self.midi_out_data.setdefault(device, b"")
        return (device, direction)

    def py_rawmidi_read(self, handle, maxlen):
        device, _ = handle
        buf = self.midi_in_data.get(device, bytearray())
        out = bytes(buf[:maxlen])
        del buf[:maxlen]
        return out

    def py_rawmidi_write(self, handle, data):
        device, _ = handle
        self.midi_out_data[device] = self.midi_out_data.get(device, b"") + data

    def py_rawmidi_close(self, handle):
        pass

    # pcm
    def py_pcm_open_playback(self, device, rate, channels, latency_us):
        if device in self.open_fail:
            raise RuntimeError(f"no such pcm: {device}")
        self.pcm_written.setdefault(device, [])
        return device

    def py_pcm_write(self, handle, block):
        self.pcm_written[handle].append(np.array(block, copy=True))
        return block.shape[0]

    def py_pcm_drain_close(self, handle):
        self.pcm_closed.append(handle)


@pytest.fixture
def fake_alsa():
    fake = FakeAlsa()
    alsa.set_alsa_lib_for_testing(fake)
    yield fake
    alsa.set_alsa_lib_for_testing(None)


# ------------------------------------------------------------------- sinks

def test_null_and_file_sink_basics(tmp_path):
    ns = NullSink()
    ns.write(np.zeros((128, 2), np.float32))
    assert ns.frames_written == 128

    path = tmp_path / "sink.wav"
    fs = FileSink(str(path), SR)
    t = np.arange(256) / SR
    block = np.stack([np.sin(2 * np.pi * 440 * t)] * 2, axis=1).astype(
        np.float32
    ) * 0.5
    fs.write(block[:128])
    fs.write(block[128:])
    fs.close()
    back = read_wav(path)
    assert back.num_frames == 256
    assert np.abs(back.samples - block).max() < 2e-4  # 16-bit quantization


def test_alsa_pcm_sink_through_fake(fake_alsa):
    sink = make_sink("alsa:fakecard", SR)
    assert isinstance(sink, AlsaPcmSink) and sink.pacing
    block = np.full((128, 2), 0.25, np.float32)
    sink.write(block)
    sink.write(block)
    assert sink.frames_written == 256
    assert len(fake_alsa.pcm_written["fakecard"]) == 2
    assert np.array_equal(fake_alsa.pcm_written["fakecard"][0], block)
    sink.close()
    assert fake_alsa.pcm_closed == ["fakecard"]


def test_alsa_sink_unavailable_without_lib():
    # no override, no system libasound in this image
    assert not alsa.available()
    with pytest.raises(RuntimeError):
        make_sink("alsa", SR)


def test_make_sink_specs(tmp_path):
    assert isinstance(make_sink("null", SR), NullSink)
    with pytest.raises(ValueError):
        make_sink("file", SR)  # missing path
    with pytest.raises(ValueError):
        make_sink("bogus", SR)


def test_pump_sink_receives_exact_master(tmp_path):
    """The sink and the global-playback recorder are fed from the same
    consumed blocks — their outputs must be sample-identical, and the sink
    stream must be gapless (the audible path carries the master mix
    faithfully, the system:playback analog)."""
    from libzl_tpu.capi import bridge

    src = tmp_path / "ramp.wav"
    n = SR
    ramp = (np.arange(1, n + 1, dtype=np.float32) / n * 0.5)[:, None]
    write_wav(src, ramp, SR)

    os.environ["LIBZL_TPU_BACKEND"] = "numpy"
    os.environ["LIBZL_TPU_VOICES"] = "32"
    os.environ["LIBZL_TPU_SINK"] = f"file:{tmp_path / 'sink.wav'}"
    try:
        bridge.init_engine(pump=True)
        rt = bridge._rt()
        assert rt.sink is not None and rt.sink.name == "file"
        cid = bridge.clip_new(str(src))
        bridge.levels_set_record_global_playback(True)
        bridge.levels_set_global_playback_filename_prefix(
            str(tmp_path / "rec.wav")
        )
        bridge.levels_start_recording()
        bridge.clip_play(cid, False, 0)
        engine = rt.engine
        target = engine.total_blocks + 40
        deadline = time.monotonic() + 20.0
        while engine.total_blocks < target and time.monotonic() < deadline:
            time.sleep(0.05)
        bridge.levels_stop_recording()
    finally:
        bridge.shutdown_engine()
        for k in ("LIBZL_TPU_BACKEND", "LIBZL_TPU_VOICES", "LIBZL_TPU_SINK"):
            os.environ.pop(k, None)

    sunk = read_wav(tmp_path / "sink.wav").samples
    rec = read_wav(tmp_path / "rec.wav").samples
    # the sink runs from pump start while recording starts later — align
    # both streams at their first non-silent sample, then require
    # sample-exact equality
    s0 = int(np.flatnonzero(np.abs(sunk[:, 0]) > 0)[0])
    r0 = int(np.flatnonzero(np.abs(rec[:, 0]) > 0)[0])
    m = min(len(sunk) - s0, len(rec) - r0)
    assert m > 1280
    assert np.array_equal(sunk[s0 : s0 + m], rec[r0 : r0 + m]), (
        "sink diverged from recorder"
    )


# -------------------------------------------------------------- discovery

def make_router(fake):
    from libzl_tpu.midi.router import MidiRouter

    return MidiRouter(auto_discover=True)


def test_hotplug_add_and_remove(fake_alsa):
    fake_alsa.devices = [
        dict(name="hw:CARD=Pad,DEV=0", desc="Launchpad X\nUSB MIDI",
             ioid=""),
    ]
    router = make_router(fake_alsa)
    added, removed = [], []
    router.registry.on_input_added = lambda p: added.append(p.name)
    router.registry.on_input_removed = lambda p: removed.append(p.name)

    assert router.scanner.rescan() is True
    assert added == ["hw:CARD=Pad,DEV=0"]
    assert len(router.registry.inputs) == 1
    entry = router.registry.inputs[0]
    assert entry.port.human_name == "Launchpad X"
    # bidirectional endpoint also lands in outputs
    assert [p.name for p in router.registry.outputs] == ["hw:CARD=Pad,DEV=0"]

    # a note arriving on the discovered input routes with stickiness
    fake_alsa.midi_in_data["hw:CARD=Pad,DEV=0"] += bytes([0x90, 60, 100])
    router.begin_block()
    router.route_hardware()
    assert any(d[0] & 0xF0 == 0x90 for _, d in router.passthrough_out)

    # unplug: next rescan fires removed and closes the port
    fake_alsa.devices = []
    assert router.scanner.rescan() is True
    assert removed == ["hw:CARD=Pad,DEV=0"]
    assert router.registry.inputs == []
    assert router.registry.outputs == []


def test_hotplug_poll_cadence(fake_alsa):
    router = make_router(fake_alsa)
    router.scanner.poll(now=100.0)
    fake_alsa.devices = [
        dict(name="hw:CARD=K,DEV=0", desc="Keys", ioid="Input"),
    ]
    # within the 300 ms window: no rescan yet
    assert router.scanner.poll(now=100.1) is False
    assert router.registry.inputs == []
    # past the cadence: picked up
    assert router.scanner.poll(now=100.4) is True
    assert len(router.registry.inputs) == 1


def test_hotplug_open_failure_retries(fake_alsa):
    fake_alsa.devices = [
        dict(name="hw:CARD=Busy,DEV=0", desc="Busy", ioid="Input"),
    ]
    fake_alsa.open_fail.add("hw:CARD=Busy,DEV=0")
    router = make_router(fake_alsa)
    assert router.scanner.rescan() is False
    assert router.registry.inputs == []
    # device frees up: the next rescan opens it (connector-timer retry)
    fake_alsa.open_fail.clear()
    assert router.scanner.rescan() is True
    assert len(router.registry.inputs) == 1


def test_input_device_cap(fake_alsa):
    from libzl_tpu.constants import MAX_MIDI_INPUT_DEVICES

    fake_alsa.devices = [
        dict(name=f"hw:CARD=C{i},DEV=0", desc=f"Dev {i}", ioid="Input")
        for i in range(MAX_MIDI_INPUT_DEVICES + 4)
    ]
    router = make_router(fake_alsa)
    router.scanner.rescan()
    assert len(router.registry.inputs) == MAX_MIDI_INPUT_DEVICES


# ------------------------------------------------------------ feedback fb

def test_enabled_fb_routing(fake_alsa, monkeypatch):
    """ENABLED_FB ports receive engine-originated note feedback; plain
    enabled outputs receive external_out only."""
    monkeypatch.setenv(
        "ZYNTHIAN_MIDI_PORTS",
        "DISABLED_IN=\\nENABLED_OUT=Synth\\nENABLED_FB=Launchpad",
    )
    fake_alsa.devices = [
        dict(name="hw:CARD=Pad,DEV=0", desc="Launchpad X", ioid="Output"),
        dict(name="hw:CARD=Syn,DEV=0", desc="Synth Module", ioid="Output"),
    ]
    router = make_router(fake_alsa)
    router.scanner.rescan()
    pad, syn = router.registry.outputs
    assert pad.fb_enabled and not pad.enabled
    assert syn.enabled and not syn.fb_enabled

    # internal (engine-scheduled) note on channel 1, destination ZYNTHIAN:
    # feedback mirrors to the fb port; the enabled external port gets nothing
    router.begin_block()
    note = bytes([0x91, 64, 90])
    router.route_internal([(0, note)])
    router.flush_external()
    assert fake_alsa.midi_out_data["hw:CARD=Pad,DEV=0"] == note
    assert fake_alsa.midi_out_data["hw:CARD=Syn,DEV=0"] == b""

    # external-destination traffic reaches the enabled output, and the note
    # feedback still mirrors to the fb port
    from libzl_tpu.midi.router import Destination

    router.set_channel_destination(2, Destination.EXTERNAL, external_channel=5)
    router.begin_block()
    note2 = bytes([0x92, 65, 80])
    router.route_internal([(0, note2)])
    router.flush_external()
    assert bytes([0x95, 65, 80]) in fake_alsa.midi_out_data["hw:CARD=Syn,DEV=0"]
    assert note2 in fake_alsa.midi_out_data["hw:CARD=Pad,DEV=0"]


def test_reload_reapplies_fb_policy(fake_alsa, monkeypatch):
    monkeypatch.setenv(
        "ZYNTHIAN_MIDI_PORTS", "DISABLED_IN=\\nENABLED_OUT=\\nENABLED_FB="
    )
    fake_alsa.devices = [
        dict(name="hw:CARD=Pad,DEV=0", desc="Launchpad X", ioid="Output"),
    ]
    router = make_router(fake_alsa)
    router.scanner.rescan()
    (pad,) = router.registry.outputs
    assert not pad.fb_enabled
    monkeypatch.setenv(
        "ZYNTHIAN_MIDI_PORTS",
        "DISABLED_IN=\\nENABLED_OUT=\\nENABLED_FB=Launchpad",
    )
    router.reload_configuration()
    assert pad.fb_enabled


# --------------------------------------------------------------- sources

def test_file_source_feeds_capture_meters_and_recorder(tmp_path):
    """The capture path (SystemCapture analog): an attached source block
    registers on the capture meter slot and records via the "capture"
    record port."""
    from libzl_tpu.capi import bridge
    from libzl_tpu.io.sources import FileSource

    src = tmp_path / "mic.wav"
    t = np.arange(SR // 2) / SR
    write_wav(src, (0.4 * np.sin(2 * np.pi * 200 * t)).astype(np.float32), SR)

    os.environ["LIBZL_TPU_BACKEND"] = "numpy"
    os.environ["LIBZL_TPU_VOICES"] = "16"
    os.environ["LIBZL_TPU_NO_PUMP"] = "1"
    try:
        bridge.init_engine()
        rt = bridge._rt()
        rt.set_source(FileSource(str(src)))
        engine = rt.engine
        engine.levels.set_should_record_ports(True)
        engine.levels.set_record_ports_filename_prefix(
            str(tmp_path / "cap.wav")
        )
        engine.levels.add_record_port("capture", 0)
        engine.levels.add_record_port("capture", 1)
        engine.levels.start_recording()
        rt.step_blocks(3 * engine._levels_every)
        engine.levels.stop_recording()
        assert engine.levels.capture_a > -200.0
        assert engine.levels.playback_a == -200.0  # nothing playing
    finally:
        bridge.shutdown_engine()
        for k in ("LIBZL_TPU_BACKEND", "LIBZL_TPU_VOICES",
                  "LIBZL_TPU_NO_PUMP"):
            os.environ.pop(k, None)
    back = read_wav(tmp_path / "cap.wav")
    assert back.num_frames > 0
    assert np.abs(back.samples).max() > 0.2


def test_alsa_source_through_fake(fake_alsa):
    from libzl_tpu.io.sources import make_source

    blocks = [np.full((128, 2), 0.1 * (i + 1), np.float32) for i in range(3)]

    class CapFake:
        def __init__(self, outer):
            self.outer = outer

    def open_cap(device, rate, channels, latency_us):
        return device

    reads = iter(blocks)

    def read_cap(handle, frames, channels):
        try:
            return next(reads)
        except StopIteration:
            return np.zeros((0, channels), np.float32)

    fake_alsa.py_pcm_open_capture = open_cap
    fake_alsa.py_pcm_read = read_cap
    fake_alsa.py_pcm_close = lambda h: None
    src = make_source("alsa:capdev", SR)
    b1 = src.read(128)
    assert np.allclose(b1, 0.1)
    b2 = src.read(128)
    assert np.allclose(b2, 0.2)
    src.close()


def test_file_source_loops_and_one_pass(tmp_path):
    from libzl_tpu.io.sources import FileSource

    src = tmp_path / "short.wav"
    write_wav(src, np.ones((100, 1), np.float32) * 0.5, SR)
    looped = FileSource(str(src), loop=True)
    blk = looped.read(250)
    assert blk.shape == (250, 2)
    assert np.all(blk == 0.5)
    once = FileSource(str(src), loop=False)
    blk = once.read(250)
    assert np.all(blk[:100] == 0.5) and np.all(blk[100:] == 0.0)


def test_alsa_sink_stops_pacing_on_dead_device(fake_alsa):
    """An unplugged/dead PCM must not leave a pacing sink claiming to pace
    (the pump would spin at full speed against failed writes)."""
    sink = make_sink("alsa:dying", SR)
    block = np.zeros((128, 2), np.float32)
    fake_alsa.py_pcm_write = lambda h, b: 0  # device dead
    assert sink.pacing
    for _ in range(60):
        sink.write(block)
    assert not sink.pacing


def test_pump_thread_drives_discovery(fake_alsa, tmp_path):
    """Discovery moved OFF the render path (r2 code review): the pump
    thread enumerates outside the engine lock on the 300 ms cadence and
    applies diffs under it. A device appearing while the pump runs must be
    discovered without any route_hardware-side polling."""
    from libzl_tpu.capi import bridge

    os.environ["LIBZL_TPU_BACKEND"] = "numpy"
    os.environ["LIBZL_TPU_VOICES"] = "16"
    try:
        bridge.init_engine(pump=True)
        rt = bridge._rt()
        router = rt.engine.router
        router.auto_discover = True
        added = []
        router.registry.on_input_added = lambda p: added.append(p.name)
        fake_alsa.devices = [
            dict(name="hw:CARD=Live,DEV=0", desc="Live Keys", ioid="Input"),
        ]
        deadline = time.monotonic() + 5.0
        while not added and time.monotonic() < deadline:
            time.sleep(0.05)
        assert added == ["hw:CARD=Live,DEV=0"]
        # and replacing the sink mid-pump retires the old one safely
        from libzl_tpu.io.sinks import NullSink

        first = NullSink()
        rt.set_sink(first)
        second = NullSink()
        rt.set_sink(second)
        deadline = time.monotonic() + 5.0
        while rt._retired_io and time.monotonic() < deadline:
            time.sleep(0.05)
        assert not rt._retired_io, "pump did not close the retired sink"
    finally:
        bridge.shutdown_engine()
        os.environ.pop("LIBZL_TPU_BACKEND", None)
        os.environ.pop("LIBZL_TPU_VOICES", None)


def test_split_midi_stream_carries_partial_messages():
    """A read boundary landing mid-message must not emit truncated events
    (a lone 0x9x fragment would crash the router); the tail carries to the
    next read."""
    from libzl_tpu.midi.devices import _split_midi_stream

    msgs, tail = _split_midi_stream(bytes([0x90, 60, 100, 0x91]))
    assert msgs == [bytes([0x90, 60, 100])]
    assert tail == bytes([0x91])
    msgs2, tail2 = _split_midi_stream(tail + bytes([61, 99, 0xF8]))
    assert msgs2 == [bytes([0x91, 61, 99]), bytes([0xF8])]
    assert tail2 == b""
    # 2-byte fragment of a 3-byte message
    msgs3, tail3 = _split_midi_stream(bytes([0x80, 60]))
    assert msgs3 == [] and tail3 == bytes([0x80, 60])
    # system-common run to the end may continue next read
    msgs4, tail4 = _split_midi_stream(bytes([0xF0, 1, 2]))
    assert msgs4 == [] and tail4 == bytes([0xF0, 1, 2])


def test_file_source_zero_frames_never_spins(tmp_path):
    import numpy as np

    from libzl_tpu.io.sources import FileSource
    from libzl_tpu.io.wav import write_wav

    p = tmp_path / "empty.wav"
    write_wav(p, np.zeros((0, 2), np.float32), 48000)
    src = FileSource(str(p))          # loop=True default
    out = src.read(128)
    assert out.shape == (128, 2)
    assert not out.any()


def test_file_source_resamples_rate_mismatch(tmp_path):
    import numpy as np

    from libzl_tpu.io.sources import make_source
    from libzl_tpu.io.wav import write_wav

    sr_file, sr_engine = 44100, 48000
    t = np.arange(sr_file) / sr_file
    tone = (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    p = tmp_path / "cap44k1.wav"
    write_wav(p, tone[:, None], sr_file)
    src = make_source(f"file:{p}", sr_engine)
    assert src.sample_rate == sr_engine
    audio = np.concatenate([src.read(1024) for _ in range(40)], 0)
    # the 1 kHz tone must still be 1 kHz at the engine rate
    spec = np.abs(np.fft.rfft(audio[:, 0] * np.hanning(len(audio))))
    freqs = np.fft.rfftfreq(len(audio), 1 / sr_engine)
    peak_hz = freqs[int(np.argmax(spec))]
    assert abs(peak_hz - 1000.0) < 15.0, peak_hz


def test_split_midi_stream_realtime_interleaved():
    """Realtime bytes legally interrupt any message mid-flight (MIDI 1.0);
    clock-sending hardware does it 24x per quarter. They must pass
    through as standalone events without corrupting the host message."""
    from libzl_tpu.midi.devices import _split_midi_stream

    # clock inside a note-on: velocity must be 0x40, not 0xF8
    msgs, tail = _split_midi_stream(bytes([0x90, 0x3C, 0xF8, 0x40]))
    assert msgs == [bytes([0xF8]), bytes([0x90, 0x3C, 0x40])]
    assert tail == b""
    # clock inside a carried partial: the carry excludes the realtime byte
    msgs, tail = _split_midi_stream(bytes([0x90, 0x3C, 0xF8]))
    assert msgs == [bytes([0xF8])]
    assert tail == bytes([0x90, 0x3C])
    msgs2, tail2 = _split_midi_stream(tail + bytes([0x40]))
    assert msgs2 == [bytes([0x90, 0x3C, 0x40])] and tail2 == b""


def test_split_midi_stream_known_length_commons_flush_at_boundary():
    """A complete Song Position / Song Select / Tune Request ending
    exactly at the read boundary must emit now, not sit in the carry
    until the device sends more bytes."""
    from libzl_tpu.midi.devices import _split_midi_stream

    msgs, tail = _split_midi_stream(bytes([0xF2, 0x10, 0x20]))
    assert msgs == [bytes([0xF2, 0x10, 0x20])] and tail == b""
    msgs, tail = _split_midi_stream(bytes([0xF3, 0x05]))
    assert msgs == [bytes([0xF3, 0x05])] and tail == b""
    msgs, tail = _split_midi_stream(bytes([0xF6]))
    assert msgs == [bytes([0xF6])] and tail == b""
    # still carries when genuinely incomplete
    msgs, tail = _split_midi_stream(bytes([0xF2, 0x10]))
    assert msgs == [] and tail == bytes([0xF2, 0x10])


def test_split_midi_stream_sysex_includes_eox():
    """F0 ... F7 is ONE event including the terminator; an interrupting
    realtime byte passes through; a new status cancels an unterminated
    SysEx instead of emitting a fragment."""
    from libzl_tpu.midi.devices import _split_midi_stream

    msgs, tail = _split_midi_stream(bytes([0xF0, 0x41, 0x10, 0xF7]))
    assert msgs == [bytes([0xF0, 0x41, 0x10, 0xF7])] and tail == b""
    msgs, tail = _split_midi_stream(
        bytes([0xF0, 0x41, 0xF8, 0x10, 0xF7, 0x90, 0x3C, 0x40]))
    assert msgs == [bytes([0xF8]), bytes([0xF0, 0x41, 0x10, 0xF7]),
                    bytes([0x90, 0x3C, 0x40])]
    # unterminated sysex aborted by a channel status: sysex dropped
    msgs, tail = _split_midi_stream(bytes([0xF0, 0x41, 0x90, 0x3C, 0x40]))
    assert msgs == [bytes([0x90, 0x3C, 0x40])] and tail == b""
    # unterminated sysex at the boundary carries (bounded)
    msgs, tail = _split_midi_stream(bytes([0xF0, 1, 2]))
    assert msgs == [] and tail == bytes([0xF0, 1, 2])


def test_alsa_sink_retries_partial_writes(fake_alsa):
    """A short pcm_write (post-xrun interrupted writei) must not drop the
    block tail as a silent gap: the sink retries the remainder."""
    sink = make_sink("alsa:short", SR)
    block = np.arange(256, dtype=np.float32).reshape(128, 2) / 256.0
    chunks = []

    def short_write(handle, b):
        take = min(48, b.shape[0])
        chunks.append(np.array(b[:take], copy=True))
        return take

    fake_alsa.py_pcm_write = short_write
    sink.write(block)
    delivered = np.concatenate(chunks, axis=0)
    assert delivered.shape[0] == 128
    np.testing.assert_array_equal(delivered, block)
    assert sink.frames_written == 128
    assert sink.pacing


def test_alsa_mono_capture_duplicates_to_stereo(fake_alsa):
    """A channels=1 capture device must still honor the AudioSource.read
    contract (float32 [frames, 2])."""
    from libzl_tpu.io.sources import AlsaPcmSource

    fake_alsa.py_pcm_open_capture = lambda d, r, c, lu: d
    fake_alsa.py_pcm_read = (
        lambda h, frames, channels:
        np.full((frames, 1), 0.25, np.float32))
    fake_alsa.py_pcm_close = lambda h: None
    src = AlsaPcmSource("monodev", SR, channels=1)
    out = src.read(64)
    assert out.shape == (64, 2)
    assert np.allclose(out, 0.25)
    src.close()


def test_alsa_source_short_and_mono_reads(fake_alsa):
    """AlsaPcmSource.read() contract: a short hardware read pads with
    silence instead of blocking, a mono capture device duplicates to
    stereo, and close() is idempotent."""
    from libzl_tpu.io.sources import make_source

    def read_cap(handle, frames, channels):
        # 50 mono frames regardless of the request
        return np.full((50, 1), 0.25, np.float32)

    fake_alsa.py_pcm_open_capture = lambda d, r, c, l: d
    fake_alsa.py_pcm_read = read_cap
    closes = []
    fake_alsa.py_pcm_close = closes.append

    src = make_source("alsa:monodev", SR)
    out = src.read(128)
    assert out.shape == (128, 2) and out.dtype == np.float32
    assert np.allclose(out[:50, 0], 0.25) and np.allclose(out[:50, 1], 0.25)
    assert np.abs(out[50:]).max() == 0.0  # padded, not stale memory
    src.close()
    src.close()  # second close is a no-op
    assert closes == ["monodev"]


def test_make_source_null_and_missing_path():
    from libzl_tpu.io.sources import NullSource, make_source

    src = make_source("null", SR)
    assert isinstance(src, NullSource)
    out = src.read(64)
    assert out.shape == (64, 2) and out.dtype == np.float32
    assert not out.any()
    src.close()
    with pytest.raises(ValueError, match="file source needs a path"):
        make_source("file:", SR)
