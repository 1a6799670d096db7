"""The ctypes marshalling layer of io/alsa.py, driven by a snd_*-level fake.

Every other ALSA test injects a fake that implements the high-level py_*
hooks, which leaves the REAL code paths — hint-array walking, byref handle
returns, the bounded -EAGAIN rawmidi write retry, xrun recovery on PCM
read/write — untested. This fake implements the snd_* functions themselves
(no py_* attributes), so the binding's own pointer/buffer handling runs
exactly as it does against real libasound on a Zynthian-class host.

Reference analog: the JACK graph the reference relies on for hardware I/O
(lib/MidiRouter.cpp:607-693, lib/SamplerSynth.cpp:101-102) — here the
hardware edge is this binding, so its marshalling deserves direct tests.
"""

import ctypes

import numpy as np
import pytest

from libzl_tpu.io import alsa


def _set_ptr(byref_arg, addr: int) -> None:
    """Write an address into the pointer object behind a byref() argument.

    memmove must target the pointer OBJECT's storage (addressof), not the
    instance itself — ctypes converts a pointer instance passed as dst to
    its contained value (NULL here), which would be a write to address 0.
    """
    ctypes.memmove(ctypes.addressof(byref_arg._obj),
                   ctypes.byref(ctypes.c_void_p(addr)),
                   ctypes.sizeof(ctypes.c_void_p))


class SndFake:
    """Implements the snd_* surface the binding declares (no py_* hooks)."""

    def __init__(self):
        self.keep = []          # buffers that must outlive the call
        self.freed_hints = 0
        self.closed = []
        self.midi_in = b"\x90\x3c\x64"
        self.midi_written = b""
        self.write_rcs = []     # scripted snd_rawmidi_write returns
        self.pcm_written = []
        self.pcm_write_rcs = []
        self.pcm_read_rcs = []
        self.recover_rc = 0
        self.recovered = 0
        self.capture = np.zeros((0, 2), np.float32)
        self.open_rc = 0
        self.set_params_rc = 0
        self.drained = 0

    # ------------------------------------------------------------- hints
    def _hint_records(self):
        return [
            {b"NAME": b"hw:CARD=X,DEV=0", b"DESC": b"X synth", b"IOID": b"Input"},
            {b"NAME": None, b"DESC": b"nameless", b"IOID": b""},  # skipped
            {b"NAME": b"hw:CARD=Y,DEV=0", b"DESC": None, b"IOID": None},
        ]

    def snd_device_name_hint(self, card, iface, byref_hints):
        assert iface == b"rawmidi"
        self._recs = self._hint_records()
        # a NULL-terminated array of opaque per-record addresses
        self._byaddr = {}
        arr = (ctypes.c_void_p * (len(self._recs) + 1))()
        for i, rec in enumerate(self._recs):
            tag = ctypes.create_string_buffer(8)
            self.keep.append(tag)
            addr = ctypes.addressof(tag)
            self._byaddr[addr] = rec
            arr[i] = addr
        arr[len(self._recs)] = None
        self.keep.append(arr)
        _set_ptr(byref_hints, ctypes.addressof(arr))
        return 0

    def snd_device_name_get_hint(self, hint_addr, key):
        val = self._byaddr[hint_addr].get(key)
        if val is None:
            return ctypes.c_void_p(None)
        buf = ctypes.create_string_buffer(val)
        self.keep.append(buf)
        return ctypes.cast(buf, ctypes.c_void_p)

    def snd_device_name_free_hint(self, hints):
        self.freed_hints += 1
        return 0

    # ----------------------------------------------------------- rawmidi
    def snd_rawmidi_open(self, in_ref, out_ref, name, mode):
        assert mode == alsa.SND_RAWMIDI_NONBLOCK
        if self.open_rc < 0:
            return self.open_rc
        _set_ptr(in_ref if in_ref is not None else out_ref, 0xDEAD)
        return 0

    def snd_rawmidi_read(self, handle, buf, maxlen):
        data = self.midi_in[:maxlen]
        if not data:
            return -11  # -EAGAIN: nothing pending
        ctypes.memmove(buf, data, len(data))
        self.midi_in = self.midi_in[len(data):]
        return len(data)

    def snd_rawmidi_write(self, handle, data, length):
        rc = self.write_rcs.pop(0) if self.write_rcs else length
        if rc > 0:
            took = min(rc, length)
            raw = data if isinstance(data, bytes) else ctypes.string_at(data, length)
            self.midi_written += raw[:took]
            return took
        return rc

    def snd_rawmidi_close(self, handle):
        self.closed.append(("midi", handle))
        return 0

    # --------------------------------------------------------------- pcm
    def snd_pcm_open(self, byref_handle, name, stream, mode):
        if self.open_rc < 0:
            return self.open_rc
        _set_ptr(byref_handle, 0xBEEF)
        return 0

    def snd_pcm_set_params(self, handle, fmt, access, channels, rate,
                           resample, latency):
        assert fmt == alsa.SND_PCM_FORMAT_FLOAT_LE
        assert access == alsa.SND_PCM_ACCESS_RW_INTERLEAVED
        self.pcm_params = (channels, rate, latency)
        return self.set_params_rc

    def snd_pcm_writei(self, handle, ptr, frames):
        rc = self.pcm_write_rcs.pop(0) if self.pcm_write_rcs else frames
        if rc > 0:
            ch = self.pcm_params[0]
            raw = ctypes.string_at(ptr, int(frames) * ch * 4)
            self.pcm_written.append(
                np.frombuffer(raw, np.float32).reshape(-1, ch).copy())
        return rc

    def snd_pcm_readi(self, handle, ptr, frames):
        rc = self.pcm_read_rcs.pop(0) if self.pcm_read_rcs else None
        if rc is not None and rc < 0:
            return rc
        n = min(int(frames), self.capture.shape[0])
        if n:
            ctypes.memmove(ptr, self.capture[:n].tobytes(), n * self.capture.shape[1] * 4)
            self.capture = self.capture[n:]
        return n

    def snd_pcm_recover(self, handle, err, silent):
        self.recovered += 1
        return self.recover_rc

    def snd_pcm_drain(self, handle):
        self.drained += 1
        return 0

    def snd_pcm_close(self, handle):
        self.closed.append(("pcm", handle))
        return 0


@pytest.fixture
def snd():
    fake = SndFake()
    alsa.set_alsa_lib_for_testing(fake)
    yield fake
    alsa.set_alsa_lib_for_testing(None)


def test_enumerate_walks_hint_array(snd):
    devs = alsa.enumerate_rawmidi()
    # the NAME-less record is skipped; DESC/IOID default when absent
    assert devs == [
        dict(name="hw:CARD=X,DEV=0", desc="X synth", ioid="Input"),
        dict(name="hw:CARD=Y,DEV=0", desc="hw:CARD=Y,DEV=0", ioid=""),
    ]
    assert snd.freed_hints == 1


def test_rawmidi_open_directions_and_error(snd):
    h_in = alsa.rawmidi_open("hw:CARD=X", "in")
    h_out = alsa.rawmidi_open("hw:CARD=X", "out")
    assert h_in.value == 0xDEAD and h_out.value == 0xDEAD
    snd.open_rc = -2
    with pytest.raises(RuntimeError, match="snd_rawmidi_open"):
        alsa.rawmidi_open("hw:CARD=X", "in")


def test_rawmidi_read_buffers(snd):
    h = alsa.rawmidi_open("hw:CARD=X", "in")
    assert alsa.rawmidi_read(h) == b"\x90\x3c\x64"
    assert alsa.rawmidi_read(h) == b""  # -EAGAIN -> empty, not an error


def test_rawmidi_write_retries_eagain_and_partials(snd):
    h = alsa.rawmidi_open("hw:CARD=X", "out")
    # partial write, then -EAGAIN, then the rest: all 6 bytes must land
    snd.write_rcs = [2, -11, 4]
    msg = bytes([0x90, 60, 100, 0x80, 60, 0])
    assert alsa.rawmidi_write(h, msg) == 6
    assert snd.midi_written == msg
    # hard error mid-message: returns the count actually written
    snd.midi_written = b""
    snd.write_rcs = [3, -5]  # -EIO
    assert alsa.rawmidi_write(h, msg) == 3
    assert snd.midi_written == msg[:3]
    alsa.rawmidi_close(h)
    assert ("midi", h) in snd.closed


def test_pcm_playback_write_and_xrun_recovery(snd):
    h = alsa.pcm_open_playback("default", 48000, channels=2)
    assert snd.pcm_params == (2, 48000, 20000)
    block = np.linspace(-1, 1, 8, dtype=np.float32).reshape(4, 2)
    assert alsa.pcm_write(h, block) == 4
    np.testing.assert_array_equal(snd.pcm_written[0], block)
    # xrun (-EPIPE): recover once, retry succeeds
    snd.pcm_write_rcs = [-32]
    assert alsa.pcm_write(h, block) == 4
    assert snd.recovered == 1
    # unrecoverable: returns 0 frames
    snd.pcm_write_rcs = [-32, -32]
    snd.recover_rc = -32
    assert alsa.pcm_write(h, block) == 0
    alsa.pcm_drain_close(h)
    assert snd.drained == 1 and ("pcm", h) in snd.closed


def test_pcm_open_error_paths(snd):
    snd.open_rc = -16
    with pytest.raises(RuntimeError, match="snd_pcm_open"):
        alsa.pcm_open_playback("default", 48000)
    snd.open_rc = 0
    snd.set_params_rc = -22
    with pytest.raises(RuntimeError, match="set_params"):
        alsa.pcm_open_playback("default", 48000)
    # the half-opened handle must be closed on the set_params failure
    assert snd.closed and snd.closed[-1][0] == "pcm"
    snd.set_params_rc = -22
    with pytest.raises(RuntimeError, match="set_params capture"):
        alsa.pcm_open_capture("default", 48000)


def test_pcm_capture_read_and_recovery(snd):
    h = alsa.pcm_open_capture("default", 48000, channels=2)
    assert snd.pcm_params == (2, 48000, 40000)
    sig = np.arange(12, dtype=np.float32).reshape(6, 2) / 12.0
    snd.capture = sig.copy()
    got = alsa.pcm_read(h, 4, channels=2)
    np.testing.assert_array_equal(got, sig[:4])
    # xrun then recovery: the retry returns the remaining frames
    snd.pcm_read_rcs = [-32]
    got = alsa.pcm_read(h, 4, channels=2)
    assert snd.recovered == 1
    np.testing.assert_array_equal(got, sig[4:])
    # short read returns only what arrived
    assert alsa.pcm_read(h, 4, channels=2).shape == (0, 2)
    alsa.pcm_close(h)
    assert ("pcm", h) in snd.closed


def test_unavailable_host_degrades():
    alsa.set_alsa_lib_for_testing(None)
    real = alsa.get_alsa()
    if real is not None:
        pytest.skip("host has real libasound")
    assert not alsa.available()
    assert alsa.enumerate_rawmidi() == []
    assert alsa.rawmidi_read(None) == b""
    assert alsa.rawmidi_write(None, b"\x90") == 0
    with pytest.raises(RuntimeError):
        alsa.rawmidi_open("hw:X", "in")
    with pytest.raises(RuntimeError):
        alsa.pcm_open_playback("default", 48000)
    assert alsa.pcm_write(None, np.zeros((4, 2), np.float32)) == 0
    assert alsa.pcm_read(None, 4).shape == (0, 2)
