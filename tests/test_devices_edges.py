"""MIDI device-layer edges: closed rawmidi handles, stream-parser drops,
registry callbacks, and the no-sound-stack scanner path.

Reference analogs: the hardware discovery/enablement policy of
lib/MidiRouter.cpp:607-693,990-1009 and the byte-stream framing the JACK
MIDI API normally does for the reference."""

import numpy as np

from libzl_tpu.io import alsa
from libzl_tpu.midi import devices
from libzl_tpu.midi.devices import (
    AlsaRawMidiPort,
    DeviceRegistry,
    MidiPort,
    _split_midi_stream,
)


class _NoOpenAlsa:
    """Fake libasound where rawmidi_open yields no handle (device gone
    between enumeration and open — a real hotplug race)."""

    def py_rawmidi_open(self, device, direction):
        return None


def test_rawmidi_port_with_no_handle_is_inert():
    alsa.set_alsa_lib_for_testing(_NoOpenAlsa())
    try:
        p = AlsaRawMidiPort("hw:9,0,0", "in")
        assert p.read() == []
        p.write([b"\x90\x3c\x64"])   # no-op, no raise
        p.close()                    # idempotent on a never-opened handle
    finally:
        alsa.set_alsa_lib_for_testing(None)


def test_split_midi_stream_drops_undefined_and_stray_bytes():
    # F4/F5 are undefined system-common statuses; a stray F7 (EOX without
    # SysEx) and data bytes with no open message must all be dropped
    msgs, tail = _split_midi_stream(b"\xf4\xf5\xf7\x40\x41\x90\x3c\x64")
    assert msgs == [b"\x90\x3c\x64"]
    assert tail == b""


def test_split_midi_stream_resets_runaway_sysex():
    # an unterminated SysEx longer than the 64-byte guard is abandoned;
    # the following channel message still parses
    raw = b"\xf0" + bytes(range(1, 70)) + b"\x80\x3c\x00"
    msgs, tail = _split_midi_stream(raw)
    assert msgs == [b"\x80\x3c\x00"]
    assert tail == b""


def test_registry_output_callbacks_and_policy_reload():
    r = DeviceRegistry()
    added, removed = [], []
    r.on_output_added = added.append
    r.on_output_removed = removed.append
    out = MidiPort("hw:out", zynthian_id="usb-x-out")
    r.add_output(out)
    assert added == [out]
    r.remove_output(out)
    assert removed == [out] and r.outputs == []

    # apply_port_policy re-evaluates input enablement after a config reload
    pad = MidiPort("hw:pads", zynthian_id="usb-pads-in")
    keys = MidiPort("hw:keys", zynthian_id="usb-keys-in")
    r.add_input(pad)
    r.add_input(keys)
    assert pad.enabled and keys.enabled
    r.disabled_in = ["usb-pads"]
    r.apply_port_policy()
    assert not pad.enabled and keys.enabled


def test_scanner_without_sound_stack(monkeypatch):
    from libzl_tpu.midi.devices import HardwareScanner

    monkeypatch.setattr(alsa, "_override", None)
    monkeypatch.setattr(alsa, "_real", None)
    monkeypatch.setattr(alsa, "_real_checked", True)
    s = HardwareScanner(DeviceRegistry())
    assert s.scan_hints() is None
    assert s.rescan() is False
