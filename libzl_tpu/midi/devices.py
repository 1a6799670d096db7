"""MIDI hardware device abstraction.

The reference discovers hardware through JACK port-registration callbacks,
aliases ports to human-readable names and zynthian ids, and applies per-device
input filtering/CC translations (lib/MidiRouter.cpp:607-757, 788-824; up to
MAX_INPUT_DEVICES inputs, :191). This build abstracts devices behind a small
interface with two backends:

- VirtualMidiPort: in-memory queues — deterministic tests, virtual wiring
  between applications, and the default in containers with no sound stack.
- ALSA rawmidi (gated): opened via ctypes against libasound when present.

Device identifiers keep the "<client> <port>" shape the reference builds its
aliases from, so translation suffix-matching (translations.py) behaves the
same way.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from collections import deque
from typing import Iterable, Optional

from ..constants import MAX_MIDI_INPUT_DEVICES
from .translations import translations_for_device


class MidiPort:
    """Base interface: a named, directional MIDI endpoint."""

    def __init__(self, name: str, human_name: str = "", zynthian_id: str = ""):
        self.name = name
        self.human_name = human_name or name
        self.zynthian_id = zynthian_id or name
        self.enabled = True

    def read(self) -> list[bytes]:
        raise NotImplementedError

    def write(self, events: Iterable[bytes]) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass


class VirtualMidiPort(MidiPort):
    def __init__(self, name: str, **kw):
        super().__init__(name, **kw)
        self._queue: deque[bytes] = deque()

    def feed(self, *events: bytes) -> None:
        """Test/host-side injection of incoming events."""
        self._queue.extend(bytes(e) for e in events)

    def read(self) -> list[bytes]:
        out = list(self._queue)
        self._queue.clear()
        return out

    def write(self, events: Iterable[bytes]) -> None:
        self._queue.extend(bytes(e) for e in events)

    @property
    def written(self) -> list[bytes]:
        return list(self._queue)


class AlsaRawMidiPort(MidiPort):
    """ALSA rawmidi endpoint via ctypes; available only where libasound
    exists (gated — containers without a sound stack use VirtualMidiPort)."""

    def __init__(self, device: str, direction: str = "in", **kw):
        super().__init__(device, **kw)
        lib = ctypes.util.find_library("asound")
        if lib is None:
            raise RuntimeError("libasound not available on this host")
        self._asound = ctypes.CDLL(lib)
        self._handle = ctypes.c_void_p()
        mode = 1  # SND_RAWMIDI_NONBLOCK
        if direction == "in":
            err = self._asound.snd_rawmidi_open(
                ctypes.byref(self._handle), None, device.encode(), mode
            )
        else:
            err = self._asound.snd_rawmidi_open(
                None, ctypes.byref(self._handle), device.encode(), mode
            )
        if err < 0:
            raise RuntimeError(f"snd_rawmidi_open({device}) failed: {err}")
        self._direction = direction

    def read(self) -> list[bytes]:
        buf = (ctypes.c_char * 256)()
        n = self._asound.snd_rawmidi_read(self._handle, buf, 256)
        if n <= 0:
            return []
        return _split_midi_stream(bytes(buf[:n]))

    def write(self, events: Iterable[bytes]) -> None:
        for e in events:
            self._asound.snd_rawmidi_write(self._handle, e, len(e))

    def close(self) -> None:
        if self._handle:
            self._asound.snd_rawmidi_close(self._handle)
            self._handle = None


def _split_midi_stream(raw: bytes) -> list[bytes]:
    """Split a raw byte stream into messages (running status not supported —
    hardware we target sends full messages, like JACK normalizes)."""
    out = []
    i = 0
    while i < len(raw):
        b = raw[i]
        if b >= 0xF8:          # realtime: single byte
            out.append(bytes([b]))
            i += 1
        elif b >= 0xF0:        # system common: variable, skip until next status
            j = i + 1
            while j < len(raw) and raw[j] < 0x80:
                j += 1
            out.append(raw[i:j])
            i = j
        elif b >= 0x80:
            size = 2 if (b & 0xF0) in (0xC0, 0xD0) else 3
            out.append(raw[i : i + size])
            i += size
        else:
            i += 1  # stray data byte
    return out


class InputDeviceEntry:
    """Per-input-device routing state (lib/MidiRouter.cpp:607-693): CC
    translation table + note-stickiness bookkeeping."""

    def __init__(self, port: MidiPort):
        self.port = port
        self.cc_translations = translations_for_device(port.human_name)
        self.note_activations = [0] * 128
        self.active_note_channel = [0] * 128


class DeviceRegistry:
    """Tracks hardware inputs/outputs and their enablement, mirroring the
    env-var driven policy (DISABLED_IN / ENABLED_OUT,
    lib/MidiRouter.cpp:990-1009)."""

    def __init__(self):
        self.inputs: list[InputDeviceEntry] = []
        self.outputs: list[MidiPort] = []
        self.disabled_in: list[str] = []
        self.enabled_out: list[str] = []
        self.enabled_fb: list[str] = []
        self.on_input_added = None
        self.on_input_removed = None

    def add_input(self, port: MidiPort) -> Optional[InputDeviceEntry]:
        if len(self.inputs) >= MAX_MIDI_INPUT_DEVICES:
            return None
        entry = InputDeviceEntry(port)
        port.enabled = not any(
            port.zynthian_id.startswith(d) or port.name.startswith(d)
            for d in self.disabled_in
            if d
        )
        self.inputs.append(entry)
        if self.on_input_added is not None:
            self.on_input_added(port)
        return entry

    def remove_input(self, port: MidiPort) -> None:
        self.inputs = [e for e in self.inputs if e.port is not port]
        if self.on_input_removed is not None:
            self.on_input_removed(port)

    def add_output(self, port: MidiPort) -> None:
        port.enabled = any(
            port.zynthian_id.startswith(d) or port.name.startswith(d)
            for d in self.enabled_out
            if d
        )
        self.outputs.append(port)

    def apply_port_policy(self) -> None:
        """Re-evaluate enablement after a configuration reload."""
        for entry in self.inputs:
            p = entry.port
            p.enabled = not any(
                p.zynthian_id.startswith(d) or p.name.startswith(d)
                for d in self.disabled_in
                if d
            )
        for p in self.outputs:
            p.enabled = any(
                p.zynthian_id.startswith(d) or p.name.startswith(d)
                for d in self.enabled_out
                if d
            )
