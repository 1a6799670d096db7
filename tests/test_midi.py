"""MIDI router / transport / sampler-mapping tests."""

import numpy as np
import pytest

from libzl_tpu.engine.engine import AudioEngine
from libzl_tpu.io.wav import AudioData
from libzl_tpu.midi import messages as mm
from libzl_tpu.midi.devices import VirtualMidiPort
from libzl_tpu.midi.router import Destination, MidiRouter
from libzl_tpu.midi.translations import apply_cc_translation, translations_for_device
from libzl_tpu.models.clip import ClipAudioSource

SR = 48000


def test_internal_routing_destinations():
    r = MidiRouter()
    r.set_channel_destination(0, Destination.ZYNTHIAN, zynthian_channels=[3, 4])
    r.set_channel_destination(1, Destination.EXTERNAL, external_channel=9)
    r.set_channel_destination(2, Destination.SAMPLER)
    r.set_channel_destination(3, Destination.NONE)
    r.begin_block()
    r.route_internal([
        (0, mm.note_on(60, 100, ch=0)),
        (5, mm.note_on(61, 100, ch=1)),
        (7, mm.note_on(62, 100, ch=2)),
        (9, mm.note_on(63, 100, ch=3)),
    ])
    # zynthian fan-out to channels 3 and 4
    assert (0, mm.note_on(60, 100, ch=3)) in r.zynthian_out
    assert (0, mm.note_on(60, 100, ch=4)) in r.zynthian_out
    # external remap to channel 9
    assert (5, mm.note_on(61, 100, ch=9)) in r.external_out
    # sampler + zynthian + external all hit passthrough; NONE does not
    pass_chans = [mm.channel(d) for _, d in r.passthrough_out]
    assert sorted(pass_chans) == [0, 1, 2]


def test_hardware_note_stickiness():
    r = MidiRouter()
    for c in range(16):
        r.set_channel_destination(c, Destination.SAMPLER)
    port = VirtualMidiPort("input-test")
    entry = r.registry.add_input(port)
    r.current_channel = 5
    r.begin_block()
    port.feed(mm.note_on(60, 100, ch=0))
    r.route_hardware()
    assert r.passthrough_out[-1][1] == mm.note_on(60, 100, ch=5)
    # channel switch mid-note: the off must follow the on's channel
    r.current_channel = 8
    port.feed(mm.note_off(60, ch=0), mm.note_on(61, 90, ch=0))
    r.route_hardware()
    offs = [d for _, d in r.passthrough_out if mm.is_note_off(d)]
    ons = [d for _, d in r.passthrough_out if mm.is_note_on(d)]
    assert offs[-1] == mm.note_off(60, ch=5)     # sticky
    assert ons[-1] == mm.note_on(61, 90, ch=8)   # new note on new channel


def test_device_cc_translations():
    table = translations_for_device("PreSonus ATM SQ ATM SQ")
    assert apply_cc_translation(table, mm.cc(85, 127)) == bytes([0xFC])
    assert apply_cc_translation(table, mm.cc(86, 127)) == bytes([0xFA])
    assert apply_cc_translation(table, mm.cc(7, 100)) == mm.cc(7, 100)
    assert translations_for_device("Some Other Device") == {}


def test_env_config_reload(monkeypatch):
    monkeypatch.setenv(
        "ZYNTHIAN_MIDI_PORTS",
        "DISABLED_IN=input-bad\\nENABLED_OUT=out-good\\nENABLED_FB=",
    )
    monkeypatch.setenv("ZYNTHIAN_MIDI_FILTER_OUTPUT", "1")
    r = MidiRouter()
    assert r.filter_midi_out is True
    bad = VirtualMidiPort("input-bad")
    good_in = VirtualMidiPort("input-good")
    out_good = VirtualMidiPort("out-good")
    out_other = VirtualMidiPort("out-other")
    r.registry.add_input(bad)
    r.registry.add_input(good_in)
    r.registry.add_output(out_good)
    r.registry.add_output(out_other)
    assert not bad.enabled and good_in.enabled
    assert out_good.enabled and not out_other.enabled


def test_external_flush_to_enabled_outputs(monkeypatch):
    monkeypatch.setenv(
        "ZYNTHIAN_MIDI_PORTS", "DISABLED_IN=\\nENABLED_OUT=hw-out\\nENABLED_FB="
    )
    r = MidiRouter()
    r.set_channel_destination(0, Destination.EXTERNAL)
    hw = VirtualMidiPort("hw-out")
    r.registry.add_output(hw)
    r.begin_block()
    r.route_internal([(0, mm.note_on(64, 80, ch=0))])
    r.flush_external()
    assert hw.written == [mm.note_on(64, 80, ch=0)]


def test_transport_via_hardware_start_stop():
    engine = AudioEngine(sample_rate=SR, backend="numpy", num_voices=8)
    port = VirtualMidiPort("pads")
    engine.router.registry.add_input(port)
    assert not engine.transport_running
    port.feed(bytes([0xFA]))
    engine.process_block()  # routes + schedules the command
    engine.process_block()  # consumes it
    assert engine.transport_running
    port.feed(bytes([0xFC]))
    engine.process_block()
    engine.process_block()
    assert not engine.transport_running


def test_atom_sq_transport_buttons_control_engine():
    engine = AudioEngine(sample_rate=SR, backend="numpy", num_voices=8)
    port = VirtualMidiPort("pads", human_name="PreSonus ATM SQ ATM SQ")
    engine.router.registry.add_input(port)
    port.feed(mm.cc(86, 127))  # translated to MIDI start
    engine.process_block()
    engine.process_block()
    assert engine.transport_running


def test_midi_tick_cadence():
    engine = AudioEngine(sample_rate=SR, backend="numpy", num_voices=8)
    ticks = 0
    blocks = 400  # ~1.07 s
    for _ in range(blocks):
        res = engine.process_block()
        ticks += sum(1 for _, d in res.midi_out if d == bytes([0xF9]))
    seconds = blocks * 128 / SR
    assert ticks == pytest.approx(seconds / 0.010, abs=2)


def test_note_to_sampler_keyzone_end_to_end():
    engine = AudioEngine(sample_rate=SR, backend="numpy", num_voices=8)
    t = np.arange(SR // 2) / SR
    samples = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[:, None]
    clip = ClipAudioSource(engine, audio=AudioData(samples, SR))
    clip.keyzone_start, clip.keyzone_end = 60, 72
    engine.router.set_channel_destination(3, Destination.SAMPLER)
    engine.sampler_map.assign(3, clip)
    pads = VirtualMidiPort("pads")
    engine.router.registry.add_input(pads)
    engine.router.current_channel = 3

    # in-zone note triggers a voice at velocity-scaled gain
    pads.feed(mm.note_on(67, 127, ch=0))
    res = engine.process_block()
    assert engine.pool.active.sum() == 1
    v = engine.pool.active.argmax()
    assert engine.pool.midi_note[v] == 67
    assert np.abs(np.asarray(res.outputs.master)).max() > 0.01

    # note-off releases it
    pads.feed(mm.note_off(67, ch=0))
    for _ in range(80):
        engine.process_block()
    assert engine.pool.active.sum() == 0

    # out-of-zone note does nothing
    pads.feed(mm.note_on(40, 127, ch=0))
    engine.process_block()
    assert engine.pool.active.sum() == 0


def test_restart_transport():
    engine = AudioEngine(sample_rate=SR, backend="numpy", num_voices=8)
    engine.start_transport(bpm=120)
    for _ in range(20):
        engine.process_block()
    assert engine.clock.tick_position > 0
    engine.transport.restart_transport()  # stop + start (TransportManager.cpp:196-200)
    engine.process_block()
    engine.process_block()
    assert engine.transport_running
    assert engine.clock.tick_position < 5  # position reset by the stop


def test_event_watchdog():
    from libzl_tpu.utils.profiling import EventWatchdog

    wd = EventWatchdog()
    wd.on_scheduled(3)
    wd.on_delivered(3)
    assert wd.check() and wd.mismatches == 0
    wd.on_scheduled(1)
    assert not wd.check() and wd.mismatches == 1


def test_schedule_note_reaches_sampler_with_duration():
    """SyncTimer::scheduleNote flow: scheduled MIDI -> router (SAMPLER
    destination) -> keyzone mapper -> voice, with the automatic off landing
    `duration` ticks later."""
    engine = AudioEngine(sample_rate=SR, backend="numpy", num_voices=8)
    t = np.arange(SR) / SR
    clip = ClipAudioSource(
        engine,
        audio=AudioData(
            (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[:, None], SR
        ),
    )
    clip.adsr_release = 0.0  # hard cut on the off
    engine.router.set_channel_destination(5, Destination.SAMPLER)
    engine.sampler_map.assign(5, clip)

    # one beat of sound: on at tick 2, off at tick 2+96
    engine.schedule_note(64, 5, set_on=True, velocity=100, duration=96, delay=2)
    total = 0
    on_seen = off_seen = None
    for b in range(400):
        res = engine.process_block()
        active = engine.pool.active.sum()
        if on_seen is None and active:
            on_seen = b
        if on_seen is not None and off_seen is None and not active:
            off_seen = b
    assert on_seen is not None and off_seen is not None
    # 96 ticks at 120bpm = 24000 samples = 187.5 blocks
    assert 180 <= (off_seen - on_seen) <= 195


def test_double_stop_keeps_flushed_note_offs():
    """Regression (r2 review): two stops between blocks must not discard
    the first flush's undelivered note-offs (stuck external notes)."""
    engine = AudioEngine(sample_rate=SR, backend="numpy", num_voices=8)
    engine.start_transport(bpm=120)
    # schedule a note-off in the future; stop flushes it immediately
    engine.schedule_note(64, 2, set_on=False, delay=200)
    engine.stop_transport()
    engine.stop_transport()  # second stop: empty flush must extend, not clear
    res = engine.process_block()
    offs = [d for _, d in res.midi_out if d and (d[0] & 0xF0) == 0x80]
    assert offs, "flushed note-off was lost by the double stop"


def test_velocity_zero_note_on_stickiness_matches_reference():
    """The reference counts activations by STATUS byte (0x9x increments
    even at velocity 0, lib/MidiRouter.cpp:513-518), so a v=0 note-on must
    NOT reset stickiness — later note-ons keep the original channel."""
    r = MidiRouter()
    port = VirtualMidiPort("pad")
    entry = r.registry.add_input(port)
    r.current_channel = 5
    port.feed(bytes([0x90, 60, 100]))
    r.route_hardware()
    r.current_channel = 7
    port.feed(bytes([0x90, 60, 0]))      # v=0 "off" in disguise
    r.route_hardware()
    port.feed(bytes([0x90, 60, 100]))    # activation 3 != 1
    r.route_hardware()
    # all three events rode channel 5 (the first activation's target)
    notes = [d for _, d in r.passthrough_out if 0x80 <= d[0] < 0xA0]
    assert notes, "no notes routed"
    assert all((d[0] & 0x0F) == 5 for d in notes), notes


def test_redundant_transport_stop_is_ignored():
    """Reference guard (lib/TransportManager.cpp:71-86): MIDI Stop while
    already stopped must be ignored — it would otherwise flush the step
    ring and destroy queued next-bar clip starts."""
    from libzl_tpu.engine.engine import AudioEngine

    engine = AudioEngine(sample_rate=48000, backend="numpy", num_voices=8)
    port = VirtualMidiPort("sync")
    engine.router.registry.add_input(port)
    # transport stopped; a redundant 0xFC arrives
    port.feed(bytes([0xFC]))
    engine.process_block()
    assert not engine.transport_running
    # start via 0xFA works (the scheduled command fires at the next DUE
    # tick — ~every other block at 128 frames); a second 0xFA while
    # running is ignored
    port.feed(bytes([0xFA]))
    for _ in range(6):
        engine.process_block()
        if engine.transport_running:
            break
    assert engine.transport_running
    tick_before = engine.clock.tick_position
    port.feed(bytes([0xFA]))
    engine.process_block()
    assert engine.transport_running
    assert engine.clock.tick_position >= tick_before
    # a real stop still works
    port.feed(bytes([0xFC]))
    for _ in range(6):
        engine.process_block()
        if not engine.transport_running:
            break
    assert not engine.transport_running


def test_message_helper_edges():
    """messages.py branch coverage: system-byte status, vel-0 note-off
    equivalence, CC detection, with_channel passthrough for non-channel
    messages (lib/MidiRouter.cpp:523-526 arithmetic only applies to
    channel-voice messages)."""
    # status(): channel-voice masks the low nibble; system bytes pass whole
    assert mm.status(bytes([0x93, 60, 100])) == mm.NOTE_ON
    assert mm.status(bytes([0xFA])) == 0xFA
    assert mm.status(b"") == 0

    # vel-0 note-on IS a note-off (running-status convention)
    assert mm.is_note_off(bytes([0x80, 60, 0]))
    assert mm.is_note_off(bytes([0x90, 60, 0]))
    assert not mm.is_note_off(bytes([0x90, 60, 1]))
    assert not mm.is_note_off(b"")

    assert mm.is_cc(bytes([0xB5, 85, 127]))
    assert not mm.is_cc(bytes([0x90, 60, 100]))

    # retarget keeps status + payload; non-channel messages pass unchanged
    assert mm.with_channel(bytes([0x90, 60, 100]), 5) == bytes([0x95, 60, 100])
    assert mm.with_channel(bytes([0xFA]), 5) == bytes([0xFA])
    assert mm.with_channel(b"", 3) == b""


def test_env_config_malformed_values(monkeypatch):
    """reloadConfiguration parse edges (lib/MidiRouter.cpp:984-1009):
    QString::toInt yields 0 for non-numeric filter values, and options
    without exactly one '=' are skipped without clearing prior policy."""
    monkeypatch.setenv("ZYNTHIAN_MIDI_FILTER_OUTPUT", "true")
    monkeypatch.setenv(
        "ZYNTHIAN_MIDI_PORTS",
        "garbage-no-equals\\nA=B=C\\nENABLED_OUT=hw-out\\nENABLED_FB=",
    )
    r = MidiRouter()
    assert r.filter_midi_out is False
    # the well-formed option still applied
    hw = VirtualMidiPort("hw-out")
    other = VirtualMidiPort("hw-other")
    r.registry.add_output(hw)
    r.registry.add_output(other)
    assert hw.enabled and not other.enabled


def test_set_zynthian_channels_keeps_destination():
    """setZynthianChannels (lib/MidiRouter.h:77) replaces only the fan-out
    list; the channel's destination is untouched."""
    r = MidiRouter()
    r.set_channel_destination(2, Destination.ZYNTHIAN, zynthian_channels=[2])
    r.set_zynthian_channels(2, [7, 9])
    assert r.outputs[2].destination == Destination.ZYNTHIAN
    assert r.outputs[2].zynthian_channels[:3] == [7, 9, -1]
    r.begin_block()
    r.route_internal([(0, mm.note_on(60, 100, ch=2))])
    fanned = sorted(mm.channel(d) for _, d in r.zynthian_out)
    assert fanned == [7, 9]


def test_note_listeners_fire_per_terminal():
    """noteChanged listener analog (lib/MidiRouter.cpp:100-130): internal
    ZYNTHIAN notes emit on the passthrough and internal sources; empty
    events are skipped before the watchdog counts them."""
    r = MidiRouter()
    seen = []
    r.note_listeners.append(lambda src, off, data: seen.append((src, off, data)))
    r.begin_block()
    on = mm.note_on(60, 100, ch=0)
    r.route_internal([(3, b""), (3, on)])
    assert r.in_count == 1 and r.accounted_count == 1
    assert ("passthrough", 3, on) in seen and ("internal", 3, on) in seen


def test_internal_system_and_sysex_routing():
    """Non-channel internal events (lib/MidiRouter.cpp:443-452): sysex is
    swallowed-but-accounted; system bytes go external; realtime bytes the
    transport already consumed (0xF8/0xFA/...) are NOT fed back to the
    passthrough, but song-position-ish bytes are."""
    r = MidiRouter()
    r.begin_block()
    sysex = bytes([0xF0, 0x7E, 0xF7])
    clock = bytes([0xF8])
    song_select = bytes([0xF3, 4])
    r.route_internal([(0, sysex), (1, clock), (2, song_select)])
    assert r.in_count == 3 and r.accounted_count == 3
    assert (0, sysex) not in r.external_out
    assert (1, clock) in r.external_out
    assert (2, song_select) in r.external_out
    pass_data = [d for _, d in r.passthrough_out]
    assert clock not in pass_data and song_select in pass_data


def test_hardware_external_destination_remap():
    """Hardware input on an EXTERNAL-destination channel (the routing
    switch, lib/MidiRouter.cpp:530-566): the note retargets to
    current_channel by stickiness, then remaps to the channel's
    external_channel on the external sink; listeners see passthrough,
    external and hardware sources."""
    r = MidiRouter()
    r.current_channel = 4
    r.set_channel_destination(4, Destination.EXTERNAL, external_channel=11)
    port = VirtualMidiPort("input-pads")
    disabled = VirtualMidiPort("input-off")
    r.registry.add_input(port)
    dis_entry = r.registry.add_input(disabled)
    dis_entry.port.enabled = False
    seen = []
    r.note_listeners.append(lambda src, off, data: seen.append(src))
    r.begin_block()
    port.feed(mm.note_on(62, 90, ch=0))
    disabled.feed(mm.note_on(63, 90, ch=0))  # must never route
    r.route_hardware()
    assert (0, mm.note_on(62, 90, ch=11)) in r.external_out
    assert (0, mm.note_on(62, 90, ch=4)) in r.passthrough_out
    assert {"passthrough", "external", "hardware"} <= set(seen)
    # the disabled port's event was not drained into the fabric
    assert r.in_count == 1 and r.accounted_count == 1
