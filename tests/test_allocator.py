"""VoiceAllocator unit tests: SamplerChannel::handleCommand semantics
(lib/SamplerSynth.cpp:187-230) — first-idle claim, per-lane polyphony cap,
stop-all-matching, equivalentTo identity (note vs slice), live-update
merge (lib/SamplerSynthVoice.cpp:58-98)."""

import numpy as np

from libzl_tpu.engine.allocator import VoiceAllocator
from libzl_tpu.engine.commands import ClipCommand
from libzl_tpu.engine.voicestate import VoicePool

SR = 48000.0


class _Slot:
    base = 0
    length = 9000
    sample_rate = SR


class _Positions:
    def __init__(self):
        self.created = []

    def create_position(self, pid):
        self.created.append(pid)

    def remove_position(self, pid):
        pass


class _FakeClip:
    """Minimal stand-in for ClipAudioSource (unit-level: no engine)."""

    def __init__(self, clip_id=7):
        self.id = clip_id
        self.slot = _Slot()
        self.root_note = 60
        self.volume_absolute = 1.0
        self.pan = 0.0
        self.adsr_attack = 0.0
        self.adsr_decay = 0.0
        self.adsr_sustain = 1.0
        self.adsr_release = 0.05
        self.length_beats = 1.0
        self.positions_model = _Positions()

    def get_start_position(self, slice_idx=-1):
        return 0.0 if slice_idx < 0 else 0.01 * (slice_idx + 1)

    def get_stop_position(self, slice_idx=-1):
        return 0.18 if slice_idx < 0 else 0.01 * (slice_idx + 1) + 0.005


def _start_cmd(clip, note=60, channel=0, **kw):
    cmd = ClipCommand.channel(clip.id, channel)
    cmd.midi_note = note
    cmd.start_playback = True
    for k, v in kw.items():
        setattr(cmd, k, v)
    return cmd


def _make(voices_per_lane=None):
    pool = VoicePool(16, 128, SR)
    return pool, VoiceAllocator(pool, voices_per_lane), _FakeClip()


def test_first_idle_claim_and_reuse():
    pool, alloc, clip = _make()
    for i in range(3):
        alloc.handle(_start_cmd(clip, note=60 + i), clip, 0)
    assert list(np.flatnonzero(pool.active)) == [0, 1, 2]
    # free the lowest, next start reuses it (first-idle, not next-free)
    pool.kill(0)
    alloc.handle(_start_cmd(clip, note=70), clip, 0)
    assert pool.active[0] and int(pool.midi_note[0]) == 70


def test_voices_per_lane_cap_drops_excess():
    pool, alloc, clip = _make(voices_per_lane=2)
    for i in range(4):
        alloc.handle(_start_cmd(clip, note=50 + i, channel=3), clip, 0)
    # only 2 claimed on channel 3's lane; other lanes unaffected
    assert int(pool.active.sum()) == 2
    alloc.handle(_start_cmd(clip, note=50, channel=4), clip, 0)
    assert int(pool.active.sum()) == 3


def test_stop_all_matching_by_note_identity():
    pool, alloc, clip = _make()
    alloc.handle(_start_cmd(clip, note=60), clip, 0)
    alloc.handle(_start_cmd(clip, note=60), clip, 0)   # same identity, 2nd voice
    alloc.handle(_start_cmd(clip, note=64), clip, 0)
    stop = ClipCommand.channel(clip.id, 0)
    stop.midi_note = 60
    stop.stop_playback = True
    alloc.handle(stop, clip, 0)
    # both note-60 voices released (pending release), note-64 untouched
    rel = pool.pending_release < 2**30
    assert bool(rel[0]) and bool(rel[1]) and not bool(rel[2])


def test_slice_identity_is_separate_from_note():
    pool, alloc, clip = _make()
    sliced = _start_cmd(clip, note=60)
    sliced.change_slice = True
    sliced.slice = 2
    alloc.handle(sliced, clip, 0)
    alloc.handle(_start_cmd(clip, note=60), clip, 0)  # non-slice voice
    stop = ClipCommand.channel(clip.id, 0)
    stop.midi_note = 60
    stop.stop_playback = True
    alloc.handle(stop, clip, 0)                        # matches non-slice only
    rel = pool.pending_release < 2**30
    assert not bool(rel[0]) and bool(rel[1])


def test_live_update_merge():
    pool, alloc, clip = _make()
    alloc.handle(_start_cmd(clip, note=60, change_volume=True, volume=0.5),
                 clip, 0)
    assert pool.gain[0] == np.float32(0.5)
    upd = ClipCommand.channel(clip.id, 0)
    upd.midi_note = 60
    upd.change_volume = True
    upd.volume = 0.9
    upd.change_looping = True
    upd.looping = True
    alloc.handle(upd, clip, 0)
    assert int(pool.active.sum()) == 1  # updated, not re-claimed
    assert pool.gain[0] == np.float32(0.9)
    assert bool(pool.looping[0])


def test_update_slice_refreshes_live_loop_points():
    """The reference re-reads start/stopPosition(slice) each block
    (lib/SamplerSynthVoice.cpp:190-191): after the clip's slice table
    moves, an update addressed to the voice's slice refreshes the live
    loop points."""
    pool, alloc, clip = _make()
    cmd = _start_cmd(clip, note=60)
    cmd.change_slice = True
    cmd.slice = 1
    alloc.handle(cmd, clip, 0)
    assert int(pool.istart[0]) == int(clip.get_start_position(1) * SR)
    # the clip's slice table moves (UI drag)
    clip.get_start_position = lambda s=-1: 0.05 * (s + 1)
    clip.get_stop_position = lambda s=-1: 0.05 * (s + 1) + 0.004
    upd = ClipCommand.channel(clip.id, 0)
    upd.change_slice = True
    upd.slice = 1
    alloc.handle(upd, clip, 0)
    assert int(pool.istart[0]) == int(0.05 * 2 * SR)
    assert int(pool.stop[0]) == int((0.05 * 2 + 0.004) * SR)
