"""Native host core vs numpy voice machine: bitwise equivalence."""

import copy

import numpy as np
import pytest

from libzl_tpu.engine import hostcore
from libzl_tpu.engine.voicestate import VoicePool
from libzl_tpu.ops.voice import pack_program

SR = 48000.0
B = 128

pytestmark = pytest.mark.skipif(
    not hostcore.available(), reason="native host core unavailable"
)


def make_pool(seed=0, V=64, block=B, short_bq=False):
    pool = VoicePool(V, block, SR)
    rng = np.random.default_rng(seed)
    for v in range(V - 8):  # leave some idle
        looping = bool(rng.integers(0, 2))
        pool.note_on(
            v,
            clip_id=int(rng.integers(0, 8)),
            midi_note=int(rng.integers(40, 85)),
            midi_channel=int(rng.integers(-2, 10)),
            lane=int(rng.integers(0, 12)),
            base=int(rng.integers(0, 4)) * 512,
            length=int(rng.integers(2000, 40000)),
            source_rate=float(rng.choice([44100.0, 48000.0])),
            root_note=60,
            start_sec=float(rng.uniform(0, 0.01)),
            stop_sec=float(rng.uniform(0.05, 0.8)),
            gain=float(rng.uniform(0, 1)),
            clip_volume=float(rng.uniform(0, 1)),
            pan=float(rng.uniform(-1, 1)),
            attack=float(rng.choice([0.0, 0.003, 0.05])),
            decay=float(rng.choice([0.0, 0.05, 0.2])),
            sustain=float(rng.uniform(0.1, 1.0)),
            release=float(rng.choice([0.0, 0.02, 0.05])),
            looping=looping,
            length_beats=float(rng.choice([1.0, 2.0, 0.75, 1.3])),
            start_tick=int(rng.integers(0, 96)),
        )
        if short_bq and v % 3 == 0:
            # 1-3-tick beat-quantized loops: multiple wall-clock wraps per
            # superblock, exercising the bq_reset extra columns
            pool.looping[v] = True
            pool.beat_quantized[v] = True
            pool.loop_len_ticks[v] = int(rng.integers(1, 4))
            pool.next_loop_tick[v] = int(pool.loop_len_ticks[v])
    return pool


STATE_ARRAYS = [
    "active", "clip_id", "pos_int", "pos_frac", "rate_int", "rate_frac",
    "istart", "stop", "looping", "beat_quantized", "loop_len_ticks",
    "next_loop_tick", "gain", "clip_volume", "pan", "lane", "stage", "env",
    "a_rate", "d_rate", "sustain", "rel_rate", "inv_rel", "rel_log2",
    "rel_mode", "release_sec", "pending_start", "pending_release",
    "position_id",
]


def run_both(seed, blocks=40, release_at=None, lane_disabled=None,
             block=B, short_bq=False, spt=250.0):
    pool_np = make_pool(seed, block=block, short_bq=short_bq)
    pool_c = copy.deepcopy(pool_np)
    lane_enabled = np.ones(12, bool)
    if lane_disabled is not None:
        lane_enabled[lane_disabled] = False
    for b in range(blocks):
        if release_at is not None and b == release_at:
            for v in range(0, 8):
                pool_np.note_off(v, tail=True, frame_offset=13)
                pool_c.note_off(v, tail=True, frame_offset=13)
        args = dict(
            block_start_sample=float(b * block),
            tick_anchor_sample=0.0,
            tick_anchor=0,
            samples_per_tick=spt,
        )
        prog = pool_np.build_program(lane_enabled=lane_enabled, **args)
        pi_np, pf_np = pack_program(prog)
        adv = pool_np.advance(prog)
        for v, cid, pid in zip(adv["died"], adv["died_clips"],
                               adv["died_positions"]):
            pass  # numpy advance already killed

        pi_c, pf_c, died_c = hostcore.voice_update(
            pool_c, lane_enabled=lane_enabled, **args
        )

        act = np.asarray(prog.active, bool)
        np.testing.assert_array_equal(pi_c[act], pi_np[act],
                                      err_msg=f"ints, block {b}")
        # exp2 may differ by an ulp between libm and numpy; everything else
        # must be bit-identical
        np.testing.assert_allclose(pf_c[act], pf_np[act], rtol=1e-6, atol=0,
                                   err_msg=f"floats, block {b}")
        np.testing.assert_array_equal(pi_c[:, 0], np.asarray(prog.active,
                                                             np.int32))
        assert sorted(v for v, _, _ in died_c) == sorted(adv["died"].tolist())
        for name in STATE_ARRAYS:
            a_np = getattr(pool_np, name)
            a_c = getattr(pool_c, name)
            if a_np.dtype == np.float32 and name in ("env", "rel_rate"):
                np.testing.assert_allclose(
                    a_c, a_np, rtol=1e-5, atol=1e-9,
                    err_msg=f"state {name}, block {b}")
            else:
                np.testing.assert_array_equal(
                    a_c, a_np, err_msg=f"state {name}, block {b}")


def test_equivalence_mixed_session():
    run_both(seed=1)


def test_equivalence_with_releases():
    run_both(seed=2, release_at=5, blocks=60)


def test_equivalence_with_disabled_lane():
    run_both(seed=3, lane_disabled=4)


def test_equivalence_short_bq_superblock():
    """B=1024 with 1-3-tick beat-quantized loops: the bq_reset extra
    columns and the rebased advance must be bit-identical between the
    native core and the numpy voice machine."""
    run_both(seed=5, blocks=30, block=1024, short_bq=True)


def test_equivalence_short_bq_odd_bpm():
    """Same, at a non-integer samples-per-tick (137.77 bpm)."""
    run_both(seed=6, blocks=30, block=1024, short_bq=True,
             spt=SR * 60.0 / (137.77 * 96.0))


def test_native_speedup():
    import time

    pool = make_pool(seed=4, V=1024)
    lane_enabled = np.ones(12, bool)
    args = dict(block_start_sample=0.0, tick_anchor_sample=0.0,
                tick_anchor=0, samples_per_tick=250.0)
    # numpy path
    t0 = time.perf_counter()
    for _ in range(20):
        prog = pool.build_program(lane_enabled=lane_enabled, **args)
        pack_program(prog)
        pool.advance(prog)
    t_np = (time.perf_counter() - t0) / 20
    pool2 = make_pool(seed=4, V=1024)
    t0 = time.perf_counter()
    for _ in range(20):
        hostcore.voice_update(pool2, lane_enabled=lane_enabled, **args)
    t_c = (time.perf_counter() - t0) / 20
    print(f"numpy {t_np*1e3:.3f} ms vs native {t_c*1e3:.3f} ms")
    assert t_c < t_np


def test_load_degrades_when_native_loader_fails(monkeypatch):
    import libzl_tpu._native as native_mod

    monkeypatch.setattr(hostcore, "_lib", None)
    monkeypatch.setattr(native_mod, "load_native", lambda *a, **k: None)
    assert hostcore.load() is None
    assert hostcore.available() is False


def test_non_contiguous_pool_array_fails_loud():
    """The native core reads pool arrays through raw pointers; a strided
    view would be silently misread — refuse instead."""
    pool = VoicePool(8, 128, 48000.0)
    pool.pos_int = pool.pos_int[::-1]  # non-contiguous view
    with pytest.raises(RuntimeError, match="must be contiguous"):
        hostcore.voice_update(
            pool, block_start_sample=0.0, tick_anchor_sample=0.0,
            tick_anchor=0, samples_per_tick=250.0,
            lane_enabled=np.ones(12, np.int32),
        )


# ---------------------------------------------------------------- horizon

def run_horizon_both(seed, H=8, block=B, short_bq=False, spt=250.0,
                     release_before=False, start0=0.0):
    """Native one-call horizon sim vs the per-slice reference chain
    (voice_update per slice + ops/voice.pack_horizon_dynamics +
    pool.save_state per slice) — bit-identical outputs and end state.
    The per-slice native path is itself pinned to the numpy voice machine
    by run_both above, so this transitively pins the one-call sim to the
    reference implementation."""
    from libzl_tpu.ops.voice import pack_horizon_dynamics

    pool_ref = make_pool(seed, block=block, short_bq=short_bq)
    pool_h = copy.deepcopy(pool_ref)
    lane = np.ones(12, bool)
    if release_before:
        for v in range(0, 6):
            pool_ref.note_off(v, tail=True, frame_offset=17)
            pool_h.note_off(v, tail=True, frame_offset=17)
    anchor = dict(tick_anchor_sample=0.0, tick_anchor=0,
                  samples_per_tick=spt)

    packed, snaps_ref, died_ref = [], [], []
    for h in range(H):
        pi, pf, died_info = hostcore.voice_update(
            pool_ref, block_start_sample=start0 + float(h * block),
            lane_enabled=lane, **anchor)
        packed.append((pi, pf))
        snaps_ref.append(pool_ref.save_state())
        died_ref.append([(c, p) for _, c, p in died_info])
    dyn_ref = pack_horizon_dynamics(packed[1:], pool_ref.istart)

    res = hostcore.horizon_update(
        pool_h, slices=H, block_start_sample=start0, lane_enabled=lane,
        **anchor)
    if dyn_ref is None:
        assert res is None
        return
    assert res is not None
    pi0, pf0, dyn, snaps, died_lists = res
    np.testing.assert_array_equal(pi0, packed[0][0], err_msg="prog_i0")
    np.testing.assert_array_equal(pf0, packed[0][1], err_msg="prog_f0")
    np.testing.assert_array_equal(dyn, dyn_ref, err_msg="dynamics")
    assert died_lists == died_ref
    for h in range(H):
        assert set(snaps[h]) == set(snaps_ref[h])
        for name, a_ref in snaps_ref[h].items():
            np.testing.assert_array_equal(
                snaps[h][name], a_ref, err_msg=f"snap {name}, slice {h}")
    for name in STATE_ARRAYS:
        np.testing.assert_array_equal(
            getattr(pool_h, name), getattr(pool_ref, name),
            err_msg=f"end state {name}")


def test_horizon_equivalence_mixed_session():
    run_horizon_both(seed=11, H=16)


def test_horizon_equivalence_with_releases():
    """Slice-0 releases fix linear release rates at the trigger and kill
    voices mid-horizon — deaths, snapshots and dyn flags must match."""
    run_horizon_both(seed=12, H=16, release_before=True)


def test_horizon_equivalence_short_bq_superblock():
    """B=512 with 1-3-tick bq loops: the bq_reset extra columns ride the
    compact dynamics' 16-bit pair packing (W=2 at this geometry)."""
    run_horizon_both(seed=13, H=4, block=512, short_bq=True)


def test_horizon_equivalence_odd_bpm_offset_start():
    run_horizon_both(seed=14, H=8, spt=SR * 60.0 / (137.77 * 96.0),
                     start0=12800.0)


def test_horizon_snapshots_restore_compatible():
    """snaps[h] views must drive VoicePool.restore_state like the dict
    copies save_state returns (the engine restores per emitted slice)."""
    pool = make_pool(seed=15)
    lane = np.ones(12, bool)
    res = hostcore.horizon_update(
        pool, slices=4, block_start_sample=0.0, tick_anchor_sample=0.0,
        tick_anchor=0, samples_per_tick=250.0, lane_enabled=lane)
    assert res is not None
    _, _, _, snaps, _ = res
    pool.restore_state(snaps[1])
    np.testing.assert_array_equal(pool.pos_int, snaps[1]["pos_int"])
    pool.restore_state(snaps[3])
    np.testing.assert_array_equal(pool.env, snaps[3]["env"])
