"""Round-5 TPU probe #1: one-call native horizon sim vs the round-4
per-slice loop, ONE process (VERDICT r4 #2).

Round 4 left the quiet live path paying ~3.5 ms of host time per horizon:
16 separate Python->ctypes `voice_update` sims plus the numpy
`pack_horizon_dynamics` pass (engine/engine.py round-4 _sim_horizon_bundle
loop). HEAD moves the WHOLE H-block sim into one `hostcore.horizon_update`
call (programs, dynamics matrix, per-slice snapshots and death lists
emitted natively). Cells, interleaved per round:

  eng_ms_blk     engine chained quiet ms/block at HEAD (end-to-end; the
                 VERDICT r4 #2 target is p50 <= 0.9 ms at V=1024/B=128)
  host_native    _start_horizon host half at HEAD (one native call;
                 render stubbed)
  host_loop      the round-4 design reconstructed: 16x voice_update +
                 per-slice save_state + numpy pack_horizon_dynamics
                 (render not involved)

    nohup python tools/tpu_probe1_r5.py > /tmp/tpu_probe1_r5.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V = int(os.environ.get("LIBZL_PROBE_V", "1024") or 1024)
B = 128
H = 16
ROUNDS = int(os.environ.get("LIBZL_PROBE_ROUNDS", "6") or 6)
REPS = 8
CHAIN_BLOCKS = int(os.environ.get("LIBZL_PROBE_CHAIN", "128") or 128)


def fence():
    import jax
    import jax.numpy as jnp

    x = jax.jit(lambda a: a + 1)(jnp.ones(8))
    t0 = time.perf_counter()
    np.asarray(x)
    print(f"fence {time.perf_counter() - t0:.1f}s", flush=True)


def _host_loop_once(eng):
    """The round-4 host half: per-slice native sims + numpy dynamics pack
    (reconstructed here for the A/B; the engine no longer has this path)."""
    from libzl_tpu.engine import hostcore
    from libzl_tpu.ops import voice as voice_ops

    snap_pre = eng.pool.save_state()
    start0 = float(eng.clock.sample_position)
    lane = eng.lane_enabled.copy()
    packed, snaps, dieds = [], [], []
    for h in range(H):
        pi, pf, died_info = hostcore.voice_update(
            eng.pool, block_start_sample=start0 + h * B,
            tick_anchor_sample=eng.clock.anchor_sample,
            tick_anchor=eng.clock.anchor_tick,
            samples_per_tick=eng.clock.samples_per_tick,
            lane_enabled=lane,
        )
        packed.append((pi, pf))
        snaps.append(eng.pool.save_state())
        dieds.append(died_info)
    dyn = voice_ops.pack_horizon_dynamics(packed[1:], eng.pool.istart)
    base = voice_ops.fuse_packed(*packed[0])
    eng.pool.restore_state(snap_pre)
    return base, dyn


def main():
    fence()
    import jax

    import bench
    import libzl_tpu.engine.render as render_mod

    eng = bench.build_session(B, num_voices=V)
    print(f"backend={jax.default_backend()} fetch={eng.fetch} "
          f"la={eng._lookahead} native_host={eng.use_native_host} "
          f"ladder={eng._ratio_ladder}", flush=True)
    assert eng.use_native_host, "native host core required for this A/B"
    last = None
    for _ in range(24):
        last = eng.process_block()
    jax.block_until_ready(last.outputs.master)

    # host-half stub: _start_horizon runs its host work, render replaced
    # by a cached output so only the sim half is timed
    orig_compact = render_mod.render_horizon_onebuf  # engine hot path
    cap = {"outs": None, "skip": False}

    def spy(s_, hz_, st_, **k):
        if cap["skip"]:
            return cap["outs"]
        cap["outs"] = orig_compact(s_, hz_, st_, **k)
        return cap["outs"]

    render_mod.render_horizon_onebuf = spy
    eng._discard_horizon()
    eng.process_block()  # re-arm (clean-run gate) and capture cap["outs"]
    for _ in range(8):
        eng.process_block()
    jax.block_until_ready(cap["outs"][-1].master)

    names = ["eng_ms_blk", "host_native", "host_loop"]
    results = {k: [] for k in names}
    for r in range(ROUNDS):
        cap["skip"] = False
        eng._discard_horizon()
        t0 = time.perf_counter()
        for _ in range(CHAIN_BLOCKS):
            last = eng.process_block()
        jax.block_until_ready(last.outputs.master)
        results["eng_ms_blk"].append(
            (time.perf_counter() - t0) / CHAIN_BLOCKS * 1e3)

        cap["skip"] = True
        t0 = time.perf_counter()
        for _ in range(REPS):
            eng._discard_horizon()
            eng._start_horizon()
        results["host_native"].append(
            (time.perf_counter() - t0) / REPS * 1e3)
        eng._discard_horizon()

        t0 = time.perf_counter()
        for _ in range(REPS):
            base, dyn = _host_loop_once(eng)
        results["host_loop"].append((time.perf_counter() - t0) / REPS * 1e3)
        assert dyn is not None
        cap["skip"] = False

        print(f"round {r}: " + " ".join(
            f"{k}={results[k][-1]:.3f}" for k in names), flush=True)

    out = {k: dict(median=round(float(np.median(v)), 3),
                   all=[round(x, 3) for x in v])
           for k, v in results.items()}
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
