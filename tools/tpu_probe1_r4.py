"""Round-4 TPU probe #1: the STACKED bit-exact horizon vs round-3 economics.

Round 4 rebuilt the lookahead horizon as H stacked per-block programs
(bit-exact vs per-block dispatch; VERDICT r3 #4) and made event blocks
REBUILD the horizon in-dispatch (VERDICT r3 #1). Both change the live-path
cost profile vs round 3's window-program horizon:
- the horizon upload grows H-fold ([V, H*K] ~ 2.9 MB at V=1024 H=16 vs
  ~190 KB) — per NOTES probe 1 H2D latency was size-independent at ~70 KB;
  this probe measures whether that holds at 3 MB;
- the host build runs H per-block voice_updates per horizon (native core);
- event blocks now pay one horizon dispatch instead of one per-block
  dispatch, and amortize it over the following clean run.

Measures, interleaved in ONE process (cross-process variance ~1.5x):
  quiet_la      chained ms/block, event at start only (round-3: ~0.9-1.2)
  quiet_off     per-block engine (la=0) chained ms/block (round-3: ~4-5)
  event37_la    one retrigger every 37 blocks (soak-#7's storm density)
  event8_la     every 8 blocks (denser than any soak regime)
  event4_la     every 4 blocks (REBUILD_MIN_GAP edge: gap 3 still rebuilds)
  event2_la     every 2 blocks (below the gate: degrades to per-block)
  hostsim_ms    the 16-block host sim alone (native voice_update x16)

    nohup python tools/tpu_probe1_r4.py > /tmp/tpu_probe1_r4.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V = 1024
B = 128
ROUNDS = 5
BLOCKS = 64


def fence():
    import jax
    import jax.numpy as jnp

    x = jax.jit(lambda a: a + 1)(jnp.ones(8))
    t0 = time.perf_counter()
    np.asarray(x)
    print(f"fence {time.perf_counter() - t0:.1f}s", flush=True)


def retrigger(eng, rng):
    from libzl_tpu.engine.commands import ClipCommand

    cid = sorted(eng.clips.keys())[int(rng.integers(0, 8))]
    cmd = ClipCommand.channel(cid, int(rng.integers(0, 10)))
    cmd.midi_note = int(rng.integers(48, 68))
    cmd.change_volume = True
    cmd.volume = 0.8
    cmd.stop_playback = True
    cmd.start_playback = True
    cmd.looping = True
    cmd.change_looping = True
    eng.schedule_clip_command(cmd, 0)


def chained(eng, every=0, n=BLOCKS, rng=None):
    """ms/block, one sync at the end; optional retrigger every `every`
    blocks (the event-regime traffic)."""
    import jax

    t0 = time.perf_counter()
    last = None
    for i in range(n):
        if every and i % every == 0:
            retrigger(eng, rng)
        last = eng.process_block()
    jax.block_until_ready(last.outputs.master)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    fence()
    import jax

    import bench

    rng = np.random.default_rng(11)
    eng_la = bench.build_session(B)
    eng_off = bench.build_session(B)
    eng_off._lookahead = 0
    print(f"backend={jax.default_backend()} fetch={eng_la.fetch} "
          f"la={eng_la._lookahead} ladder={eng_la._ratio_ladder} "
          f"native_host={eng_la.use_native_host}", flush=True)
    for eng in (eng_la, eng_off):
        for _ in range(24):
            r = eng.process_block()
        jax.block_until_ready(r.outputs.master)

    # host sim cost alone: 16 per-block voice_updates on a live pool copy
    snap = eng_la.pool.save_state()
    t0 = time.perf_counter()
    if eng_la.use_native_host:
        from libzl_tpu.engine import hostcore

        for h in range(16):
            hostcore.voice_update(
                eng_la.pool,
                block_start_sample=float(eng_la.clock.sample_position)
                + h * B,
                tick_anchor_sample=eng_la.clock.anchor_sample,
                tick_anchor=eng_la.clock.anchor_tick,
                samples_per_tick=eng_la.clock.samples_per_tick,
                lane_enabled=eng_la.lane_enabled,
            )
    hostsim_ms = (time.perf_counter() - t0) * 1e3
    eng_la.pool.restore_state(snap)
    eng_la._discard_horizon()
    # horizon stack size for the record
    K = 21 + eng_la.pool.n_bq_extra + 15
    print(f"hostsim16_ms={hostsim_ms:.2f} stack_bytes="
          f"{V * 16 * K * 4}", flush=True)

    cells = {
        "quiet_la": (eng_la, 0),
        "quiet_off": (eng_off, 0),
        "event37_la": (eng_la, 37),
        "event8_la": (eng_la, 8),
        "event4_la": (eng_la, 4),
        "event2_la": (eng_la, 2),
        "event37_off": (eng_off, 37),
    }
    results = {k: [] for k in cells}
    for r in range(ROUNDS):
        for name, (eng, every) in cells.items():
            results[name].append(chained(eng, every=every, rng=rng))
        print(f"round {r}: " + " ".join(
            f"{k}={results[k][-1]:.2f}" for k in cells), flush=True)

    out = {k: dict(median=round(float(np.median(v)), 3),
                   best=round(float(np.min(v)), 3),
                   all=[round(x, 2) for x in v])
           for k, v in results.items()}
    out["hostsim16_ms"] = round(hostsim_ms, 2)
    budget = B / 48000 * 1e3
    out["rt_quiet"] = round(budget / out["quiet_la"]["median"], 2)
    out["rt_event37"] = round(budget / out["event37_la"]["median"], 2)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
