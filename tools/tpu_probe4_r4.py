"""Round-4 TPU probe #4: stacked vs compact horizon, ONE process.

Probe 3 (probe1 rerun on the compact upload) showed only ~0.3-0.4 ms/block
improvement where the byte math predicted ~1 ms — but it was a different
process (variance ~1.5x, NOTES). This probe interleaves BOTH horizon
uploads and a transfer-size curve in one process:

  eng_ms_blk     engine chained quiet ms/block (compact path, end-to-end)
  host_ms        _start_horizon host half (sim+snapshots+pack), render
                 stubbed
  compact_ms     direct render_horizon_compact dispatch, host-resident
                 base+dyn (upload + device + done-poll per horizon)
  stacked_ms     direct render_horizon_fused dispatch, host-resident
                 [V, H*K] stack (the round-4-early design)
  resident_ms    render_horizon_compact with device-resident base+dyn
                 (pure dispatch + device)
  xfer_<KB>      dispatch-embedded H2D cost: trivial jit over a fresh
                 host array of each size, chained (64/148/373/1024/2359 KB)

    nohup python tools/tpu_probe4_r4.py > /tmp/tpu_probe4_r4.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V = 1024
B = 128
H = 16
ROUNDS = 5
REPS = 8


def fence():
    import jax
    import jax.numpy as jnp

    x = jax.jit(lambda a: a + 1)(jnp.ones(8))
    t0 = time.perf_counter()
    np.asarray(x)
    print(f"fence {time.perf_counter() - t0:.1f}s", flush=True)


def main():
    fence()
    import jax

    import bench
    import libzl_tpu.engine.render as render_mod
    from libzl_tpu.engine import hostcore
    from libzl_tpu.ops import voice as voice_ops

    eng = bench.build_session(B)
    print(f"backend={jax.default_backend()} fetch={eng.fetch} "
          f"la={eng._lookahead} ladder={eng._ratio_ladder}", flush=True)
    last = None
    for _ in range(24):
        last = eng.process_block()
    jax.block_until_ready(last.outputs.master)
    eng._discard_horizon()

    # build one horizon's uploads by the host sim (restored afterwards)
    snap_pre = eng.pool.save_state()
    packed = []
    start0 = float(eng.clock.sample_position)
    lane = eng.lane_enabled.copy()
    for h in range(H):
        pi, pf, _ = hostcore.voice_update(
            eng.pool, block_start_sample=start0 + h * B,
            tick_anchor_sample=eng.clock.anchor_sample,
            tick_anchor=eng.clock.anchor_tick,
            samples_per_tick=eng.clock.samples_per_tick,
            lane_enabled=lane,
        )
        packed.append((pi, pf))
    eng.pool.restore_state(snap_pre)
    dyn = voice_ops.pack_horizon_dynamics(packed[1:], eng.pool.istart)
    base = voice_ops.fuse_packed(*packed[0])
    stack = np.concatenate(
        [voice_ops.fuse_packed(pi, pf) for pi, pf in packed], axis=1)
    sound = eng._sound_data_for_backend()
    strips = eng._packed_strips_for_backend()
    rmax = eng._render_rmax(packed[0][0], packed[0][1])
    kw = dict(block_frames=B, slices=H, quirk_gain=eng.quirk_gain,
              fetch=eng.fetch, max_pitch_ratio=rmax)
    print(f"base={base.nbytes}B dyn={dyn.nbytes}B stack={stack.nbytes}B "
          f"rmax={rmax}", flush=True)

    # warm every direct path once
    o = render_mod.render_horizon_compact(sound, base, dyn, strips, **kw)
    jax.block_until_ready(o[-1].master)
    o = render_mod.render_horizon_fused(sound, stack, strips, **kw)
    jax.block_until_ready(o[-1].master)
    base_dev, dyn_dev = jax.device_put(base), jax.device_put(dyn)
    jax.block_until_ready([base_dev, dyn_dev])

    import jax.numpy as jnp
    probe_fn = jax.jit(lambda x: x.ravel()[0] * 1)
    sizes_kb = [64, 148, 373, 1024, 2359]
    for s in sizes_kb:
        jax.block_until_ready(
            probe_fn(np.zeros(s * 256, np.int32)))

    # host-half stub
    orig_compact = render_mod.render_horizon_compact
    cap = {"outs": None, "skip": False}

    def spy(s_, b_, d_, st_, **k):
        if cap["skip"]:
            return cap["outs"]
        cap["outs"] = orig_compact(s_, b_, d_, st_, **k)
        return cap["outs"]

    render_mod.render_horizon_compact = spy

    names = ["eng_ms_blk", "host_ms", "compact_ms", "stacked_ms",
             "resident_ms"] + [f"xfer_{s}" for s in sizes_kb]
    results = {k: [] for k in names}
    for r in range(ROUNDS):
        cap["skip"] = False
        eng._discard_horizon()
        t0 = time.perf_counter()
        for _ in range(64):
            last = eng.process_block()
        jax.block_until_ready(last.outputs.master)
        results["eng_ms_blk"].append((time.perf_counter() - t0) / 64 * 1e3)

        cap["skip"] = True
        t0 = time.perf_counter()
        for _ in range(REPS):
            eng._start_horizon()
        results["host_ms"].append((time.perf_counter() - t0) / REPS * 1e3)
        cap["skip"] = False

        t0 = time.perf_counter()
        outs = [orig_compact(sound, base, dyn, strips, **kw)[-1].master
                for _ in range(REPS)]
        jax.block_until_ready(outs)
        results["compact_ms"].append((time.perf_counter() - t0) / REPS * 1e3)

        t0 = time.perf_counter()
        outs = [render_mod.render_horizon_fused(
            sound, stack, strips, **kw)[-1].master for _ in range(REPS)]
        jax.block_until_ready(outs)
        results["stacked_ms"].append((time.perf_counter() - t0) / REPS * 1e3)

        t0 = time.perf_counter()
        outs = [orig_compact(sound, base_dev, dyn_dev, strips, **kw)[-1].master
                for _ in range(REPS)]
        jax.block_until_ready(outs)
        results["resident_ms"].append((time.perf_counter() - t0) / REPS * 1e3)

        for s in sizes_kb:
            bufs = [np.full(s * 256, i, np.int32) for i in range(REPS)]
            t0 = time.perf_counter()
            outs = [probe_fn(b_) for b_ in bufs]
            jax.block_until_ready(outs)
            results[f"xfer_{s}"].append(
                (time.perf_counter() - t0) / REPS * 1e3)

        print(f"round {r}: " + " ".join(
            f"{k}={results[k][-1]:.2f}" for k in names), flush=True)

    out = {k: dict(median=round(float(np.median(v)), 3),
                   all=[round(x, 2) for x in v])
           for k, v in results.items()}
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
