"""Round-3 TPU probe #2: the fused single-buffer program upload, live path.

probe1 decomposition: eng 4.09 = host 0.59 + H2D 2.13 (two ~1 ms/buffer
relay round trips) + dispatch floor 0.80 + device ~0.5. This probe
measures the fused dispatch (ONE buffer/block) end to end, plus the
residual levers: AOT-compiled calls, device_put cost in isolation, the
bucketed sparse session, and the superblock throughput (regression check).

    nohup python tools/tpu_probe2_r3.py > /tmp/tpu_probe2_r3.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 128
V = 1024
ROUNDS = 6
BLOCKS = 40


def chained(fn, n=BLOCKS):
    import jax

    t0 = time.perf_counter()
    last = None
    for _ in range(n):
        last = fn()
    jax.block_until_ready(last)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax

    import bench
    from libzl_tpu.engine import render as render_mod
    from libzl_tpu.engine import hostcore as _hostcore
    from libzl_tpu.ops.voice import fuse_packed

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda a: a + 1)(np.ones(8, np.float32)))
    print(f"fence: {time.perf_counter() - t0:.1f}s", flush=True)

    eng = bench.build_session(B, num_voices=V)
    for _ in range(8):
        res = eng.process_block()
    jax.block_until_ready(res.outputs.master)
    print("eng warm; active =", int(eng.pool.active.sum()),
          "fetch =", eng.fetch, flush=True)

    prog_i, prog_f, _ = _hostcore.voice_update(
        eng.pool, lane_enabled=eng.lane_enabled,
        block_start_sample=float(eng.clock.sample_position),
        tick_anchor_sample=eng.clock.anchor_sample,
        tick_anchor=eng.clock.anchor_tick,
        samples_per_tick=eng.clock.samples_per_tick,
    )
    fused = fuse_packed(prog_i, prog_f)
    sound = eng._sound_data_for_backend()
    strips = eng._packed_strips_for_backend()
    fused_d = jax.device_put(fused)

    kw = dict(block_frames=B, quirk_gain=False, fetch=eng.fetch,
              max_pitch_ratio=eng.max_pitch_ratio)

    def eng_real():
        return eng.process_block().outputs.master

    def jit_fused_h2d():
        return render_mod.render_block_fused(sound, fused, strips, **kw).master

    def jit_fused_direct():
        return render_mod.render_block_fused(sound, fused_d, strips,
                                             **kw).master

    def devput_only():
        return jax.device_put(fused)

    # AOT: skip the jit cache lookup/arg processing on every call
    lowered = render_mod.render_block_fused.lower(sound, fused, strips, **kw)
    compiled = lowered.compile()

    def aot_h2d():
        return compiled(sound, fused, strips).master

    # sparse bucketed session: 96 active on the 1024 pool
    eng_s = bench.build_session(B, num_voices=V, active_voices=96)
    for _ in range(8):
        res_s = eng_s.process_block()
    jax.block_until_ready(res_s.outputs.master)

    def eng_sparse():
        return eng_s.process_block().outputs.master

    configs = [
        ("eng", eng_real),
        ("jit_fused_h2d", jit_fused_h2d),
        ("jit_fused_direct", jit_fused_direct),
        ("aot_h2d", aot_h2d),
        ("devput_only", devput_only),
        ("eng_sparse", eng_sparse),
    ]
    for name, fn in configs:
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        print(f"warm {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    results = {name: [] for name, _ in configs}
    for r in range(ROUNDS):
        for name, fn in configs:
            results[name].append(round(chained(fn), 3))
        print(f"round {r}: " + " ".join(
            f"{n}={results[n][-1]:.2f}" for n, _ in configs), flush=True)

    # superblock regression check (fused dispatch at B=1024)
    eng_sb = bench.build_session(1024, num_voices=V)
    for _ in range(6):
        res_b = eng_sb.process_block()
    jax.block_until_ready(res_b.outputs.master)
    sb = []
    for _ in range(4):
        t0 = time.perf_counter()
        last = None
        for _ in range(40):
            last = eng_sb.process_block()
        jax.block_until_ready(last.outputs.master)
        sb.append(round((time.perf_counter() - t0) / 40 * 1e3, 2))
    print(f"superblock ms/block rounds: {sb} "
          f"(rt best {1024 / 48000 / (min(sb) / 1e3):.2f}x)", flush=True)

    summary = {
        n: dict(median=round(float(np.median(v)), 3),
                best=round(float(np.min(v)), 3), rounds=v)
        for n, v in results.items()
    }
    summary["superblock_ms"] = sb
    budget = B / 48000 * 1e3
    summary["rt_live_median"] = round(
        budget / summary["eng"]["median"], 3)
    print("RESULT " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
