"""Round-3 TPU probe #8: finer ratio-ladder rungs at superblock geometry.

The windows kernel is at its skinny-dot STREAM bound, which scales with
slab width, which scales with the declared pitch ceiling (roofline,
NOTES_TPU_ENV.md). The dynamic ladder currently has rungs [2.0, 4.0];
the bench session's active ratios top out at 2^(7/12) = 1.498, and
multisampled instruments commonly map keyzones within a fifth of root —
so probe whether a 1.5 rung (and a 1.26 = +-4 semitone rung) buys real
superblock time over the 2.0 rung. Interleaved rounds on persistent
engines in ONE process (the only trustworthy A/B here).

    nohup python tools/tpu_probe8_r3.py > /tmp/tpu_probe8_r3.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V = 1024
B = 1024
ROUNDS = 6
BLOCKS = 16


def chained(eng, n):
    import jax

    t0 = time.perf_counter()
    last = None
    for _ in range(n):
        last = eng.process_block()
    jax.block_until_ready(last.outputs.master)
    return (time.perf_counter() - t0) / n * 1e3


def build(**over):
    import bench
    from libzl_tpu.engine.engine import AudioEngine

    saved = AudioEngine.__init__

    def patched(self, *a, **kw):
        kw.update(over)
        saved(self, *a, **kw)

    AudioEngine.__init__ = patched
    try:
        eng = bench.build_session(B, num_voices=V)
    finally:
        AudioEngine.__init__ = saved
    return eng


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda a: a + 1)(np.ones(8, np.float32)))
    print(f"fence: {time.perf_counter() - t0:.1f}s", flush=True)

    specs = {
        # static ceilings, ladder off: pure slab-width A/B
        "r20": dict(max_pitch_ratio=2.0, ratio_ladder="off"),
        "r15": dict(max_pitch_ratio=1.5, ratio_ladder="off"),
        "r126": dict(max_pitch_ratio=1.26, ratio_ladder="off"),
        # the shipping config for context (ladder auto -> dispatches 2.0)
        "auto": dict(),
    }
    engines = {}
    for name, over in specs.items():
        t0 = time.perf_counter()
        eng = engines[name] = build(**over)
        for _ in range(6):
            res = eng.process_block()
        jax.block_until_ready(res.outputs.master)
        print(f"warm {name}: {time.perf_counter() - t0:.1f}s "
              f"(ladder={eng._ratio_ladder} rmax={eng.max_pitch_ratio} "
              f"active={int(eng.pool.active.sum())})", flush=True)

    results = {n: [] for n in engines}
    for r in range(ROUNDS):
        for name, eng in engines.items():
            results[name].append(round(chained(eng, BLOCKS), 3))
        print(f"round {r}: " + " ".join(
            f"{n}={results[n][-1]:.2f}" for n in engines), flush=True)

    summary = {
        n: dict(median=round(float(np.median(v)), 3),
                best=round(float(np.min(v)), 3), rounds=v)
        for n, v in results.items()
    }
    for a in ("r15", "r126"):
        summary[f"{a}_vs_r20"] = round(
            summary[a]["median"] / summary["r20"]["median"], 3)
    print("RESULT " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
