"""Round-3 TPU probe #5: the pitch-ratio ladder on the real chip.

The bench session's notes (48..63 vs root 60) all fit the 2.0 rung, so
`ratio_ladder="auto"` dispatches the narrow-slab windows kernel (slab
768->512 at rmax 2.0, probe 26 measured -11% superblock on the STATIC
max_pitch_ratio knob). This probe A/Bs the DYNAMIC ladder against
ladder-off, interleaved in one process, at:
  - B=1024 superblocks (the bounce/serving path)
  - B=128 with the lookahead horizon (the live path)
and also re-probes a deeper horizon (lookahead=16, W=2048) vs the auto 8
at B=128 — the W cap was set from B=1024 data (probe 4); check the live
geometry agrees.

    nohup python tools/tpu_probe5_r3.py > /tmp/tpu_probe5_r3.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V = 1024
ROUNDS = 6


def chained(eng, n):
    import jax

    t0 = time.perf_counter()
    last = None
    for _ in range(n):
        last = eng.process_block()
    jax.block_until_ready(last.outputs.master)
    return (time.perf_counter() - t0) / n * 1e3


def build(block_frames, **over):
    import bench
    from libzl_tpu.engine.engine import AudioEngine

    saved = AudioEngine.__init__

    def patched(self, *a, **kw):
        kw.update(over)
        saved(self, *a, **kw)

    AudioEngine.__init__ = patched
    try:
        eng = bench.build_session(block_frames, num_voices=V)
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
        "sb_ladder": (1024, dict()),
        "sb_off": (1024, dict(ratio_ladder="off")),
        "live_ladder": (128, dict()),
        "live_off": (128, dict(ratio_ladder="off")),
        "live_la16": (128, dict(lookahead=16)),
    }
    engines, blocks = {}, {}
    for name, (bf, over) in specs.items():
        eng = engines[name] = build(bf, **over)
        blocks[name] = 16 if bf == 1024 else 48
        t0 = time.perf_counter()
        for _ in range(6):
            res = eng.process_block()
        jax.block_until_ready(res.outputs.master)
        pi, pf = None, None
        print(f"warm {name}: {time.perf_counter() - t0:.1f}s "
              f"(la={eng._lookahead} ladder={eng._ratio_ladder} "
              f"active={int(eng.pool.active.sum())})", flush=True)

    results = {n: [] for n in engines}
    for r in range(ROUNDS):
        for name, eng in engines.items():
            results[name].append(round(chained(eng, blocks[name]), 3))
        print(f"round {r}: " + " ".join(
            f"{n}={results[n][-1]:.2f}" for n in engines), flush=True)

    summary = {
        n: dict(median=round(float(np.median(v)), 3),
                best=round(float(np.min(v)), 3), rounds=v)
        for n, v in results.items()
    }
    for pair in (("sb_ladder", "sb_off"), ("live_ladder", "live_off"),
                 ("live_la16", "live_ladder")):
        a, b = pair
        summary[f"{a}_vs_{b}"] = round(
            summary[a]["median"] / summary[b]["median"], 3)
    print("RESULT " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
