"""Round-2 TPU probe #16: loop vs fusedw decider (B=1024).

Probe 15 was ambiguous (median favored fusedw 0.704 vs 0.814, but paired
trials went 3/5 to loop in a drifty process). This probe alternates the
A/B order every trial and runs 10 trials so order bias and drift cancel;
paired per-trial ratios are the decision statistic.

    nohup python tools/tpu_probe16_r2.py > /tmp/tpu_probe16_r2.log 2>&1 &

NOTE: the control is pinned to "windows:loop" — the suffix-less default
became fusedw (then variant "auto") after this probe originally ran.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    import bench

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda a: a + 1)(np.ones(8, np.float32)))
    print(f"fence: {time.perf_counter() - t0:.1f}s", flush=True)

    def run(engine, n=40):
        for _ in range(6):
            res = engine.process_block()
        jax.block_until_ready(res.outputs.master)
        t0 = time.perf_counter()
        for _ in range(n):
            res = engine.process_block()
        jax.block_until_ready(res.outputs.master)
        return (time.perf_counter() - t0) / n * 1e3

    engines = {}
    for fetch in ("windows:loop", "windows:fusedw"):
        e = bench.build_session(1024)
        e.fetch = fetch
        e._bank_version_on_device = -1
        engines[fetch] = e

    results = {"windows:loop": [], "windows:fusedw": []}
    pairs = []
    for trial in range(10):
        order = (("windows:loop", "windows:fusedw") if trial % 2 == 0
                 else ("windows:fusedw", "windows:loop"))
        t = {}
        for fetch in order:
            t[fetch] = run(engines[fetch])
            results[fetch].append(round(t[fetch], 3))
        r = t["windows:fusedw"] / t["windows:loop"]
        pairs.append(round(r, 3))
        print(f"trial {trial} ({order[0]} first): loop {t['windows:loop']:.2f} "
              f"fusedw {t['windows:fusedw']:.2f} ratio {r:.3f}", flush=True)
    lw = np.median(results["windows:loop"]); fw = np.median(results["windows:fusedw"])
    wins = sum(1 for r in pairs if r < 1.0)
    print(f"medians: loop {lw:.2f} fusedw {fw:.2f}; best: "
          f"loop {min(results['windows:loop']):.2f} "
          f"fusedw {min(results['windows:fusedw']):.2f}; "
          f"paired-median ratio {np.median(pairs):.3f}; fusedw wins {wins}/10",
          flush=True)
    print("RESULT " + json.dumps({"results": results, "pairs": pairs}),
          flush=True)


if __name__ == "__main__":
    main()
