"""Round-2 TPU probe #26: max_pitch_ratio slab sizing on the grid kernel.

Probe 9/10 measured the r_max=2.0 slab win (19%) on the fori_loop kernel;
re-measure on the final grid variant. r_max=2.0 halves the weight-build
span (slab 768 -> 512 at chunk 128). All-active 1024-voice sessions, both
block sizes, order-alternated.

    nohup python tools/tpu_probe26_r2.py > /tmp/tpu_probe26_r2.log 2>&1 &
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

    def run(engine, n):
        for _ in range(6):
            res = engine.process_block()
        jax.block_until_ready(res.outputs.master)
        t0 = time.perf_counter()
        for _ in range(n):
            res = engine.process_block()
        jax.block_until_ready(res.outputs.master)
        return (time.perf_counter() - t0) / n * 1e3

    engines = {}
    for block in (128, 1024):
        for rmax in (4.0, 2.0):
            e = bench.build_session(block)
            e.max_pitch_ratio = rmax
            # at HEAD the ratio LADDER (not a pool clamp — removed with
            # round 4's unbounded pitch) decides the kernel slab width;
            # pin a single rung so each cell measures its static rmax.
            # bench sessions stay within +7 semitones, so every block
            # fits the 2.0 rung and never hits the gather fallback.
            e._ratio_ladder = [rmax]
            e._bank_version_on_device = -1
            engines[(block, rmax)] = e

    results = {}
    for trial in range(6):
        for block in (128, 1024):
            n = 100 if block == 128 else 40
            order = (4.0, 2.0) if trial % 2 == 0 else (2.0, 4.0)
            for rmax in order:
                ms = run(engines[(block, rmax)], n)
                results.setdefault(f"B{block}", {}).setdefault(
                    f"rmax{rmax}", []).append(round(ms, 3))
                print(f"trial {trial} B={block} rmax={rmax}: {ms:.2f} ms",
                      flush=True)
    for k, v in results.items():
        base = np.median(v["rmax4.0"])
        m2 = np.median(v["rmax2.0"])
        print(f"{k}: rmax4 {base:.2f} rmax2 {m2:.2f} ratio {m2/base:.3f} "
              f"(best {min(v['rmax2.0']):.2f} vs {min(v['rmax4.0']):.2f})",
              flush=True)
    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
