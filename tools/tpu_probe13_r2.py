"""Round-2 TPU probe #8: dual-slab windows kernel vs gather control.

After the SLAB_SMALL fast path (half-cost weight build for spans < 384,
i.e. pitch ratio < ~2). Gather is the in-process drift control; compare
the windows/gather ratio to probe 3/5 (0.77-0.80 at B=1024).

    nohup python tools/tpu_probe13_r2.py > /tmp/tpu_probe13_r2.log 2>&1 &
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
        for fetch in ("gather", "windows"):
            e = bench.build_session(block)
            e.fetch = fetch
            e._bank_version_on_device = -1
            engines[(block, fetch)] = e
    # numerics spot check on device
    eg, ew = engines[(1024, "gather")], engines[(1024, "windows")]
    rg = eg.process_block(); rw = ew.process_block()
    mg = np.asarray(rg.outputs.master); mw = np.asarray(rw.outputs.master)
    print("numerics maxdev:", float(np.abs(mg - mw).max()),
          "scale:", float(np.abs(mg).max()), flush=True)

    results = {f"B{b}": {"gather": [], "windows": []} for b in (128, 1024)}
    for trial in range(5):
        for block in (128, 1024):
            n = 100 if block == 128 else 40
            for fetch in ("gather", "windows"):
                ms = run(engines[(block, fetch)], n)
                results[f"B{block}"][fetch].append(round(ms, 3))
                print(f"trial {trial} B={block} {fetch}: {ms:.2f} ms",
                      flush=True)
    for k, v in results.items():
        g = np.median(v["gather"]); w = np.median(v["windows"])
        print(f"{k}: gather {g:.2f} windows {w:.2f} ratio {w/g:.3f}",
              flush=True)
    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
