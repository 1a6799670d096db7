"""Round-2 TPU probe #5: gather/windows A/B after the region-skip
optimization (region-B weight build + dot behind pl.when). Compare the
windows/gather RATIO against probe 3 (0.77 at B=1024) — gather is the
in-process control for cross-process drift.

    nohup python tools/tpu_probe5_r2.py > /tmp/tpu_probe5_r2.log 2>&1 &
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

    def bench_engine(engine, n):
        for _ in range(6):
            res = engine.process_block()
        jax.block_until_ready(res.outputs.master)
        t0 = time.perf_counter()
        for _ in range(n):
            res = engine.process_block()
        jax.block_until_ready(res.outputs.master)
        return (time.perf_counter() - t0) / n * 1e3

    results = {"B128": {"gather": [], "windows": []},
               "B1024": {"gather": [], "windows": []}}
    # build one engine per fetch mode ONCE, then alternate measurement
    # rounds on the same engines (no rebuild noise, compile cache warm)
    engines = {}
    for block in (128, 1024):
        for fetch in ("gather", "windows"):
            e = bench.build_session(block)
            e.fetch = fetch
            e._bank_version_on_device = -1
            engines[(block, fetch)] = e
    for trial in range(5):
        for block in (128, 1024):
            n = 100 if block == 128 else 40
            for fetch in ("gather", "windows"):
                ms = bench_engine(engines[(block, fetch)], n)
                results[f"B{block}"][fetch].append(round(ms, 3))
                print(f"trial {trial} B={block} {fetch}: {ms:.2f} ms",
                      flush=True)
    for k, v in results.items():
        for f, xs in v.items():
            print(f"{k} {f}: median {np.median(xs):.2f} ms, {xs}", flush=True)
    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
