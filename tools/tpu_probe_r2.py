"""Round-2 TPU probe: one process, fence first, then A/B measurements.

1. Pallas windows kernel vs XLA gather at B in {128, 1024} (the keep/retire
   decision VERDICT r1 #9 asks to re-date each round).
2. Live-mode split: chained (one sync) vs per-block sync at B=128 — the
   device_ms / sync_ms breakdown bench.py now reports.

Run detached (the relay stalls the first D2H for minutes):
    nohup python tools/tpu_probe_r2.py > /tmp/tpu_probe_r2.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda a: a + 1)(np.ones(8, np.float32)))
    print(f"fence: {time.perf_counter() - t0:.1f}s", flush=True)

    import bench

    results = {}

    for block in (128, 1024):
        per_fetch = {}
        for fetch in ("gather", "windows"):
            try:
                engine = bench.build_session(block)
                engine.fetch = fetch
                engine._bank_version_on_device = -1  # re-upload in the
                # layout this fetch path needs (planar vs interleaved)
                for _ in range(6):
                    res = engine.process_block()
                jax.block_until_ready(res.outputs.master)
                n = 120 if block == 128 else 60
                t0 = time.perf_counter()
                for _ in range(n):
                    res = engine.process_block()
                jax.block_until_ready(res.outputs.master)
                dt = time.perf_counter() - t0
                per_fetch[fetch] = round(dt / n * 1e3, 3)
                print(f"B={block} fetch={fetch}: {dt / n * 1e3:.2f} ms/block",
                      flush=True)
            except Exception as e:
                per_fetch[fetch] = f"error: {e}"
                print(f"B={block} fetch={fetch}: ERROR {e}", flush=True)
        results[f"ms_per_block_B{block}"] = per_fetch

    try:
        live = bench.measure_live_mode(blocks=200)
        results["live_mode"] = live
        print("live:", live, flush=True)
    except Exception as e:
        results["live_mode"] = f"error: {e}"

    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
