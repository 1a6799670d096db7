"""Round-2 TPU probe #4: windows-kernel GROUP sweep (voices per grid step).

GROUP trades grid-step count against per-step DMA batch and VMEM scratch
(2*GROUP*2*2*region f32). Interleaved trials on persistent engines.

    nohup python tools/tpu_probe4_r2.py > /tmp/tpu_probe4_r2.log 2>&1 &
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
    from libzl_tpu.ops import fetch_pallas

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

    groups = (4, 8, 16, 32)
    results = {f"B{b}": {str(g): [] for g in groups} for b in (128, 1024)}
    engines = {}
    for block in (128, 1024):
        engines[block] = bench.build_session(block)
        engines[block].fetch = "windows"
        engines[block]._bank_version_on_device = -1

    for trial in range(3):
        for block in (128, 1024):
            n = 100 if block == 128 else 40
            for g in groups:
                fetch_pallas.GROUP = g
                fetch_pallas.fetch_interp.clear_cache()
                try:
                    ms = bench_engine(engines[block], n)
                    results[f"B{block}"][str(g)].append(round(ms, 3))
                    print(f"trial {trial} B={block} GROUP={g}: {ms:.2f} ms",
                          flush=True)
                except Exception as e:
                    results[f"B{block}"][str(g)].append(f"error: {e}")
                    print(f"trial {trial} B={block} GROUP={g}: ERROR {e}",
                          flush=True)
    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
