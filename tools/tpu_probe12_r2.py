"""Round-2 TPU probe #12: does per-block time degrade over process
lifetime? bench.py measures live mode LAST (after ~500 superblocks) and
records 2x worse numbers than fresh-process probes. Measure the same
B=128 engine repeatedly while interleaving heavy superblock work.

    nohup python tools/tpu_probe12_r2.py > /tmp/tpu_probe12_r2.log 2>&1 &
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

    live = bench.build_session(128)
    heavy = bench.build_session(1024)

    def run(engine, n):
        for _ in range(4):
            res = engine.process_block()
        jax.block_until_ready(res.outputs.master)
        t0 = time.perf_counter()
        for _ in range(n):
            res = engine.process_block()
        jax.block_until_ready(res.outputs.master)
        return (time.perf_counter() - t0) / n * 1e3

    results = {"live_ms": [], "heavy_blocks_done": []}
    total_heavy = 0
    for phase in range(6):
        ms = run(live, 100)
        results["live_ms"].append(round(ms, 3))
        results["heavy_blocks_done"].append(total_heavy)
        print(f"phase {phase}: live {ms:.2f} ms after {total_heavy} heavy "
              "superblocks", flush=True)
        # ~100 superblocks of heavy work between live measurements
        for _ in range(100):
            res = heavy.process_block()
        jax.block_until_ready(res.outputs.master)
        total_heavy += 100
    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
