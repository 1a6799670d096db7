"""Round-2 TPU probe #24: LIVE-block (B=128) voice scaling with the final grid kernel.

What polyphony fits the 2.67 ms live budget? One process, 128-frame
blocks in the chained regime (sync once per round — the pipelined pump's
cost model), best-of-3 rounds per size, ms/block reported.

    nohup python tools/tpu_probe24_r2.py > /tmp/tpu_probe24_r2.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = (96, 256, 512, 1024, 2048)


def main():
    import jax

    import bench

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda a: a + 1)(np.ones(8, np.float32)))
    print(f"fence: {time.perf_counter() - t0:.1f}s", flush=True)

    results = {}
    for v in SIZES:
        eng = bench.build_session(128, num_voices=v)
        for _ in range(8):
            res = eng.process_block()
        jax.block_until_ready(res.outputs.master)
        active = int(eng.pool.active.sum())
        mss = []
        for _ in range(3):
            n = 150
            t0 = time.perf_counter()
            for _ in range(n):
                res = eng.process_block()
            jax.block_until_ready(res.outputs.master)
            mss.append((time.perf_counter() - t0) / n * 1e3)
        best = min(mss)
        budget = 128 / bench.SAMPLE_RATE * 1e3
        results[v] = dict(active=active, ms_best=round(best, 3),
                          rounds=[round(m, 3) for m in mss],
                          fits_budget=bool(best <= budget))
        print(f"V={v} (active {active}): best {best:.2f} ms/block "
              f"(budget {budget:.2f}) fits={best <= budget} "
              f"(rounds {[f'{m:.2f}' for m in mss]})", flush=True)
        del eng
    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
