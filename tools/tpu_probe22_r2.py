"""Round-2 TPU probe #22: voice-count scaling with the final grid kernel.

Refreshes the README scaling table (measured mid-round on the pre-hat,
pre-GROUP-batch, pre-grid kernel). One process, B=1024 super-blocks,
best-of-3 rounds per size (transient-slowdown discipline, NOTES).

    nohup python tools/tpu_probe22_r2.py > /tmp/tpu_probe22_r2.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = (96, 256, 1024, 2048, 4096)


def main():
    import jax

    import bench

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda a: a + 1)(np.ones(8, np.float32)))
    print(f"fence: {time.perf_counter() - t0:.1f}s", flush=True)

    results = {}
    for v in SIZES:
        eng = bench.build_session(1024, num_voices=v)
        for _ in range(8):
            res = eng.process_block()
        jax.block_until_ready(res.outputs.master)
        active = int(eng.pool.active.sum())
        rts = []
        for _ in range(3):
            n = 40
            t0 = time.perf_counter()
            for _ in range(n):
                res = eng.process_block()
            jax.block_until_ready(res.outputs.master)
            rts.append(n * 1024 / bench.SAMPLE_RATE
                       / (time.perf_counter() - t0))
        best = max(rts)
        results[v] = dict(active=active, rt_best=round(best, 3),
                          rounds=[round(r, 3) for r in rts],
                          vs_ref=round(best * active / 96.0, 1))
        print(f"V={v} (active {active}): best {best:.2f}x realtime, "
              f"voice-throughput {best * active / 96.0:.1f}x ref "
              f"(rounds {[f'{r:.2f}' for r in rts]})", flush=True)
        del eng
    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
