"""Round-2 TPU probe #7: voice-count scaling with the windows kernel at
B=1024 (round 1 measured gather: 1024v 2.25x, 2048v 1.14x).

    nohup python tools/tpu_probe7_r2.py > /tmp/tpu_probe7_r2.log 2>&1 &
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

    results = {}
    for voices in (256, 1024, 2048, 4096):
        try:
            e = bench.build_session(1024, num_voices=voices)
            e.fetch = "windows"
            e._bank_version_on_device = -1
            for _ in range(4):
                res = e.process_block()
            jax.block_until_ready(res.outputs.master)
            active = int(e.pool.active.sum())
            n = 40
            t0 = time.perf_counter()
            for _ in range(n):
                res = e.process_block()
            jax.block_until_ready(res.outputs.master)
            ms = (time.perf_counter() - t0) / n * 1e3
            rt = 1024 / 48000 / (ms / 1e3)
            results[f"V{voices}"] = dict(
                ms=round(ms, 2), rt=round(rt, 3), active=active,
                voice_throughput_vs_ref=round(rt * active / 96.0, 1),
            )
            print(f"V={voices} (active {active}): {ms:.2f} ms = {rt:.2f}x rt",
                  flush=True)
        except Exception as ex:
            results[f"V{voices}"] = f"error: {ex}"
            print(f"V={voices}: ERROR {ex}", flush=True)
    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
