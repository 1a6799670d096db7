"""Round-2 TPU probe #23: int16 bank through the windows kernel.

The windows kernel now accepts int16 banks (int16 region DMAs, dequant at
the slab slice). Open questions: does Mosaic lower the int16 scratch +
astype, and does halving the DMA bytes show up at all (probe 2 said the
gather is not byte-bound)? Configs: bank dtype x fetch, at both block
sizes; f32 windows is the in-process control. Numerics vs f32 gather
should be ~1/32767-quantization-limited.

    nohup python tools/tpu_probe23_r2.py > /tmp/tpu_probe23_r2.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = (
    ("float32", "windows"),
    ("int16", "windows"),
    ("int16", "gather"),
)


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

    engines, dead = {}, set()
    for block in (128, 1024):
        for dtype, fetch in CONFIGS:
            e = bench.build_session(block)
            e.bank_dtype = dtype
            e.fetch = fetch
            e._bank_version_on_device = -1
            engines[(block, dtype, fetch)] = e

    ref = {}
    for key, e in list(engines.items()):
        block = key[0]
        try:
            m = np.asarray(e.process_block().outputs.master)
        except Exception as exc:
            print(f"COMPILE FAIL {key}: {type(exc).__name__}: "
                  f"{str(exc)[:300]}", flush=True)
            dead.add(key)
            continue
        if block not in ref:
            ref[block] = m
        else:
            print(f"{key} maxdev vs f32-windows: "
                  f"{float(np.abs(m - ref[block]).max()):.2e} "
                  f"(scale {float(np.abs(ref[block]).max()):.1f})", flush=True)

    results = {}
    for trial in range(5):
        for block in (128, 1024):
            n = 100 if block == 128 else 40
            order = CONFIGS if trial % 2 == 0 else tuple(reversed(CONFIGS))
            for dtype, fetch in order:
                key = (block, dtype, fetch)
                if key in dead:
                    continue
                ms = run(engines[key], n)
                results.setdefault(f"B{block}", {}).setdefault(
                    f"{dtype}:{fetch}", []).append(round(ms, 3))
                print(f"trial {trial} B={block} {dtype}:{fetch}: {ms:.2f} ms",
                      flush=True)
    for k, v in results.items():
        base = np.median(v.get("float32:windows", [np.nan]))
        for cfg, times in v.items():
            m = np.median(times)
            print(f"{k} {cfg}: median {m:.2f} best {min(times):.2f} "
                  f"ratio {m/base:.3f}", flush=True)
    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
