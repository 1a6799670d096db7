"""Round-2 TPU probe #25: GROUP sweep on the grid kernel.

GROUP=8 was tuned for the fori_loop kernel (probe 4). The grid variant
changes the pipelining structure (DMA waits per step, per-chunk grid
steps), so re-sweep voices-per-grid-step g4/g8/g16 with grid as control.

    nohup python tools/tpu_probe25_r2.py > /tmp/tpu_probe25_r2.log 2>&1 &

NOTE: controls are pinned to "windows:fusedw" — the suffix-less
default became variant "auto" (grid at single-chunk blocks) after
these probes originally ran, which would confound a re-run.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    128: ("windows:grid", "windows:grid,g4", "windows:grid,g16"),
    1024: ("windows:grid", "windows:grid,g4", "windows:grid,g16"),
}


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
    for block, fetches in CONFIGS.items():
        for fetch in fetches:
            e = bench.build_session(block)
            e.fetch = fetch
            e._bank_version_on_device = -1
            engines[(block, fetch)] = e

    # compile + numerics check; drop configs Mosaic rejects
    ref = {}
    for (block, fetch), e in list(engines.items()):
        try:
            r = e.process_block()
            m = np.asarray(r.outputs.master)
        except Exception as exc:
            print(f"COMPILE FAIL B={block} {fetch}: {type(exc).__name__}: "
                  f"{str(exc)[:300]}", flush=True)
            dead.add((block, fetch))
            continue
        if block not in ref:
            ref[block] = m
        else:
            print(f"maxdev B={block} {fetch}: "
                  f"{float(np.abs(m - ref[block]).max()):.2e}", flush=True)

    results = {}
    for trial in range(8):
        for block, fetches in CONFIGS.items():
            n = 100 if block == 128 else 40
            order = fetches if trial % 2 == 0 else tuple(reversed(fetches))
            for fetch in order:
                if (block, fetch) in dead:
                    continue
                ms = run(engines[(block, fetch)], n)
                results.setdefault(f"B{block}", {}).setdefault(
                    fetch, []).append(round(ms, 3))
                print(f"trial {trial} B={block} {fetch}: {ms:.2f} ms",
                      flush=True)
    for k, v in results.items():
        base = np.median(v.get("windows:grid", [np.nan]))
        for fetch, times in v.items():
            m = np.median(times)
            print(f"{k} {fetch}: median {m:.2f} best {min(times):.2f} "
                  f"ratio {m/base:.3f}", flush=True)
    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
