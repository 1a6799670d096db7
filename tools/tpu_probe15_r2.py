"""Round-2 TPU probe #15: windows-kernel chunk-compute variants.

Variants (ops/fetch_pallas._VARIANTS):
  loop     — round-2 default (per-region weight chains, 2 dots/voice)
  fusedw   — one region-merged hat chain shared by both dots
  batchdot — fusedw weights + single G-batched dot over stacked slabs

Gather is the in-process drift control; compare ratios to probe 13
(windows/gather 0.614 at B=1024).

    nohup python tools/tpu_probe15_r2.py > /tmp/tpu_probe15_r2.log 2>&1 &

NOTE: the control is pinned to "windows:loop" — the suffix-less default
became fusedw (then variant "auto") after this probe originally ran.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FETCHES = ("gather", "windows:loop", "windows:fusedw", "windows:batchdot")


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
        for fetch in FETCHES:
            e = bench.build_session(block)
            e.fetch = fetch
            e._bank_version_on_device = -1
            engines[(block, fetch)] = e

    # numerics spot check on device
    rg = engines[(1024, "gather")].process_block()
    mg = np.asarray(rg.outputs.master)
    for fetch in FETCHES[1:]:
        rw = engines[(1024, fetch)].process_block()
        mw = np.asarray(rw.outputs.master)
        print(f"numerics maxdev {fetch}: {float(np.abs(mg - mw).max()):.2e}",
              "scale:", float(np.abs(mg).max()), flush=True)

    results = {f"B{b}": {f: [] for f in FETCHES} for b in (128, 1024)}
    for trial in range(5):
        for block in (128, 1024):
            n = 100 if block == 128 else 40
            for fetch in FETCHES:
                ms = run(engines[(block, fetch)], n)
                results[f"B{block}"][fetch].append(round(ms, 3))
                print(f"trial {trial} B={block} {fetch}: {ms:.2f} ms",
                      flush=True)
    for k, v in results.items():
        g = np.median(v["gather"])
        for fetch in FETCHES[1:]:
            w = np.median(v[fetch])
            print(f"{k}: gather {g:.2f} {fetch} {w:.2f} ratio {w/g:.3f}",
                  flush=True)
    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
