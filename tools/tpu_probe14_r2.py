"""Round-2 TPU probe #14: windows-kernel dot precision A/B.

The interpolation dots run at Precision.HIGHEST (6-pass bf16) because the
hat weights demand exact alpha. But each weight column has <= 2 nonzeros —
HIGH (3-pass) or even DEFAULT (1-pass bf16) may carry enough mantissa for
audio-rate interpolation while cutting the MXU passes 2-6x. Measure, per
block size, interleaved on persistent engines in one process:

  - ms/block for windows (highest), windows:high, windows:default, gather
  - master-output maxdev of each windows variant vs gather (numerics)

    nohup python tools/tpu_probe14_r2.py > /tmp/tpu_probe14.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Mosaic's dot lowering supports only HIGHEST and DEFAULT (HIGH raises
# NotImplementedError on this toolchain — first probe attempt)
VARIANTS = ("windows", "windows:default", "gather")


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

    engines = {}
    for block in (128, 1024):
        for fetch in VARIANTS:
            e = bench.build_session(block)
            e.fetch = fetch
            e._bank_version_on_device = -1
            engines[(block, fetch)] = e

    # numerics first (same engines, before timing warps state): one block
    # rendered from identical programs — engines were built identically and
    # process_block advances deterministically, so compare block k outputs.
    print("--- numerics (block 0 master, vs gather) ---", flush=True)
    for block in (128, 1024):
        masters = {}
        for fetch in VARIANTS:
            res = engines[(block, fetch)].process_block()
            masters[fetch] = np.asarray(res.outputs.master)
        ref = masters["gather"]
        for fetch in VARIANTS[:-1]:
            dev = float(np.abs(masters[fetch] - ref).max())
            print(f"B={block} {fetch}: maxdev {dev:.3e}", flush=True)

    results = {f"B{b}": {f: [] for f in VARIANTS} for b in (128, 1024)}
    for trial in range(5):
        for block in (128, 1024):
            n = 100 if block == 128 else 40
            for fetch in VARIANTS:
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
