"""Round-3 TPU probe #10: voice-count scaling at HEAD (grid kernel +
ratio ladder + lookahead horizon).

Refreshes the README scaling table, whose numbers predate the round-3
lookahead/ladder work (probe 22 measured the bare grid kernel). Two
regimes per voice count, one process, best-of-3 rounds per cell
(transient-slowdown discipline, NOTES_TPU_ENV.md):

- superblock: B=1024, engine defaults (lookahead auto -> 2) — the
  bounce/serving configuration;
- live: B=128 chained with one sync per round (lookahead auto -> 16) —
  what the pipelined C-ABI pump sustains per block.

    nohup tools/relay_retry.sh -- python tools/tpu_probe10_r3.py \
        > /tmp/tpu_probe10_r3.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = (96, 256, 512, 1024, 2048, 4096)


def _measure(eng, block_frames, blocks, rounds=3):
    import jax

    for _ in range(8):
        res = eng.process_block()
    jax.block_until_ready(res.outputs.master)
    ms = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        last = None
        for _ in range(blocks):
            last = eng.process_block()
        jax.block_until_ready(last.outputs.master)
        ms.append((time.perf_counter() - t0) / blocks * 1e3)
    return ms


def main():
    import jax

    import bench

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda a: a + 1)(np.ones(8, np.float32)))
    print(f"fence: {time.perf_counter() - t0:.1f}s", flush=True)

    results = {}
    for v in SIZES:
        row = {}

        eng = bench.build_session(1024, num_voices=v)
        ms = _measure(eng, 1024, 40)
        # read AFTER warmup: voices claim on the block that consumes their
        # start command, so a pre-block read sees an idle pool
        active = int(eng.pool.active.sum())
        best = min(ms)
        rt_super = 1024 / bench.SAMPLE_RATE / (best * 1e-3)
        row["super"] = dict(
            ms_rounds=[round(m, 2) for m in ms],
            rt_best=round(rt_super, 3),
            vs_ref=round(rt_super * active / 96.0, 1),
        )
        del eng

        eng = bench.build_session(128, num_voices=v)
        ms = _measure(eng, 128, 120)
        best = min(ms)
        row["live"] = dict(
            ms_rounds=[round(m, 3) for m in ms],
            ms_best=round(best, 3),
            rt_best=round(128 / bench.SAMPLE_RATE / (best * 1e-3), 3),
        )
        del eng

        results[v] = dict(active=active, **row)
        print(
            f"V={v} (active {active}): super {rt_super:.2f}x rt "
            f"({rt_super * active / 96.0:.1f}x ref voice-throughput), "
            f"live {row['live']['ms_best']:.2f} ms/block "
            f"({row['live']['rt_best']:.2f}x rt)",
            flush=True,
        )
    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
