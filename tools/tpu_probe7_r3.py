"""Round-3 TPU probe #7: can the drain's D2H overlap rendering on this relay?

The pump's bounce drain pays a blocking ~30-40 ms np.asarray per K-block
flush (soak phase counters: flush_sync is ~45% of pump wall). Round-1's
pipelined-sync A/B showed PER-BLOCK syncs cannot overlap through the relay;
this probes the DRAIN shape: start `copy_to_host_async()` on the K-block
concat, render the next K blocks, then materialize — if the copy ran
behind the renders, the materialize is ~free and drain throughput rises by
the sync share.

Modes, interleaved on one engine (B=128, lookahead auto, V=1024):
  sync:   render K -> concat -> np.asarray (the current _flush_drain)
  async:  render K -> concat -> copy_to_host_async, render next K, then
          np.asarray the previous concat (one drain of extra latency —
          free on the non-pacing bounce path that drains engage on)

    nohup python tools/tpu_probe7_r3.py > /tmp/tpu_probe7_r3.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 128
V = 1024
K = 32
DRAINS = 6
ROUNDS = 5


def render_k(eng):
    return [eng.process_block().outputs.master for _ in range(K)]


def concat(masters):
    import jax.numpy as jnp

    return jnp.concatenate([jnp.ravel(m) for m in masters])


def mode_sync(eng):
    t0 = time.perf_counter()
    sync_ms = 0.0
    for _ in range(DRAINS):
        cat = concat(render_k(eng))
        t1 = time.perf_counter()
        np.asarray(cat)
        sync_ms += time.perf_counter() - t1
    total = time.perf_counter() - t0
    return total / (DRAINS * K) * 1e3, sync_ms / DRAINS * 1e3


def mode_async(eng):
    t0 = time.perf_counter()
    sync_ms = 0.0
    pending = None
    for _ in range(DRAINS):
        cat = concat(render_k(eng))
        cat.copy_to_host_async()
        if pending is not None:
            t1 = time.perf_counter()
            np.asarray(pending)
            sync_ms += time.perf_counter() - t1
        pending = cat
    t1 = time.perf_counter()
    np.asarray(pending)
    sync_ms += time.perf_counter() - t1
    total = time.perf_counter() - t0
    return total / (DRAINS * K) * 1e3, sync_ms / DRAINS * 1e3


def main():
    import jax

    import bench

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda a: a + 1)(np.ones(8, np.float32)))
    print(f"fence: {time.perf_counter() - t0:.1f}s", flush=True)

    eng = bench.build_session(B, num_voices=V)
    t0 = time.perf_counter()
    for _ in range(10):
        res = eng.process_block()
    jax.block_until_ready(res.outputs.master)
    print(f"warm: {time.perf_counter() - t0:.1f}s (la={eng._lookahead} "
          f"ladder={eng._ratio_ladder})", flush=True)

    results = {"sync": [], "async": []}
    syncs = {"sync": [], "async": []}
    for r in range(ROUNDS):
        for name, fn in (("sync", mode_sync), ("async", mode_async)):
            per_block, sync_per_drain = fn(eng)
            results[name].append(round(per_block, 3))
            syncs[name].append(round(sync_per_drain, 3))
        print(f"round {r}: " + " ".join(
            f"{n}={results[n][-1]:.2f}(sync {syncs[n][-1]:.1f})"
            for n in results), flush=True)

    summary = {
        n: dict(ms_per_block_median=round(float(np.median(v)), 3),
                best=round(float(np.min(v)), 3), rounds=v,
                sync_ms_per_drain=syncs[n])
        for n, v in results.items()
    }
    summary["async_vs_sync"] = round(
        summary["async"]["ms_per_block_median"]
        / summary["sync"]["ms_per_block_median"], 3)
    print("RESULT " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
