"""Round-3 TPU probe #3: the lookahead-horizon live path on the real chip.

Measures the bench live configuration (B=128, 1024 voices) with the
speculative horizon ON (engine default) vs OFF, interleaved in one
process, plus the sparse bucketed session, the bounce drain, and the
superblock regression check.

    nohup python tools/tpu_probe3_r3.py > /tmp/tpu_probe3_r3.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 128
V = 1024
ROUNDS = 6
BLOCKS = 48


def chained(eng, n=BLOCKS):
    import jax

    t0 = time.perf_counter()
    last = None
    for _ in range(n):
        last = eng.process_block()
    jax.block_until_ready(last.outputs.master)
    return (time.perf_counter() - t0) / n * 1e3


def build(lookahead, active=0):
    import bench
    from libzl_tpu.engine.engine import AudioEngine

    saved = AudioEngine.__init__

    def patched(self, *a, **kw):
        kw.setdefault("lookahead", lookahead)
        saved(self, *a, **kw)

    AudioEngine.__init__ = patched
    try:
        eng = bench.build_session(B, num_voices=V, active_voices=active)
    finally:
        AudioEngine.__init__ = saved
    return eng


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda a: a + 1)(np.ones(8, np.float32)))
    print(f"fence: {time.perf_counter() - t0:.1f}s", flush=True)

    engines = {}
    for name, la, act in (
        ("la8", "auto", 0),
        ("la0", 0, 0),
        ("la8_sparse96", "auto", 96),
    ):
        eng = engines[name] = build(la, act)
        t0 = time.perf_counter()
        for _ in range(10):
            res = eng.process_block()
        jax.block_until_ready(res.outputs.master)
        print(f"warm {name}: {time.perf_counter() - t0:.1f}s "
              f"(lookahead={eng._lookahead}, active="
              f"{int(eng.pool.active.sum())}, fetch={eng.fetch})",
              flush=True)

    results = {n: [] for n in engines}
    for r in range(ROUNDS):
        for name, eng in engines.items():
            results[name].append(round(chained(eng), 3))
        print(f"round {r}: " + " ".join(
            f"{n}={results[n][-1]:.2f}" for n in engines), flush=True)

    # bounce drain on the lookahead engine: K blocks per D2H
    import jax.numpy as jnp

    eng = engines["la8"]
    K = 8
    drained = []
    for _ in range(10):
        t0 = time.perf_counter()
        masters = [eng.process_block().outputs.master for _ in range(K)]
        np.asarray(jnp.concatenate(masters, axis=0))
        drained.append(round((time.perf_counter() - t0) / K * 1e3, 3))
    print(f"bounce drained ms/block (K=8): {drained}", flush=True)

    # per-block synced (the naive latency path) for the amortization ratio
    synced = []
    for _ in range(40):
        t0 = time.perf_counter()
        res = eng.process_block()
        np.asarray(res.outputs.master)
        synced.append((time.perf_counter() - t0) * 1e3)
    synced_p50 = round(float(np.percentile(synced, 50)), 3)
    print(f"synced per-block p50: {synced_p50}", flush=True)

    budget = B / 48000 * 1e3
    summary = {
        n: dict(median=round(float(np.median(v)), 3),
                best=round(float(np.min(v)), 3), rounds=v)
        for n, v in results.items()
    }
    summary["rt_live_la8"] = round(budget / summary["la8"]["median"], 3)
    summary["rt_live_la8_best"] = round(budget / summary["la8"]["best"], 3)
    summary["bounce_ms"] = drained
    summary["synced_p50"] = synced_p50
    summary["bounce_amortization"] = round(
        synced_p50 / max(float(np.median(drained)), 1e-6), 2)
    print("RESULT " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
