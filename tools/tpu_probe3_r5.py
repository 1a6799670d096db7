"""Round-5 TPU probe #3: the worker-side speculative build (HEAD).

Round-4 design paid ~3.9 ms on the ENGINE thread in the spec-build block
(host sim + closure setup inline; only the upload rode the worker —
tools/tpu_probe2_r5.py kind stats). HEAD moves the WHOLE build (sim on a
dedicated spec pool + fuse/bucket/rung + upload/enqueue) onto the
dispatch worker (engine._maybe_build_spec). Cells, one process:

  eng_ms_blk   chained quiet end-to-end ms/block incl. trailing device
               sync (VERDICT r4 #2 target: <= 0.9 at V=1024/B=128)
  kinds        per-kind host wall p50/mean/max WITHOUT trailing sync —
               the spec block should collapse ~3.9 -> ~0.1 ms
  adopt_wait   time _adopt_spec spends blocked in future.result() —
               the pipeline headroom (worker build+upload vs 14 emits)

    nohup python tools/tpu_probe3_r5.py > /tmp/tpu_probe3_r5.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V = int(os.environ.get("LIBZL_PROBE_V", "1024") or 1024)
B = 128
ROUNDS = int(os.environ.get("LIBZL_PROBE_ROUNDS", "6") or 6)
CHAIN_BLOCKS = 160


def fence():
    import jax
    import jax.numpy as jnp

    x = jax.jit(lambda a: a + 1)(jnp.ones(8))
    t0 = time.perf_counter()
    np.asarray(x)
    print(f"fence {time.perf_counter() - t0:.1f}s", flush=True)


def kind_stats(walls, kinds):
    by = {}
    for k, w in zip(kinds, walls):
        by.setdefault(k, []).append(w)
    return {k: dict(n=len(v), p50=round(float(np.percentile(v, 50)), 3),
                    mean=round(float(np.mean(v)), 3),
                    max=round(float(np.max(v)), 2))
            for k, v in sorted(by.items())}


def main():
    fence()
    import jax

    import bench

    eng = bench.build_session(B, num_voices=V)
    print(f"backend={jax.default_backend()} fetch={eng.fetch} "
          f"la={eng._lookahead} native_host={eng.use_native_host}",
          flush=True)
    last = None
    for _ in range(24):
        last = eng.process_block()
    jax.block_until_ready(last.outputs.master)

    # adopt-wait spy: how long the engine thread blocks on the worker
    adopt_waits = []
    orig_adopt = type(eng)._adopt_spec

    def spy_adopt(self):
        t0 = time.perf_counter()
        out = orig_adopt(self)
        adopt_waits.append((time.perf_counter() - t0) * 1e3)
        return out

    eng._adopt_spec = spy_adopt.__get__(eng)

    results = {"eng_ms_blk": [], "adopt_p50": [], "adopt_max": []}
    for r in range(ROUNDS):
        eng._discard_horizon()
        adopt_waits.clear()
        walls, kinds = [], []
        t0 = time.perf_counter()
        for _ in range(CHAIN_BLOCKS):
            tb = time.perf_counter()
            last = eng.process_block()
            walls.append((time.perf_counter() - tb) * 1e3)
            kinds.append(eng.slo.last_kind)
        jax.block_until_ready(last.outputs.master)
        results["eng_ms_blk"].append(
            (time.perf_counter() - t0) / CHAIN_BLOCKS * 1e3)
        aw = adopt_waits or [0.0]
        results["adopt_p50"].append(float(np.percentile(aw, 50)))
        results["adopt_max"].append(float(np.max(aw)))
        print(f"round {r}: eng_ms_blk={results['eng_ms_blk'][-1]:.3f} "
              f"adopt p50={results['adopt_p50'][-1]:.3f} "
              f"max={results['adopt_max'][-1]:.2f} n={len(aw)}", flush=True)
        print(f"  kinds {json.dumps(kind_stats(walls, kinds))}", flush=True)

    out = {k: dict(median=round(float(np.median(v)), 3),
                   all=[round(x, 3) for x in v])
           for k, v in results.items()}
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
