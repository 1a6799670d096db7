"""Round-5 TPU probe #2: where does the chained quiet 1.1 ms/block go?

CPU profiling shows the emit-block host path is ~0.03 ms (cProfile,
2026-08-20), yet the chained quiet loop measures ~1.1 ms/block through
the relay (tpu_probe1_r5). Hypothesis: the speculative worker's horizon
upload (~0.58 MB compact dyn through the relay, ~10 ms/horizon) holds
the GIL while it serializes, so "overlap" hides device time but not
Python time — every emit block concurrently pays a GIL-share tax.

Cells (interleaved per round, one process):

  per-kind wall   chained loop,每 block timed + slo.last_kind: emit
                  p50/mean/max, spec/adopt-block cost (if emit p50 >>
                  0.03 ms only while the worker is busy, the GIL tax is
                  proven)
  phase profile   wall by (block index mod H): which emission positions
                  absorb the worker's activity
  spec_off        same chained loop with the spec worker disabled
                  (serial _start_horizon at exhaustion) — the serial
                  alternative's honest per-block cost
  gil_tax         emit-loop wall while a background thread device_puts a
                  dyn-sized buffer in a loop (direct GIL-interference
                  measurement, engine untouched)

    nohup python tools/tpu_probe2_r5.py > /tmp/tpu_probe2_r5.log 2>&1 &
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V = int(os.environ.get("LIBZL_PROBE_V", "1024") or 1024)
B = 128
ROUNDS = int(os.environ.get("LIBZL_PROBE_ROUNDS", "4") or 4)
CHAIN_BLOCKS = 160


def fence():
    import jax
    import jax.numpy as jnp

    x = jax.jit(lambda a: a + 1)(jnp.ones(8))
    t0 = time.perf_counter()
    np.asarray(x)
    print(f"fence {time.perf_counter() - t0:.1f}s", flush=True)


def chained(eng, jax, blocks=CHAIN_BLOCKS):
    """Timed chained loop; returns (per-block ms list, kind list)."""
    walls, kinds = [], []
    last = None
    for _ in range(blocks):
        t0 = time.perf_counter()
        last = eng.process_block()
        walls.append((time.perf_counter() - t0) * 1e3)
        kinds.append(eng.slo.last_kind)
    jax.block_until_ready(last.outputs.master)
    return walls, kinds


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
          f"la={eng._lookahead}", flush=True)
    last = None
    for _ in range(24):
        last = eng.process_block()
    jax.block_until_ready(last.outputs.master)

    # gil_tax fixture: a worker thread repeatedly device_puts a
    # dyn-sized int32 buffer (0.58 MB at V=1024/H=16)
    dyn_bytes = V * 9 * 15 * 4  # ~[V, (H-1)*cols] compact dyn footprint
    buf = np.zeros(dyn_bytes // 4, np.int32)
    stop = threading.Event()

    def uploader():
        while not stop.is_set():
            jax.block_until_ready(jax.device_put(buf))

    results = {"eng_ms": [], "spec_off_ms": [], "emit_idle_ms": [],
               "emit_gil_ms": []}
    kind_reports = []
    phase_reports = []
    for r in range(ROUNDS):
        eng._discard_horizon()
        walls, kinds = chained(eng, jax)
        results["eng_ms"].append(float(np.median(walls)))
        kind_reports.append(kind_stats(walls, kinds))
        # phase profile: wall by position within the emission run
        phases = {}
        pos = -1
        for k, w in zip(kinds, walls):
            pos = 0 if k in ("horizon", "event_rebuild") else pos + 1
            phases.setdefault(min(pos, 17), []).append(w)
        phase_reports.append({p: round(float(np.median(v)), 3)
                              for p, v in sorted(phases.items())})

        # spec worker off: serial horizon rebuild at exhaustion
        orig_spec = type(eng)._maybe_build_spec
        type(eng)._maybe_build_spec = lambda self: None
        try:
            eng._discard_horizon()
            walls2, kinds2 = chained(eng, jax)
        finally:
            type(eng)._maybe_build_spec = orig_spec
        results["spec_off_ms"].append(float(np.median(walls2)))

        # direct GIL interference: emit-speed loop with/without uploads.
        # pure-python spin (no engine) so only the GIL is contended
        def spin(ms_budget=120.0):
            t_end = time.perf_counter() + ms_budget / 1e3
            laps = []
            while time.perf_counter() < t_end:
                t0 = time.perf_counter()
                sum(i for i in range(200))
                laps.append((time.perf_counter() - t0) * 1e3)
            return float(np.percentile(laps, 50))

        results["emit_idle_ms"].append(spin())
        stop.clear()
        th = threading.Thread(target=uploader, daemon=True)
        th.start()
        results["emit_gil_ms"].append(spin())
        stop.set()
        th.join()

        print(f"round {r}: eng={results['eng_ms'][-1]:.3f} "
              f"spec_off={results['spec_off_ms'][-1]:.3f} "
              f"spin idle={results['emit_idle_ms'][-1]:.4f} "
              f"gil={results['emit_gil_ms'][-1]:.4f}", flush=True)
        print(f"  kinds {json.dumps(kind_reports[-1])}", flush=True)
        print(f"  phases {json.dumps(phase_reports[-1])}", flush=True)

    out = {k: dict(median=round(float(np.median(v)), 4),
                   all=[round(x, 4) for x in v])
           for k, v in results.items()}
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
