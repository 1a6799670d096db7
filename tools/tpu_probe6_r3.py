"""Round-3 TPU probe #6: re-probe sub-128 slab alignment (a64) on the
current Mosaic toolchain.

Probes 17/18 (round 2) rejected a64/a32: the toolchain refused <128-aligned
lane slices. NOTES says re-probe each round — if the toolchain now accepts
them, slab shrinks 768->640 at rmax 4.0 and 512->384 at the ratio-ladder's
2.0 rung, cutting the binding skinny-dot stream bound proportionally.

    nohup python tools/tpu_probe6_r3.py > /tmp/tpu_probe6_r3.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V = 1024
B = 1024
ROUNDS = 6
BLOCKS = 16


def chained(eng, n=BLOCKS):
    import jax

    t0 = time.perf_counter()
    last = None
    for _ in range(n):
        last = eng.process_block()
    jax.block_until_ready(last.outputs.master)
    return (time.perf_counter() - t0) / n * 1e3


def build(**over):
    import bench
    from libzl_tpu.engine.engine import AudioEngine

    saved = AudioEngine.__init__

    def patched(self, *a, **kw):
        kw.update(over)
        saved(self, *a, **kw)

    AudioEngine.__init__ = patched
    try:
        return bench.build_session(B, num_voices=V)
    finally:
        AudioEngine.__init__ = saved


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda a: a + 1)(np.ones(8, np.float32)))
    print(f"fence: {time.perf_counter() - t0:.1f}s", flush=True)

    engines = {}
    for name, fetch in (("a128", None), ("a64", "windows:a64")):
        over = {} if fetch is None else dict(fetch=fetch)
        try:
            eng = build(**over)
            t0 = time.perf_counter()
            for _ in range(6):
                res = eng.process_block()
            jax.block_until_ready(res.outputs.master)
            print(f"warm {name}: {time.perf_counter() - t0:.1f}s "
                  f"(fetch={eng.fetch} ladder={eng._ratio_ladder})",
                  flush=True)
            engines[name] = eng
        except Exception as e:
            print(f"{name} REJECTED by toolchain: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    results = {n: [] for n in engines}
    for r in range(ROUNDS):
        for name, eng in engines.items():
            results[name].append(round(chained(eng), 3))
        print(f"round {r}: " + " ".join(
            f"{n}={results[n][-1]:.2f}" for n in engines), flush=True)

    summary = {
        n: dict(median=round(float(np.median(v)), 3),
                best=round(float(np.min(v)), 3), rounds=v)
        for n, v in results.items()
    }
    if "a64" in summary and "a128" in summary:
        summary["a64_vs_a128"] = round(
            summary["a64"]["median"] / summary["a128"]["median"], 3)
    print("RESULT " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
