"""Round-2 TPU probe #10: the productized max_pitch_ratio option, end to
end through the engine (bench session content has ratios <= 1.5, so 2.0
and 1.5-capped engines render it identically).

    nohup python tools/tpu_probe10_r2.py > /tmp/tpu_probe10_r2.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
        return (time.perf_counter() - t0) / n * 1e3, res

    # build one engine per r_max; bench.build_session has no kwarg for it,
    # so rebuild with the engine option via monkeypatched AudioEngine default
    from libzl_tpu.engine import engine as engine_mod

    engines = {}
    orig_init = engine_mod.AudioEngine.__init__

    def make(r_max, block):
        def patched(self, *a, **kw):
            kw.setdefault("max_pitch_ratio", r_max)
            orig_init(self, *a, **kw)

        engine_mod.AudioEngine.__init__ = patched
        try:
            e = bench.build_session(block)
        finally:
            engine_mod.AudioEngine.__init__ = orig_init
        e.fetch = "windows"
        e._bank_version_on_device = -1
        return e

    for r_max in (4.0, 2.0, 1.5):
        for block in (128, 1024):
            engines[(r_max, block)] = make(r_max, block)

    results = {}
    master_ref = {}
    for trial in range(3):
        for (r_max, block), e in engines.items():
            n = 100 if block == 128 else 40
            ms, res = run(e, n)
            key = f"B{block}_rmax{r_max}"
            results.setdefault(key, []).append(round(ms, 3))
            print(f"trial {trial} {key}: {ms:.2f} ms", flush=True)
    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
