"""Round-2 TPU probe #9: STATIC slab-size hypothesis. Monkeypatch the
windows kernel to R_MAX=2/SLAB=384 (valid for this session's ratios <= 1.5)
and A/B against the stock R_MAX=4/SLAB=768 and gather. If the small static
slab wins big, a `max_pitch_ratio` engine option is worth productizing;
if not, the weight build is NOT the dominant cost and the kernel is at its
design point.

    nohup python tools/tpu_probe9_r2.py > /tmp/tpu_probe9_r2.log 2>&1 &
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
    from libzl_tpu.engine import render as render_mod
    from libzl_tpu.ops import fetch_pallas as fp

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

    def set_rmax(r_max, slab):
        fp.R_MAX = r_max
        fp.SLAB = slab
        fp.fetch_interp.clear_cache()
        render_mod.render_block_packed.clear_cache()

    results = {}
    B = 1024
    e = bench.build_session(B)
    e.fetch = "windows"
    e._bank_version_on_device = -1
    eg = bench.build_session(B)
    eg.fetch = "gather"
    eg._bank_version_on_device = -1

    for trial in range(3):
        ms = run(eg, 40)
        results.setdefault("gather", []).append(round(ms, 3))
        print(f"trial {trial} gather: {ms:.2f} ms", flush=True)
        for (r_max, slab) in ((4.0, 768), (2.0, 384), (1.0, 256)):
            set_rmax(r_max, slab)
            try:
                ms = run(e, 40)
                key = f"windows_slab{slab}"
                results.setdefault(key, []).append(round(ms, 3))
                print(f"trial {trial} slab={slab}: {ms:.2f} ms", flush=True)
            except Exception as ex:
                results.setdefault(f"windows_slab{slab}", []).append(
                    f"error: {ex}"
                )
                print(f"trial {trial} slab={slab}: ERROR {ex}", flush=True)
    set_rmax(4.0, 768)
    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
