"""Post-fix TPU sanity: windows render + max_pitch_ratio variants compile
and run on hardware after the round's final refactors."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    import bench
    from libzl_tpu.engine import engine as engine_mod

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda a: a + 1)(np.ones(8, np.float32)))
    print(f"fence: {time.perf_counter() - t0:.1f}s", flush=True)

    e = bench.build_session(1024)
    print("fetch:", e.fetch, flush=True)
    assert e.fetch == "windows"
    for _ in range(6):
        res = e.process_block()
    jax.block_until_ready(res.outputs.master)
    t0 = time.perf_counter()
    for _ in range(40):
        res = e.process_block()
    jax.block_until_ready(res.outputs.master)
    ms = (time.perf_counter() - t0) / 40 * 1e3
    m = np.asarray(res.outputs.master)
    print(f"default: {ms:.2f} ms/block, peak {np.abs(m).max():.3f}", flush=True)
    assert np.isfinite(m).all() and np.abs(m).max() > 0

    orig = engine_mod.AudioEngine.__init__

    def patched(self, *a, **kw):
        kw.setdefault("max_pitch_ratio", 2.0)
        orig(self, *a, **kw)

    engine_mod.AudioEngine.__init__ = patched
    try:
        e2 = bench.build_session(1024)
    finally:
        engine_mod.AudioEngine.__init__ = orig
    for _ in range(6):
        res2 = e2.process_block()
    jax.block_until_ready(res2.outputs.master)
    t0 = time.perf_counter()
    for _ in range(40):
        res2 = e2.process_block()
    jax.block_until_ready(res2.outputs.master)
    ms2 = (time.perf_counter() - t0) / 40 * 1e3
    print(f"rmax2: {ms2:.2f} ms/block", flush=True)
    print("SANITY OK", flush=True)


if __name__ == "__main__":
    main()
