"""Round-2 TPU probe #2: windows-vs-gather numerics on device, voice-count
scaling for both fetch paths, and the int16-bank A/B (gather only).

    nohup python tools/tpu_probe2_r2.py > /tmp/tpu_probe2_r2.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(engine, block, warm=6, n=100):
    import jax

    for _ in range(warm):
        res = engine.process_block()
    jax.block_until_ready(res.outputs.master)
    t0 = time.perf_counter()
    for _ in range(n):
        res = engine.process_block()
    jax.block_until_ready(res.outputs.master)
    return (time.perf_counter() - t0) / n * 1e3, res


def main():
    import jax

    import bench

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda a: a + 1)(np.ones(8, np.float32)))
    print(f"fence: {time.perf_counter() - t0:.1f}s", flush=True)

    results = {}

    # 1) numerics: same session, both fetch paths, compare a rendered block
    def render_blocks(fetch, blocks=12):
        engine = bench.build_session(128)
        engine.fetch = fetch
        engine._bank_version_on_device = -1
        outs = []
        for _ in range(blocks):
            res = engine.process_block()
            outs.append(res.outputs.master)
        import jax.numpy as jnp

        return np.asarray(jnp.concatenate(outs, axis=0))

    g = render_blocks("gather")
    w = render_blocks("windows")
    dev = float(np.abs(g - w).max())
    scale = float(np.abs(g).max())
    results["windows_vs_gather_maxdev"] = dev
    results["master_scale"] = scale
    print(f"numerics: maxdev {dev:.3e} on scale {scale:.3f}", flush=True)

    # 2) voice scaling, both paths + int16 gather
    for voices in (96, 256, 1024, 2048):
        row = {}
        for mode in ("gather", "windows", "gather_i16"):
            try:
                engine = bench.build_session(128, num_voices=voices)
                if mode == "gather_i16":
                    engine.fetch = "gather"
                    engine.bank_dtype = "int16"
                else:
                    engine.fetch = mode
                engine._bank_version_on_device = -1
                ms, _ = measure(engine, 128, n=80)
                row[mode] = round(ms, 3)
                print(f"V={voices} {mode}: {ms:.2f} ms/block", flush=True)
            except Exception as e:
                row[mode] = f"error: {e}"
                print(f"V={voices} {mode}: ERROR {e}", flush=True)
        results[f"ms_B128_V{voices}"] = row

    # 3) superblock (1024) for the winner paths
    for mode in ("gather", "windows", "gather_i16"):
        try:
            engine = bench.build_session(1024)
            if mode == "gather_i16":
                engine.fetch = "gather"
                engine.bank_dtype = "int16"
            else:
                engine.fetch = mode
            engine._bank_version_on_device = -1
            ms, _ = measure(engine, 1024, n=50)
            rt = 1024 / 48000 / (ms / 1e3)
            results[f"ms_B1024_{mode}"] = round(ms, 3)
            print(f"B=1024 {mode}: {ms:.2f} ms/block = {rt:.2f}x rt", flush=True)
        except Exception as e:
            results[f"ms_B1024_{mode}"] = f"error: {e}"

    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
