"""Round-2 TPU probe #6: super-block size sweep for bounce throughput.

Bigger blocks amortize program uploads/dispatch further; the windows
kernel's VMEM scratch grows with R_MAX*B (fits to B=4096 at GROUP=8).

    nohup python tools/tpu_probe6_r2.py > /tmp/tpu_probe6_r2.log 2>&1 &
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

    results = {}
    engines = {}
    for B in (1024, 2048, 4096):
        for fetch in ("windows", "gather"):
            try:
                e = bench.build_session(B)
                e.fetch = fetch
                e._bank_version_on_device = -1
                engines[(B, fetch)] = e
            except Exception as ex:
                print(f"build B={B} {fetch}: ERROR {ex}", flush=True)

    for trial in range(3):
        for (B, fetch), e in engines.items():
            n = max(40960 // B, 8)
            try:
                for _ in range(4):
                    res = e.process_block()
                jax.block_until_ready(res.outputs.master)
                t0 = time.perf_counter()
                for _ in range(n):
                    res = e.process_block()
                jax.block_until_ready(res.outputs.master)
                ms = (time.perf_counter() - t0) / n * 1e3
                rt = B / 48000 / (ms / 1e3)
                results.setdefault(f"B{B}_{fetch}", []).append(round(rt, 3))
                print(f"trial {trial} B={B} {fetch}: {ms:.2f} ms = {rt:.2f}x rt",
                      flush=True)
            except Exception as ex:
                results.setdefault(f"B{B}_{fetch}", []).append(f"error: {ex}")
                print(f"trial {trial} B={B} {fetch}: ERROR {ex}", flush=True)
    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
