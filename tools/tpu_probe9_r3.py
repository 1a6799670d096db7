"""Round-3 TPU probe #9: does the persistent XLA compile cache work
through the relay (remote_compile), and what does it do to boot time?

Boot time is the weakest deployment number left (soak #2: 146 s of
warmup with parallel compile jobs). LIBZL_TPU_COMPILE_CACHE is wired but
unmeasured on this toolchain — if compiles happen relay-side the local
cache may capture nothing. Run the SAME warmup twice in subprocesses
sharing one cache dir and compare cold vs warm boot.

    nohup python tools/tpu_probe9_r3.py > /tmp/tpu_probe9_r3.log 2>&1 &
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np
import jax
t_fence0 = time.perf_counter()
np.asarray(jax.jit(lambda a: a + 1)(np.ones(8, np.float32)))
fence = time.perf_counter() - t_fence0
from libzl_tpu.engine.engine import AudioEngine
t0 = time.perf_counter()
eng = AudioEngine(sample_rate=48000, block_frames=128, num_voices=1024,
                  backend="jax")
n = eng.warmup()
warm = time.perf_counter() - t0
print("CHILD", __import__("json").dumps(
    dict(fence=round(fence, 1), warmup=round(warm, 1), shapes=n)),
    flush=True)
"""


def run_child(cache_dir):
    env = dict(os.environ)
    env["LIBZL_TPU_COMPILE_CACHE"] = cache_dir
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, "-c", CHILD % dict(repo=REPO)],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    wall = time.perf_counter() - t0
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("CHILD")]
    print(out.stderr[-500:] if not line else line[0],
          f"wall={wall:.1f}s", flush=True)
    return json.loads(line[0][6:]) if line else None, wall


def main():
    cache = "/tmp/libzl_xla_cache_probe9"
    os.makedirs(cache, exist_ok=True)
    cold, cold_wall = run_child(cache)
    n_entries = len(os.listdir(cache))
    print(f"cache entries after cold boot: {n_entries}", flush=True)
    warm, warm_wall = run_child(cache)
    print("RESULT " + json.dumps(dict(
        cold=cold, warm=warm, cache_entries=n_entries,
        cold_wall=round(cold_wall, 1), warm_wall=round(warm_wall, 1),
        speedup=round((cold["warmup"] / warm["warmup"]), 2)
        if cold and warm else None,
    )), flush=True)


if __name__ == "__main__":
    main()
