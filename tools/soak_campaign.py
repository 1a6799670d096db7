"""Long soak campaign: the extended randomized soak across many seeds.

Runs tests/test_soak._soak(extended=True) for N seeds on both backends and
reports any failing seed with its traceback. Not part of CI (runtime); run
ad hoc when hunting for rare state-machine bugs:

    nohup python tools/soak_campaign.py 40 [seed_offset] > /tmp/soak_campaign.log 2>&1 &
"""

import os
import sys
import tempfile
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    seed_offset = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    # force CPU before anything imports jax engine paths
    import jax

    jax.config.update("jax_platforms", "cpu")
    from test_soak import _soak

    failures = []
    t_start = time.time()
    for seed in range(seed_offset, seed_offset + n_seeds):
        for backend, blocks in (("numpy", 2500), ("jax", 500)):
            t0 = time.time()
            try:
                with tempfile.TemporaryDirectory() as td:
                    _soak(backend, blocks, seed + 10_000, extended=True,
                          tmp_dir=td)
                print(f"seed {seed} {backend}: OK ({time.time()-t0:.1f}s)",
                      flush=True)
            except Exception:
                failures.append((seed, backend))
                print(f"seed {seed} {backend}: FAILED", flush=True)
                traceback.print_exc()
    print(f"campaign done in {time.time()-t_start:.0f}s: "
          f"{n_seeds * 2 - len(failures)}/{n_seeds * 2} passed", flush=True)
    if failures:
        print("FAILING SEEDS:", failures, flush=True)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
