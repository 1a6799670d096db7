"""Round-4 TPU probe #2: phase-split the stacked-horizon regression.

Probe 1 (tools/tpu_probe1_r4.py) measured the round-4 bit-exact stacked
horizon at 2.53 ms/block quiet (V=1024, B=128) vs round-3's 0.68-0.91 —
a ~3x live-path regression. Candidate costs, split here in ONE process:

  host_build_ms   _start_horizon's host half (H native voice_updates,
                  pack/fuse/concat, per-slice pool snapshots) with the
                  device render stubbed to a cached result
  upload_stack_ms H2D of the [V, H*K] int32 stack the ORIGINAL stacked
                  design shipped (~2.36 MB at V=1024, H=16, K=36) —
                  NOTES probe 1 said H2D latency was size-independent
                  at ~70 KB; this tests 2.4 MB
  upload_compact_ms H2D of what the engine actually ships per horizon at
                  HEAD: base program [V, K] + compact dynamics matrix
  upload_block_ms H2D of one per-block fused program (~148 KB) for scale
  devdisp_ms      the horizon render with DEVICE-RESIDENT program
                  buffers: dispatch + device compute + done-poll for 16
                  per-block renders (144 output buffers)
  full_ms_blk     chained engine quiet ms/block (probe-1 replication)

    nohup python tools/tpu_probe2_r4.py > /tmp/tpu_probe2_r4.log 2>&1 &

HISTORY: the original version of this probe spied on the stacked-design
entry point (render_horizon_fused) and produced the round-4 diagnosis
recorded in NOTES_TPU_ENV.md (stack H2D ~21-33 ms/horizon — the
regression's cause). The engine has since switched to
render_horizon_compact, so the probe now spies on that hot path; the
stacked upload stays as a synthesized comparison cell, and the
interleaved stacked-vs-compact engine A/B lives in tools/tpu_probe4_r4.py.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V = 1024
B = 128
ROUNDS = 5


def fence():
    import jax
    import jax.numpy as jnp

    x = jax.jit(lambda a: a + 1)(jnp.ones(8))
    t0 = time.perf_counter()
    np.asarray(x)
    print(f"fence {time.perf_counter() - t0:.1f}s", flush=True)


def main():
    fence()
    import jax

    import bench
    import libzl_tpu.engine.render as render_mod

    eng = bench.build_session(B)
    print(f"backend={jax.default_backend()} fetch={eng.fetch} "
          f"la={eng._lookahead} ladder={eng._ratio_ladder}", flush=True)
    last = None
    for _ in range(24):
        last = eng.process_block()
    jax.block_until_ready(last.outputs.master)

    # spy on the engine's hot horizon render (the compact entry point) to
    # capture real args / stub it
    orig = render_mod.render_horizon_compact
    cap = {"mode": "capture"}

    def spy(sound, base, dyn, strips, **kw):
        if cap["mode"] == "skip":
            cap["base"], cap["dyn"] = base, dyn
            return cap["outs"]
        cap["args"] = (sound, strips, kw)
        cap["base"], cap["dyn"] = base, dyn
        cap["outs"] = orig(sound, base, dyn, strips, **kw)
        return cap["outs"]

    render_mod.render_horizon_compact = spy
    eng._discard_horizon()
    out = eng._start_horizon()  # capture one real horizon
    jax.block_until_ready(cap["outs"][-1].master)
    sound, strips, kw = cap["args"]
    base0 = np.array(cap["base"])
    dyn0 = np.array(cap["dyn"])
    H = kw.get("slices", 16)
    K = base0.shape[1]
    # the [V, H*K] stack the ORIGINAL stacked design would upload
    stack0 = np.tile(base0, (1, H))
    print(f"base shape={base0.shape} dyn shape={dyn0.shape} "
          f"compact bytes={base0.nbytes + dyn0.nbytes} "
          f"stacked bytes={stack0.nbytes} kw={ {k: v for k, v in kw.items()} }",
          flush=True)

    results = {k: [] for k in
               ("host_build_ms", "upload_stack_ms", "upload_compact_ms",
                "upload_block_ms", "devdisp_ms", "full_ms_blk")}
    REPS = 8
    for r in range(ROUNDS):
        # host half alone: stub the render with the cached outputs
        cap["mode"] = "skip"
        t0 = time.perf_counter()
        for _ in range(REPS):
            eng._start_horizon()
        results["host_build_ms"].append(
            (time.perf_counter() - t0) / REPS * 1e3)

        # H2D of the full stack (fresh buffers each rep to defeat caching)
        stacks = [stack0 + np.int32(i + 1) for i in range(REPS)]
        t0 = time.perf_counter()
        bufs = [jax.device_put(s) for s in stacks]
        jax.block_until_ready(bufs)
        results["upload_stack_ms"].append(
            (time.perf_counter() - t0) / REPS * 1e3)
        del bufs

        # H2D of what the engine actually ships per horizon (base + dyn)
        pairs = [(base0 + np.int32(i + 1), dyn0 + np.int32(i + 1))
                 for i in range(REPS)]
        t0 = time.perf_counter()
        bufs = [jax.device_put(x) for p in pairs for x in p]
        jax.block_until_ready(bufs)
        results["upload_compact_ms"].append(
            (time.perf_counter() - t0) / REPS * 1e3)
        del bufs

        # H2D of one per-block program for scale
        blocks = [base0 + np.int32(i + 1) for i in range(REPS)]
        t0 = time.perf_counter()
        bufs = [jax.device_put(b) for b in blocks]
        jax.block_until_ready(bufs)
        results["upload_block_ms"].append(
            (time.perf_counter() - t0) / REPS * 1e3)
        del bufs

        # dispatch + device compute with device-resident program buffers
        b_dev = jax.device_put(base0)
        d_dev = jax.device_put(dyn0)
        jax.block_until_ready([b_dev, d_dev])
        t0 = time.perf_counter()
        outs = []
        for _ in range(REPS):
            o = orig(sound, b_dev, d_dev, strips, **kw)
            outs.append(o[-1].master)
        jax.block_until_ready(outs)
        results["devdisp_ms"].append(
            (time.perf_counter() - t0) / REPS * 1e3)

        # full engine quiet chained (probe-1 replication)
        cap["mode"] = "capture"
        eng._discard_horizon()
        t0 = time.perf_counter()
        for _ in range(64):
            last = eng.process_block()
        jax.block_until_ready(last.outputs.master)
        results["full_ms_blk"].append(
            (time.perf_counter() - t0) / 64 * 1e3)

        print(f"round {r}: " + " ".join(
            f"{k}={results[k][-1]:.2f}" for k in results), flush=True)

    out = {k: dict(median=round(float(np.median(v)), 3),
                   all=[round(x, 2) for x in v])
           for k, v in results.items()}
    out["stack_bytes"] = int(stack0.nbytes)
    out["compact_bytes"] = int(base0.nbytes + dyn0.nbytes)
    out["H"] = H
    out["K"] = K
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
