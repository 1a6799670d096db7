"""Round-3 TPU probe #1: decompose the B=128 live-block cost (VERDICT r2 #1).

BENCH_r02: device_ms_p50 = 2.86 ms at 1024 voices vs the 2.67 ms budget.
Where does it go? One process, interleaved rounds (the only trustworthy
A/B on this relay — NOTES_TPU_ENV.md), chained regime, configs:

  eng          engine.process_block chained (windows/grid default)
  eng_nodisp   engine.process_block with _dispatch_packed stubbed to a
               cached result -> pure host cost (tick walk, program build,
               router, bucket math)
  jit_h2d      render_block_packed called directly with HOST numpy program
               args (implicit H2D per call) -> eng minus host build
  jit_direct   same but all args device-resident -> jit_h2d minus H2D
  fused_out    jit_direct graph but ONE concatenated flat output instead
               of 9 arrays (does per-output result handling cost?)
  graph_zero   render graph with fetch_interp patched to zeros -> graph
               minus the Pallas kernel
  fetch_only   jit(fetch_interp) alone, device-resident args
  fetch_2048   fetch_only at V=2048 (does the kernel scale with V?)
  trivial      jit(x + 1) on a [1024, 128] array -> chained dispatch floor

    nohup python tools/tpu_probe1_r3.py > /tmp/tpu_probe1_r3.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 128
V = 1024
ROUNDS = 6
BLOCKS = 40


def chained(fn, n=BLOCKS):
    import jax

    t0 = time.perf_counter()
    last = None
    for _ in range(n):
        last = fn()
    jax.block_until_ready(last)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from libzl_tpu.engine import render as render_mod
    from libzl_tpu.ops import fetch_pallas
    from libzl_tpu.ops.voice import pack_program

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda a: a + 1)(np.ones(8, np.float32)))
    print(f"fence: {time.perf_counter() - t0:.1f}s", flush=True)

    eng = bench.build_session(B, num_voices=V)
    for _ in range(8):
        res = eng.process_block()
    jax.block_until_ready(res.outputs.master)
    print("eng warm; active =", int(eng.pool.active.sum()), flush=True)

    # frozen mid-session program for the direct-jit configs
    from libzl_tpu.engine import hostcore as _hostcore

    prog_i, prog_f, _ = _hostcore.voice_update(
        eng.pool, lane_enabled=eng.lane_enabled,
        block_start_sample=float(eng.clock.sample_position),
        tick_anchor_sample=eng.clock.anchor_sample,
        tick_anchor=eng.clock.anchor_tick,
        samples_per_tick=eng.clock.samples_per_tick,
    )
    sound = eng._sound_data_for_backend()
    strips = eng._packed_strips_for_backend()
    prog_i_d = jax.device_put(prog_i)
    prog_f_d = jax.device_put(prog_f)

    kw = dict(block_frames=B, quirk_gain=False, fetch=eng.fetch,
              max_pitch_ratio=eng.max_pitch_ratio)

    def jit_h2d():
        return render_mod.render_block_packed(
            sound, prog_i, prog_f, strips, **kw).master

    def jit_direct():
        return render_mod.render_block_packed(
            sound, prog_i_d, prog_f_d, strips, **kw).master

    @jax.jit
    def _fused(sound, pi, pf, sp):
        out = render_mod.render_block_packed(sound, pi, pf, sp, **kw)
        return jnp.concatenate([jnp.ravel(x) for x in out])

    def fused_out():
        return _fused(sound, prog_i_d, prog_f_d, strips)

    # graph minus kernel: patch fetch_interp to zeros under a distinct
    # static fetch string so jit traces a fresh graph
    real_fetch_interp = fetch_pallas.fetch_interp

    def zero_fetch(sound_data, pos_local, alpha, wa, wb, **kwargs):
        Vv, Bb = pos_local.shape
        return jnp.zeros((Vv, 2, Bb), jnp.float32)

    kw_zero = dict(kw)
    kw_zero["fetch"] = "windows:highest"  # same semantics, fresh cache key

    def graph_zero():
        return render_mod.render_block_packed(
            sound, prog_i_d, prog_f_d, strips, **kw_zero).master

    fetch_pallas.fetch_interp = zero_fetch
    jax.block_until_ready(graph_zero())
    fetch_pallas.fetch_interp = real_fetch_interp

    # fetch-only inputs: window-relative positions from the real program
    from libzl_tpu.ops.voice import unpack_program, positions_block

    progu = unpack_program(prog_i, prog_f)
    pos_int, alpha_np, seg_idx = positions_block(np, progu, B)
    region = fetch_pallas.region_rows(B, eng.max_pitch_ratio)
    in_a = seg_idx == 0
    anchor = np.where(in_a, progu.win_blk_a[:, None], progu.win_blk_b[:, None])
    pos_local = (
        pos_int + progu.base[:, None] - anchor * fetch_pallas.SOUND_BLOCK
        + np.where(in_a, 0, region)
    ).astype(np.int32)
    pos_d = jax.device_put(pos_local)
    alpha_d = jax.device_put(alpha_np.astype(np.float32))
    wa_d = jax.device_put(np.asarray(progu.win_blk_a, np.int32))
    wb_d = jax.device_put(np.asarray(progu.win_blk_b, np.int32))

    def fetch_only():
        return fetch_pallas.fetch_interp(
            sound, pos_d, alpha_d, wa_d, wb_d, block_frames=B,
            r_max=eng.max_pitch_ratio)

    pos2 = jax.device_put(np.tile(pos_local, (2, 1)))
    alpha2 = jax.device_put(np.tile(alpha_np.astype(np.float32), (2, 1)))
    wa2 = jax.device_put(np.tile(np.asarray(progu.win_blk_a, np.int32), 2))
    wb2 = jax.device_put(np.tile(np.asarray(progu.win_blk_b, np.int32), 2))

    def fetch_2048():
        return fetch_pallas.fetch_interp(
            sound, pos2, alpha2, wa2, wb2, block_frames=B,
            r_max=eng.max_pitch_ratio)

    xt = jax.device_put(np.zeros((V, B), np.float32))
    triv = jax.jit(lambda x: x + 1.0)

    def trivial():
        return triv(xt)

    # host-only: stub the dispatch with the last real outputs
    cached = res.outputs

    def eng_nodisp():
        saved = eng._dispatch_packed
        eng._dispatch_packed = lambda *a, **k: cached
        try:
            return eng.process_block().outputs.master
        finally:
            eng._dispatch_packed = saved

    def eng_real():
        return eng.process_block().outputs.master

    configs = [
        ("eng", eng_real),
        ("eng_nodisp", eng_nodisp),
        ("jit_h2d", jit_h2d),
        ("jit_direct", jit_direct),
        ("fused_out", fused_out),
        ("graph_zero", graph_zero),
        ("fetch_only", fetch_only),
        ("fetch_2048", fetch_2048),
        ("trivial", trivial),
    ]
    # warm every config (compiles happen here, not in timed rounds)
    for name, fn in configs:
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        print(f"warm {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    results = {name: [] for name, _ in configs}
    for r in range(ROUNDS):
        for name, fn in configs:
            ms = chained(fn)
            results[name].append(round(ms, 3))
        print(f"round {r}: " + " ".join(
            f"{n}={results[n][-1]:.2f}" for n, _ in configs), flush=True)

    summary = {
        n: dict(median=round(float(np.median(v)), 3),
                best=round(float(np.min(v)), 3), rounds=v)
        for n, v in results.items()
    }
    print("RESULT " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
