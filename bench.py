"""Engine benchmark: the BASELINE.json north-star configuration.

Renders the full engine pipeline — 1024 sampler voices (64 looped clips +
sampler polyphony across 12 channels) at 48 kHz — on the current JAX backend
(the real TPU chip under the driver) and reports sustained throughput.

Two operating modes are exercised:
- throughput: 1024-frame super-blocks (the bounce/serving configuration;
  scattered window DMAs, program uploads and dispatch overhead amortize 8x)
- latency:    128-frame blocks, per-block p50 wall time (the live-play
  configuration; printed as a side metric)

Baseline context: the reference engine is engineered to sustain 96 voices
(12 channels x 8 voices, lib/SamplerSynth.cpp:23) at 1.0x realtime on its
target device. `vs_baseline` therefore reports voice-throughput relative to
that envelope: (voices * realtime_factor) / 96.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Environment note: the first device->host transfer through this harness's
TPU relay stalls for minutes (a relay artifact, not engine time); the
benchmark pays that cost up front in a fence, outside any timed region.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

NUM_VOICES = 1024
NUM_CLIPS = 64
SAMPLE_RATE = 48000
SUPER_BLOCK = 1024
LIVE_BLOCK = 128


def fence():
    """Force the relay's one-time first-D2H initialization outside timing."""
    import jax
    import jax.numpy as jnp

    x = jax.jit(lambda a: a + 1)(jnp.ones(8))
    t0 = time.perf_counter()
    np.asarray(x)
    return time.perf_counter() - t0


def build_session(block_frames: int, num_voices: int = NUM_VOICES,
                  active_voices: int = 0):
    from libzl_tpu.engine.commands import ClipCommand
    from libzl_tpu.engine.engine import AudioEngine
    from libzl_tpu.io.wav import AudioData
    from libzl_tpu.models.clip import ClipAudioSource

    engine = AudioEngine(
        sample_rate=SAMPLE_RATE,
        block_frames=block_frames,
        num_voices=num_voices,
        backend="jax",
    )
    engine.start_transport(bpm=120)

    rng = np.random.default_rng(0)
    clips = []
    for i in range(NUM_CLIPS):
        seconds = float(rng.uniform(0.4, 2.0))
        t = np.arange(int(SAMPLE_RATE * seconds)) / SAMPLE_RATE
        freq = 110.0 * (2.0 ** (i % 24 / 12.0))
        wave = (
            0.25 * np.sin(2 * np.pi * freq * t)
            + 0.1 * np.sin(2 * np.pi * 2 * freq * t)
        ).astype(np.float32)[:, None]
        clips.append(ClipAudioSource(engine, audio=AudioData(wave, SAMPLE_RATE)))

    for v in range(active_voices or num_voices):
        clip = clips[v % NUM_CLIPS]
        cmd = ClipCommand.channel(clip.id, v % 10)
        # distinct notes per (clip, channel) pair so no commands coalesce
        # away (equivalentTo merging) and the full pool plays
        cmd.midi_note = 48 + (v // 320) * 5 + int(rng.integers(0, 5))
        cmd.change_volume = True
        cmd.volume = float(rng.uniform(0.3, 1.0))
        cmd.looping = True
        cmd.start_playback = True
        engine.schedule_clip_command(cmd, 0)
    return engine


def measure_throughput(
    rounds: int = 5, blocks_per_round: int = 80
) -> tuple[float, int, list[float]]:
    """Sustained throughput, measured as `rounds` independent timed rounds
    on one warm engine. Returns (median_round_rt, active_voices, all_rounds).

    Median-of-rounds headline, not one long pass: this harness's relay
    exhibits transient multi-x slowdowns uncorrelated with the workload
    (NOTES_TPU_ENV.md) — a stall poisons a single long measurement; the
    median of independent rounds tolerates a poisoned round while staying
    a defensible central estimate (the best round and the full band are
    reported alongside for transparency)."""
    import jax

    engine = build_session(SUPER_BLOCK)
    for _ in range(10):
        res = engine.process_block()
    jax.block_until_ready(res.outputs.master)
    active = int(engine.pool.active.sum())

    rendered = blocks_per_round * SUPER_BLOCK / SAMPLE_RATE
    rts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        last = None
        for _ in range(blocks_per_round):
            last = engine.process_block()
        jax.block_until_ready(last.outputs.master)
        rts.append(rendered / (time.perf_counter() - t0))
    return float(np.median(rts)), active, [round(x, 3) for x in rts]


def measure_live_mode(blocks: int = 300) -> dict:
    """The live-play configuration (128-frame blocks), split honestly:

    - rt_liveblock: realtime factor with blocks chained and ONE sync at the
      end — the dispatch-to-done device+host pipeline cost per block, i.e.
      what a pipelined pump (capi/bridge, LIBZL_TPU_PIPELINE) sustains.
    - device_ms_p50: per-block cost in that chained regime.
    - latency_p50_ms: per-block wall time with a sync EVERY block — on this
      harness's relay that includes a ~30 ms per-D2H round trip that a
      directly-attached host does not pay (NOTES_TPU_ENV.md).
    - sync_ms_p50: the difference, attributed to the device->host sync.
    """
    import jax

    engine = build_session(LIVE_BLOCK)
    for _ in range(20):
        res = engine.process_block()
    jax.block_until_ready(res.outputs.master)

    # chained: one sync per round — best of 5 rounds (B=128 timings drift
    # up to ~1.9x within a process, NOTES_TPU_ENV.md; the best sustained
    # round is the device capability)
    per_round = max(blocks // 5, 1)
    round_ms = []
    for _ in range(5):
        t0 = time.perf_counter()
        last = None
        for _ in range(per_round):
            last = engine.process_block()
        jax.block_until_ready(last.outputs.master)
        round_ms.append((time.perf_counter() - t0) / per_round * 1e3)
    device_ms = min(round_ms)
    rt_live = LIVE_BLOCK / SAMPLE_RATE / (device_ms * 1e-3)

    # synced: pay the round trip every block (what a naive pump would do)
    times = []
    for _ in range(blocks):
        t0 = time.perf_counter()
        res = engine.process_block()
        jax.block_until_ready(res.outputs.master)
        times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(np.asarray(times) * 1e3, 50))

    # bounce drain (LIBZL_TPU_BOUNCE_DRAIN analog): fetch K blocks' master
    # mixes in ONE device->host transfer — the sync is a fixed-cost round
    # trip, so the bounce path amortizes it K-fold vs the synced loop
    import jax.numpy as jnp

    K = 32  # matches the bridge's auto bounce drain depth
    drained = []
    for _ in range(10):
        t0 = time.perf_counter()
        masters = [engine.process_block().outputs.master for _ in range(K)]
        np.asarray(jnp.concatenate(masters, axis=0))
        drained.append((time.perf_counter() - t0) / K * 1e3)
    bounce_ms = float(np.percentile(np.asarray(drained), 50))

    # kernel-only: the live windows kernel with DEVICE-RESIDENT inputs
    # (one real per-block program, device_put once, re-dispatched in a
    # chained loop). This is the number the roofline bound applies to —
    # device_ms_p50 above additionally carries per-block host build +
    # program upload + the lookahead path's dispatch share, which are
    # pipeline costs, not kernel time (NOTES_TPU_ENV.md round-4 bench
    # entry; tools/tpu_probe4_r4.py "resident" cell is the same pattern).
    kernel_ms = -1.0
    try:
        kernel_ms = _measure_kernel_resident(engine)
    except Exception:
        pass
    return dict(
        rt_liveblock=round(rt_live, 3),
        device_ms_p50=round(device_ms, 3),
        latency_p50_ms=round(p50, 3),
        sync_ms_p50=round(max(p50 - device_ms, 0.0), 3),
        bounce_ms_per_block=round(bounce_ms, 3),
        bounce_sync_amortization=round(p50 / max(bounce_ms, 1e-6), 2),
        kernel_ms_p50=round(kernel_ms, 3),
    )


def _measure_kernel_resident(engine, rounds: int = 5, reps: int = 32) -> float:
    """Per-block cost of the live render kernel alone: one real program
    (built by the host voice machine at the engine's current state),
    device-resident, re-dispatched `reps` times per timed round with one
    sync at the end. Median of rounds. Pool state is save/restored around
    the host sim so the caller's session is untouched."""
    import jax

    from libzl_tpu.engine import hostcore
    from libzl_tpu.engine import render as render_mod
    from libzl_tpu.ops import voice as voice_ops

    snap = engine.pool.save_state()
    pi, pf, _ = hostcore.voice_update(
        engine.pool,
        block_start_sample=float(engine.clock.sample_position),
        tick_anchor_sample=engine.clock.anchor_sample,
        tick_anchor=engine.clock.anchor_tick,
        samples_per_tick=engine.clock.samples_per_tick,
        lane_enabled=engine.lane_enabled,
    )
    engine.pool.restore_state(snap)
    rmax = engine._render_rmax(pi, pf)
    fused = jax.device_put(voice_ops.fuse_packed(pi, pf))
    sound = engine._sound_data_for_backend()
    strips = engine._packed_strips_for_backend()
    kw = dict(block_frames=LIVE_BLOCK, quirk_gain=engine.quirk_gain,
              fetch=engine.fetch, max_pitch_ratio=rmax)
    out = render_mod.render_block_fused(sound, fused, strips, **kw)
    jax.block_until_ready(out.master)
    round_ms = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = render_mod.render_block_fused(sound, fused, strips, **kw)
        jax.block_until_ready(out.master)
        round_ms.append((time.perf_counter() - t0) / reps * 1e3)
    return float(np.median(round_ms))


def measure_sparse_session(blocks: int = 200) -> float:
    """The bucketed-dispatch configuration: a reference-scale session (96
    live voices, lib/SamplerSynth.cpp:23) on the full 1024-voice pool.
    voice_buckets="auto" renders only the 128-voice prefix — measured
    29-36% faster than full-pool dispatch (NOTES probe 21 re-run). Live
    128-frame blocks, chained regime, best of 4 rounds."""
    import jax

    engine = build_session(LIVE_BLOCK, num_voices=NUM_VOICES,
                           active_voices=96)
    for _ in range(10):
        res = engine.process_block()
    jax.block_until_ready(res.outputs.master)
    per_round = max(blocks // 4, 1)
    best_ms = None
    for _ in range(4):
        t0 = time.perf_counter()
        last = None
        for _ in range(per_round):
            last = engine.process_block()
        jax.block_until_ready(last.outputs.master)
        ms = (time.perf_counter() - t0) / per_round * 1e3
        best_ms = ms if best_ms is None else min(best_ms, ms)
    return LIVE_BLOCK / SAMPLE_RATE / (best_ms * 1e-3)


def measure_reference_headline(blocks: int = 400) -> float:
    """The reference's own headline configuration: 96 voices (12 channels x
    8, lib/SamplerSynth.cpp:23) at 48 kHz — rendered here in 1024-frame
    super-blocks. The reference sustains this at 1.0x realtime on its target
    device; this reports our realtime factor for the same polyphony."""
    import jax

    engine = build_session(SUPER_BLOCK, num_voices=96)
    for _ in range(10):
        res = engine.process_block()
    jax.block_until_ready(res.outputs.master)
    rts = []
    for _ in range(4):
        t0 = time.perf_counter()
        last = None
        for _ in range(blocks // 4):
            last = engine.process_block()
        jax.block_until_ready(last.outputs.master)
        rts.append(blocks // 4 * SUPER_BLOCK / SAMPLE_RATE
                   / (time.perf_counter() - t0))
    return max(rts)


def main() -> int:
    fence_s = fence()
    rt_factor, active, rounds = measure_throughput()
    try:
        rt_96 = measure_reference_headline()
    except Exception:
        rt_96 = -1.0
    try:
        live = measure_live_mode()
    except Exception:
        live = dict(rt_liveblock=-1.0, device_ms_p50=-1.0,
                    latency_p50_ms=-1.0, sync_ms_p50=-1.0)
    try:
        rt_sparse = measure_sparse_session()
    except Exception:
        rt_sparse = -1.0
    # Roofline accounting in the driver record (VERDICT r3 #6): the
    # binding hardware bound for the live-block windows kernel at this
    # session's dispatch config (rung 2.0 — the bench notes stay within
    # +7 semitones, so the ratio ladder dispatches the narrow slab).
    # pct_of_bound compares that bound against the KERNEL-ONLY measured
    # cell (device-resident inputs, kernel_ms_p50) — the quantity the
    # bound actually bounds; bound_pct_of_block is the same bound as a
    # fraction of the full chained per-block cost (device_ms_p50), whose
    # remainder is host build + upload + dispatch share, not kernel time
    # (the round-3/round-4 decomposition, tools/tpu_probe1_r3.py and
    # tpu_probe4_r4.py).
    kernel_bound_ms = -1.0
    pct_of_bound = -1.0
    bound_pct_of_block = -1.0
    try:
        from tools.roofline_r3 import windows_model

        w = windows_model(NUM_VOICES, LIVE_BLOCK, r_max=2.0)
        kernel_bound_ms = max(
            w["t_vpu"], w["t_hbm"], w["t_mxu_stream"]
        ) * 1e3
        kern = float(live.get("kernel_ms_p50") or 0)
        if kern > 0:
            pct_of_bound = 100.0 * kernel_bound_ms / kern
        dev = float(live.get("device_ms_p50") or 0)
        if dev > 0:
            bound_pct_of_block = 100.0 * kernel_bound_ms / dev
    except Exception:
        pass
    result = {
        "metric": f"realtime_factor_{active}voices_{NUM_CLIPS}clips_48k",
        "value": round(rt_factor, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rt_factor * active / 96.0, 2),
        "rt_superblock": round(rt_factor, 3),
        "rt_superblock_best": round(float(np.max(rounds)), 3),
        "rt_superblock_rounds": rounds,
        **live,
        "kernel_bound_ms": round(kernel_bound_ms, 3),
        "pct_of_bound": round(pct_of_bound, 1),
        "bound_pct_of_block": round(bound_pct_of_block, 1),
        "realtime_factor_96voices": round(rt_96, 3),
        "rt_liveblock_96on1024_bucketed": round(rt_sparse, 3),
        "fence_seconds": round(fence_s, 1),
    }
    print(json.dumps(result))
    return 0


def _run_with_retries(attempts: int = 4) -> int:
    """Re-exec the measurement in fresh child processes, retrying on
    failure. The harness's TPU relay intermittently refuses backend init
    ("Unable to initialize backend 'axon': UNAVAILABLE", observed
    2026-08-18 after a 35-min hang) and jax caches a failed backend for
    the process lifetime — a retry must be a NEW process. Only the
    successful child prints to stdout (the one JSON line the driver
    reads); failures go to stderr. A deterministic bug still fails all
    attempts and exits nonzero."""
    import os
    import subprocess

    env = dict(os.environ, _LIBZL_BENCH_CHILD="1")
    for attempt in range(attempts):
        if attempt:
            delay = 60 * attempt
            print(f"bench attempt {attempt} failed; retrying in {delay}s "
                  "(relay outages are transient)", file=sys.stderr)
            time.sleep(delay)
        try:
            # Generous per-attempt cap: slow-family fences alone run up to
            # ~21 min (NOTES_TPU_ENV.md), so only a true wedge hits this.
            # Child stdout is CAPTURED and forwarded only once a result is
            # accepted: the driver reads exactly one JSON line, and a child
            # that prints its line then dies in teardown must not leave a
            # duplicate behind a retry.
            proc = subprocess.run([sys.executable, __file__], env=env,
                                  timeout=3600, stdout=subprocess.PIPE,
                                  text=True)
        except subprocess.TimeoutExpired:
            print("bench attempt timed out after 3600s (relay wedge); "
                  "child killed", file=sys.stderr)
            continue
        out = proc.stdout or ""
        result_line = _extract_result_line(out)
        if proc.returncode == 0 or result_line:
            # nonzero exit WITH a complete result line = the measurement
            # finished and the process crashed on the way out (relay
            # threads at interpreter teardown) — accept rather than burn
            # another full attempt re-measuring a number we already have
            if proc.returncode != 0:
                print(f"bench child exited {proc.returncode} after "
                      "printing its result; accepting the measurement",
                      file=sys.stderr)
            sys.stdout.write((result_line or out.strip()) + "\n")
            sys.stdout.flush()
            return 0
        if out.strip():
            print(f"bench child stdout (discarded): {out.strip()}",
                  file=sys.stderr)
    return 1


def _extract_result_line(out: str) -> str:
    """Return the last stdout line that parses as a bench result JSON
    object (has the driver-contract keys), or ''."""
    for line in reversed(out.strip().splitlines()):
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if isinstance(obj, dict) and {"metric", "value", "unit"} <= set(obj):
            return line.strip()
    return ""


if __name__ == "__main__":
    import os

    if os.environ.get("_LIBZL_BENCH_CHILD"):
        sys.exit(main())
    sys.exit(_run_with_retries())
