"""Round-2 TPU probe #21: bucketed prefix rendering on sparse sessions.

A 1024-voice pool with 96 active voices (the reference's whole envelope,
lib/SamplerSynth.cpp:23): voice_buckets="auto" should render the 128-voice
bucket instead of the full pool. Measures buckets auto-vs-off at B=128
(live) and B=1024 (throughput), order-alternated.

    nohup python tools/tpu_probe21_r2.py > /tmp/tpu_probe21_r2.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ACTIVE = 96


def build_sparse(block_frames, voice_buckets):
    import bench
    from libzl_tpu.engine.commands import ClipCommand
    from libzl_tpu.engine.engine import AudioEngine
    from libzl_tpu.io.wav import AudioData
    from libzl_tpu.models.clip import ClipAudioSource

    engine = AudioEngine(
        sample_rate=bench.SAMPLE_RATE, block_frames=block_frames,
        num_voices=1024, backend="jax", voice_buckets=voice_buckets,
    )
    engine.start_transport(bpm=120)
    rng = np.random.default_rng(0)
    clips = []
    for i in range(16):
        seconds = float(rng.uniform(0.4, 2.0))
        t = np.arange(int(bench.SAMPLE_RATE * seconds)) / bench.SAMPLE_RATE
        freq = 110.0 * (2.0 ** (i % 24 / 12.0))
        wave = (0.25 * np.sin(2 * np.pi * freq * t)).astype(np.float32)[:, None]
        clips.append(ClipAudioSource(
            engine, audio=AudioData(wave, bench.SAMPLE_RATE)))
    for v in range(ACTIVE):
        cmd = ClipCommand.channel(clips[v % 16].id, v % 10)
        cmd.midi_note = 48 + (v // 320) * 5 + int(rng.integers(0, 5))
        cmd.change_volume = True
        cmd.volume = float(rng.uniform(0.3, 1.0))
        cmd.looping = True
        cmd.start_playback = True
        engine.schedule_clip_command(cmd, 0)
    return engine


def main():
    import jax

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

    engines = {}
    for block in (128, 1024):
        for vb in ("auto", "off"):
            engines[(block, vb)] = build_sparse(block, vb)

    # warm + report the bucket + numerics
    for block in (128, 1024):
        ra = engines[(block, "auto")].process_block()
        ro = engines[(block, "off")].process_block()
        print(f"B={block} bucket:",
              engines[(block, "auto")]._render_bucket(),
              "active:", int(engines[(block, "auto")].pool.active.sum()),
              "maxdev:", float(np.abs(
                  np.asarray(ra.outputs.master)
                  - np.asarray(ro.outputs.master)).max()), flush=True)

    results = {}
    for trial in range(6):
        for block in (128, 1024):
            n = 150 if block == 128 else 60
            order = ("auto", "off") if trial % 2 == 0 else ("off", "auto")
            for vb in order:
                ms = run(engines[(block, vb)], n)
                results.setdefault(f"B{block}", {}).setdefault(
                    vb, []).append(round(ms, 3))
                print(f"trial {trial} B={block} buckets={vb}: {ms:.2f} ms",
                      flush=True)
    for k, v in results.items():
        off = np.median(v["off"]); auto = np.median(v["auto"])
        print(f"{k}: off {off:.2f} auto {auto:.2f} ratio {auto/off:.3f} "
              f"(best {min(v['auto']):.2f} vs {min(v['off']):.2f})",
              flush=True)
    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
