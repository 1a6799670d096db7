"""Engine benchmark: the BASELINE.json north-star configuration.

Renders the full engine pipeline — 1024 sampler voices (64 looped clips +
sampler polyphony across 12 channels) at 48 kHz in 128-frame blocks — and
reports the sustained realtime factor on the current JAX backend (the real
TPU chip under the driver).

Baseline context: the reference engine is engineered to sustain 96 voices
(12 channels x 8 voices, lib/SamplerSynth.cpp:23) at 1.0x realtime on its
target device. `vs_baseline` therefore reports voice-throughput relative to
that envelope: (voices * realtime_factor) / 96.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

NUM_VOICES = 1024
NUM_CLIPS = 64
BLOCK_FRAMES = 128
SAMPLE_RATE = 48000
WARMUP_BLOCKS = 50
MEASURE_BLOCKS = 750  # 2 s of audio


def build_session():
    from libzl_tpu.engine.commands import ClipCommand
    from libzl_tpu.engine.engine import AudioEngine
    from libzl_tpu.io.wav import AudioData
    from libzl_tpu.models.clip import ClipAudioSource

    engine = AudioEngine(
        sample_rate=SAMPLE_RATE,
        block_frames=BLOCK_FRAMES,
        num_voices=NUM_VOICES,
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

    # fill the voice pool: every voice is a live note (the north-star load)
    for v in range(NUM_VOICES):
        clip = clips[v % NUM_CLIPS]
        cmd = ClipCommand.channel(clip.id, v % 10)
        cmd.midi_note = int(rng.integers(48, 73))
        cmd.change_volume = True
        cmd.volume = float(rng.uniform(0.3, 1.0))
        cmd.looping = True
        cmd.start_playback = True
        engine.schedule_clip_command(cmd, 0)
    return engine


def main() -> int:
    engine = build_session()

    # warmup: triggers compilation and fills the pool
    for _ in range(WARMUP_BLOCKS):
        res = engine.process_block()
    np.asarray(res.outputs.master)  # sync
    active = int(engine.pool.active.sum())

    t0 = time.perf_counter()
    last = None
    for _ in range(MEASURE_BLOCKS):
        last = engine.process_block()
    np.asarray(last.outputs.master)  # sync the pipeline tail
    dt = time.perf_counter() - t0

    rendered_seconds = MEASURE_BLOCKS * BLOCK_FRAMES / SAMPLE_RATE
    rt_factor = rendered_seconds / dt
    result = {
        "metric": f"realtime_factor_{active}voices_{NUM_CLIPS}clips_48k",
        "value": round(rt_factor, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rt_factor * active / 96.0, 2),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
