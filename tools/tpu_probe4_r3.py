"""Probe 4 (round 3): does the lookahead horizon help the SUPERBLOCK path?

The bench north star renders B=1024 superblocks; auto-lookahead now gives
that geometry an H=4 horizon (W=4096 windows kernel). Bench r3b measured
4.41x vs 4.56x pre-horizon — within cross-process noise, so this probe
does the only trustworthy comparison (NOTES_TPU_ENV.md): interleaved
rounds on persistent engines in ONE process, la in {0, 2, 4}.

    nohup python tools/tpu_probe4_r3.py > /tmp/tpu_probe4_r3.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BLOCKS = 40
ROUNDS = 5


def build(la):
    import bench
    from libzl_tpu.engine.engine import AudioEngine
    from libzl_tpu.engine.commands import ClipCommand
    from libzl_tpu.io.wav import AudioData
    from libzl_tpu.models.clip import ClipAudioSource

    engine = AudioEngine(
        sample_rate=48000, block_frames=1024, num_voices=1024,
        backend="jax", lookahead=la,
    )
    engine.start_transport(bpm=120)
    rng = np.random.default_rng(0)
    clips = []
    for i in range(64):
        seconds = float(rng.uniform(0.4, 2.0))
        t = np.arange(int(48000 * seconds)) / 48000
        freq = 110.0 * (2.0 ** (i % 24 / 12.0))
        wave = (0.25 * np.sin(2 * np.pi * freq * t)
                + 0.1 * np.sin(2 * np.pi * 2 * freq * t)
                ).astype(np.float32)[:, None]
        clips.append(ClipAudioSource(engine, audio=AudioData(wave, 48000)))
    for v in range(1024):
        clip = clips[v % 64]
        cmd = ClipCommand.channel(clip.id, v % 10)
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
    engines = {la: build(la) for la in (0, 2, 4)}
    # fence + warmup each
    for la, e in engines.items():
        last = None
        for _ in range(10):
            last = e.process_block()
        np.asarray(last.outputs.master)
        print(f"la{la} warm (lookahead={e._lookahead})", flush=True)

    results = {la: [] for la in engines}
    for r in range(ROUNDS):
        for la, e in engines.items():
            t0 = time.perf_counter()
            last = None
            for _ in range(BLOCKS):
                last = e.process_block()
            jax.block_until_ready(last.outputs.master)
            ms = (time.perf_counter() - t0) / BLOCKS * 1e3
            results[la].append(ms)
            print(f"round {r} la{la}: {ms:.2f} ms/block "
                  f"({1024 / 48000 / (ms * 1e-3):.2f}x rt)", flush=True)
    for la, ms in results.items():
        med = float(np.median(ms))
        print(f"RESULT la{la} median {med:.2f} ms/block best {min(ms):.2f} "
              f"rt {1024 / 48000 / (med * 1e-3):.2f}x", flush=True)


if __name__ == "__main__":
    main()
