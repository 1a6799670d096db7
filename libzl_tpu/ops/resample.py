"""Offline time-stretch / pitch-shift rendering (the tracktion render pass).

The reference delegates stretch and pitch to tracktion's TimeStretcher
(SoundTouch backend, CMakeLists.txt:86) which renders an offline "playback
file" that the sampler then plays at unity rate
(lib/ClipAudioSource.cpp:384-402 updateTempoAndPitch;
lib/SamplerSynthSound.cpp:29-47 loads the *playback* file, not the source).
Only the per-note +/-semitone varispeed happens live in the voice kernel.

This module reproduces that design: `render_playback` produces the processed
sample buffer uploaded to the sound bank whenever speedRatio / pitchChange /
gain change. The stretcher is a standard STFT phase vocoder with identity
phase locking; pitch shift = resample + stretch back. Semantics:

- speed_ratio r: playback speed multiplier WITHOUT pitch change
  (output duration = input / r)
- pitch_semitones p: pitch shift WITHOUT duration change
- gain_db: clip gain baked into the render (tracktion clip->setGainDB,
  lib/ClipAudioSource.cpp:305-310)

Runs in numpy on the host: renders are rare (parameter changes), happen off
the audio path, and the result is device-uploaded once. A jax.signal STFT
variant can replace the core later without changing callers.
"""

from __future__ import annotations

import numpy as np


def linear_resample(samples: np.ndarray, ratio: float) -> np.ndarray:
    """Resample [T, C] by `ratio` (>1 = faster/shorter), linear interpolation.

    This is the varispeed primitive: pitch and speed change together.
    """
    if ratio == 1.0:
        return samples.astype(np.float32, copy=False)
    n_in = samples.shape[0]
    n_out = max(int(round(n_in / ratio)), 1)
    pos = np.arange(n_out, dtype=np.float64) * ratio
    idx = np.minimum(pos.astype(np.int64), n_in - 1)
    nxt = np.minimum(idx + 1, n_in - 1)
    frac = (pos - idx).astype(np.float32)[:, None]
    out = samples[idx] * (1.0 - frac) + samples[nxt] * frac
    return out.astype(np.float32)


def time_stretch(
    samples: np.ndarray, stretch: float, fft_size: int = 2048, hop: int = 512
) -> np.ndarray:
    """Phase-vocoder time stretch of [T, C] by factor `stretch` (output
    duration = input * stretch), pitch preserved."""
    if stretch == 1.0:
        return samples.astype(np.float32, copy=False)
    samples = np.atleast_2d(samples.T).T
    n_in, n_ch = samples.shape
    syn_hop = hop
    ana_hop = hop / stretch
    win = np.hanning(fft_size).astype(np.float64)
    omega = 2.0 * np.pi * np.arange(fft_size // 2 + 1) / fft_size

    out_ch = []
    n_out_frames = max(int((n_in - fft_size) / ana_hop), 1)
    for c in range(n_ch):
        x = samples[:, c].astype(np.float64)
        out = np.zeros(n_out_frames * syn_hop + fft_size)
        norm = np.zeros_like(out)
        phase_acc = None
        prev_phase = None
        for m in range(n_out_frames):
            a = int(round(m * ana_hop))
            a = min(a, n_in - fft_size) if n_in >= fft_size else 0
            frame = x[a : a + fft_size]
            if len(frame) < fft_size:
                frame = np.pad(frame, (0, fft_size - len(frame)))
            F = np.fft.rfft(frame * win)
            mag, phase = np.abs(F), np.angle(F)
            if phase_acc is None:
                phase_acc = phase.copy()
            else:
                # phase advance over the *analysis* hop, unwrapped around the
                # bin frequency, re-accumulated at the synthesis hop
                dphi = phase - prev_phase - omega * ana_hop
                dphi -= 2.0 * np.pi * np.round(dphi / (2.0 * np.pi))
                true_freq = omega + dphi / ana_hop
                phase_acc = phase_acc + true_freq * syn_hop
            prev_phase = phase
            y = np.fft.irfft(mag * np.exp(1j * phase_acc)) * win
            pos = m * syn_hop
            out[pos : pos + fft_size] += y
            norm[pos : pos + fft_size] += win * win
        # normalize by the window overlap; where coverage collapses (the
        # first/last partial frames) output silence instead of amplifying
        # rounding noise by 1/norm
        floor = 0.05 * max(norm.max(), 1e-8)
        out = np.where(norm > floor, out / np.maximum(norm, floor), 0.0)
        out_ch.append(out)
    result = np.stack(out_ch, axis=1)
    target = max(int(round(n_in * stretch)), 1)
    if result.shape[0] < target:
        result = np.pad(result, ((0, target - result.shape[0]), (0, 0)))
    return result[:target].astype(np.float32)


def pitch_shift(
    samples: np.ndarray, semitones: float, fft_size: int = 2048, hop: int = 512
) -> np.ndarray:
    """Pitch shift [T, C] by `semitones`, duration preserved."""
    if semitones == 0.0:
        return samples.astype(np.float32, copy=False)
    ratio = 2.0 ** (semitones / 12.0)
    # resample (shifts pitch by ratio, shortens by ratio), then stretch back
    shifted = linear_resample(samples, ratio)
    out = time_stretch(shifted, samples.shape[0] / shifted.shape[0],
                       fft_size, hop)
    target = samples.shape[0]
    if out.shape[0] < target:
        out = np.pad(out, ((0, target - out.shape[0]), (0, 0)))
    return out[:target].astype(np.float32)


def bake_loop_crossfade(
    samples: np.ndarray,
    loop_start: int,
    loop_stop: int,
    fade_samples: int,
) -> np.ndarray:
    """Bake an equal-power loop crossfade into a playback buffer.

    The reference loops with a hard position reset
    (lib/SamplerSynthVoice.cpp:241-246), which clicks on non-zero-crossing
    material. Consistent with the render-then-play design, the crossfade is
    baked offline: the tail of the loop region is blended with the material
    *preceding* the loop start, so the voice kernel's plain reset lands on
    already-continuous audio. The fade is shortened when not enough
    pre-start material exists.
    """
    out = np.array(samples, np.float32, copy=True)
    n = int(min(fade_samples, loop_start, max(loop_stop - loop_start, 0)))
    if n <= 0:
        return out
    t = (np.arange(n, dtype=np.float32) + 1.0) / np.float32(n)
    # equal-power: tail fades out as cos, incoming pre-start fades in as sin
    fade_out = np.cos(0.5 * np.pi * t)[:, None]
    fade_in = np.sin(0.5 * np.pi * t)[:, None]
    tail = out[loop_stop - n : loop_stop]
    incoming = out[loop_start - n : loop_start]
    out[loop_stop - n : loop_stop] = tail * fade_out + incoming * fade_in
    return out


def render_playback(
    samples: np.ndarray,
    speed_ratio: float = 1.0,
    pitch_semitones: float = 0.0,
    gain_db: float = 0.0,
) -> np.ndarray:
    """Full offline render: stretch + pitch + gain -> playback buffer."""
    out = np.asarray(samples, np.float32)
    if speed_ratio not in (0.0, 1.0):
        out = time_stretch(out, 1.0 / speed_ratio)
    if pitch_semitones != 0.0:
        out = pitch_shift(out, pitch_semitones)
    if gain_db != 0.0:
        out = (out * np.float32(10.0 ** (gain_db / 20.0))).astype(np.float32)
    return out
