"""WAV file reading/writing with NumPy (no external deps).

Replaces the reference's use of juce audio formats for both sample loading
(lib/SamplerSynthSound.cpp:28-59) and disk recording (lib/AudioLevels.cpp:44-67).
Supports PCM 16/24/32-bit and IEEE float32, mono or stereo (more channels pass
through unchanged). All engine-internal audio is float32 in [-1, 1).
"""

from __future__ import annotations

import dataclasses
import struct
import wave
from pathlib import Path

import numpy as np


@dataclasses.dataclass
class AudioData:
    """Decoded audio: samples [frames, channels] float32 + sample rate."""

    samples: np.ndarray
    sample_rate: int

    @property
    def num_frames(self) -> int:
        return self.samples.shape[0]

    @property
    def num_channels(self) -> int:
        return self.samples.shape[1]

    @property
    def duration_seconds(self) -> float:
        return self.num_frames / self.sample_rate


def _decode_pcm(raw: bytes, sampwidth: int, n_channels: int) -> np.ndarray:
    if sampwidth == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sampwidth == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        ints = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        ints = np.where(ints >= 1 << 23, ints - (1 << 24), ints)
        data = ints.astype(np.float32) / float(1 << 23)
    elif sampwidth == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / float(1 << 31)
    elif sampwidth == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM sample width: {sampwidth}")
    return data.reshape(-1, n_channels)


def read_wav(path: str | Path) -> AudioData:
    """Read a WAV file to float32 [frames, channels]."""
    path = Path(path)
    # wave module handles PCM; float WAVs need manual RIFF parsing.
    try:
        with wave.open(str(path), "rb") as w:
            n_channels = w.getnchannels()
            sampwidth = w.getsampwidth()
            framerate = w.getframerate()
            raw = w.readframes(w.getnframes())
        return AudioData(_decode_pcm(raw, sampwidth, n_channels), framerate)
    except wave.Error:
        return _read_wav_riff(path)


def _read_wav_riff(path: Path) -> AudioData:
    """Minimal RIFF parser for IEEE-float and extensible WAVs."""
    blob = path.read_bytes()
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE file: {path}")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError(f"missing fmt/data chunk: {path}")
    audio_format, n_channels, framerate, _, _, bits = fmt
    if audio_format == 3 or (audio_format == 0xFFFE and bits == 32):
        samples = np.frombuffer(data, dtype="<f4").reshape(-1, n_channels).copy()
    elif audio_format in (1, 0xFFFE):
        samples = _decode_pcm(data, bits // 8, n_channels)
    else:
        raise ValueError(f"unsupported WAV format code: {audio_format}")
    return AudioData(samples.astype(np.float32), framerate)


def write_wav(
    path: str | Path,
    samples: np.ndarray,
    sample_rate: int,
    bit_depth: int = 16,
) -> None:
    """Write float32 [frames, channels] (or [frames]) to a PCM WAV.

    The reference records 16-bit WAV at the engine rate
    (lib/AudioLevels.cpp:44-58); bit_depth 16/24/32 supported.
    """
    samples = np.asarray(samples, dtype=np.float32)
    if samples.ndim == 1:
        samples = samples[:, None]
    clipped = np.clip(samples, -1.0, 1.0)
    n_channels = clipped.shape[1]
    if bit_depth == 16:
        ints = np.round(clipped * 32767.0).astype("<i2")
        raw = ints.tobytes()
        sampwidth = 2
    elif bit_depth == 24:
        ints = np.round(clipped * float((1 << 23) - 1)).astype(np.int32)
        b = np.empty((ints.size, 3), dtype=np.uint8)
        flat = ints.reshape(-1)
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        raw = b.tobytes()
        sampwidth = 3
    elif bit_depth == 32:
        ints = np.round(clipped.astype(np.float64) * float((1 << 31) - 1)).astype("<i4")
        raw = ints.tobytes()
        sampwidth = 4
    else:
        raise ValueError(f"unsupported bit depth: {bit_depth}")
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(sampwidth)
        w.setframerate(int(sample_rate))
        w.writeframes(raw)


def to_stereo(samples: np.ndarray) -> np.ndarray:
    """[frames] or [frames, 1] -> duplicated stereo; >=2ch -> first two.

    The voice kernel always operates on 2-channel sample memory: the reference
    computes the mono right channel from the same expression as the left
    (lib/SamplerSynthVoice.cpp:205), so duplicating mono up front is exact.
    """
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.shape[1] == 1:
        return np.repeat(samples, 2, axis=1)
    return samples[:, :2]
