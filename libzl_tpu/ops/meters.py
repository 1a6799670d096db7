"""In-graph metering reductions (the AudioLevels analysis equivalent).

The reference snapshots JACK port buffers and scans them for peaks on a 50 ms
Qt timer using a fixed-point x2^17 trick (lib/AudioLevels.cpp:347-412). In the
TPU build the per-block peak is a free reduction inside the render graph; the
host-side AudioLevels object (libzl_tpu.models.audio_levels) applies the
fixed-point conversion, dBFS mapping and peak-hold decay at its own cadence,
consuming these per-block peaks instead of re-scanning buffers.
"""

from __future__ import annotations

import numpy as np

from ..constants import METER_DBFS_FLOOR


def block_peaks(xp, audio):
    """Per-stream absolute peak. audio: [..., B, 2] -> [..., 2] f32."""
    return xp.max(xp.abs(audio), axis=-2).astype(np.float32)


def block_rms(xp, audio):
    """Per-stream RMS. audio: [..., B, 2] -> [..., 2] f32. (The reference
    meters peaks only; RMS comes free as another in-graph reduction and is
    part of the rebuild's metering surface, BASELINE.json configs.)"""
    return xp.sqrt(xp.mean(xp.square(audio), axis=-2)).astype(np.float32)


def to_dbfs(raw: float) -> float:
    """convertTodbFS semantics (lib/AudioLevels.cpp:330-341): 20*log10 with a
    -200 dB floor, and non-positive input mapping to the floor."""
    if raw <= 0:
        return METER_DBFS_FLOOR
    v = 20.0 * np.log10(raw)
    return float(max(v, METER_DBFS_FLOOR))


def add_dbfs(db1: float, db2: float) -> float:
    """Power-sum of two dBFS values (lib/AudioLevels.cpp:234-236,343-345)."""
    return float(10.0 * np.log10(10.0 ** (db1 / 10.0) + 10.0 ** (db2 / 10.0)))
