"""Waveform thumbnail extraction: batched min/max reduction.

Replaces the reference's juce::AudioThumbnail-based WaveFormItem
(lib/WaveFormItem.cpp:21-22: 512 samples per thumbnail, cache of 5): a
thumbnail is the per-bucket (min, max) envelope of the samples, which on TPU
is a reshape + reduction — one fused op for any number of sounds at once
(the BASELINE.json north-star's "batched waveform thumbnails").
"""

from __future__ import annotations

import functools

import numpy as np

DEFAULT_THUMB_SIZE = 512  # lib/WaveFormItem.cpp:21


def thumbnail_math(xp, samples, num_buckets: int):
    """Min/max envelope of [T, C] (or [N, T, C]) samples.

    Returns (mins, maxs) shaped [..., num_buckets, C]. The tail that does
    not fill a whole bucket is dropped (matching juce's per-window scan
    granularity).
    """
    if samples.ndim == 1:
        samples = samples[:, None]  # mono 1-D -> [T, 1]
    t_axis = samples.ndim - 2
    T = samples.shape[t_axis]
    if T == 0:
        # edge-pad cannot extend an empty axis; an empty window is a flat
        # zero envelope (same rule as thumbnail_region's guard)
        shape = list(samples.shape)
        shape[t_axis] = num_buckets
        z = xp.zeros(tuple(shape), np.float32)
        return z, z
    bucket = max(T // num_buckets, 1)
    usable = bucket * num_buckets
    if T < usable:
        # window shorter than the bucket count (tight zooms, tiny clips):
        # edge-pad so every bucket exists instead of crashing the reshape
        pad = usable - T
        widths = [(0, 0)] * samples.ndim
        widths[t_axis] = (0, pad)
        samples = xp.pad(samples, widths, mode="edge")
    if samples.ndim == 2:
        trimmed = samples[:usable].reshape(num_buckets, bucket, -1)
        return trimmed.min(axis=1), trimmed.max(axis=1)
    trimmed = samples[:, :usable].reshape(
        samples.shape[0], num_buckets, bucket, -1
    )
    return trimmed.min(axis=2), trimmed.max(axis=2)


@functools.partial(
    __import__("jax").jit, static_argnames=("num_buckets",)
)
def thumbnail_jit(samples, num_buckets: int = DEFAULT_THUMB_SIZE):
    import jax.numpy as jnp

    return thumbnail_math(jnp, samples, num_buckets)


def thumbnail_region(
    samples: np.ndarray,
    start_seconds: float,
    end_seconds: float,
    sample_rate: float,
    num_buckets: int = DEFAULT_THUMB_SIZE,
):
    """Thumbnail of a zoom window (WaveFormItem start/end properties,
    lib/WaveFormItem.cpp:78-108). Host-side numpy; device batching goes
    through thumbnail_jit."""
    T = samples.shape[0]
    s = max(int(start_seconds * sample_rate), 0)
    e = min(int(end_seconds * sample_rate), T)
    if e <= s:
        # samples.shape[-1] is the FRAME count for 1-D mono input — the
        # channel count must come from the normalized-to-2D view
        n_ch = 1 if samples.ndim == 1 else samples.shape[-1]
        z = np.zeros((num_buckets, n_ch), np.float32)
        return z, z
    return thumbnail_math(np, samples[s:e], num_buckets)
