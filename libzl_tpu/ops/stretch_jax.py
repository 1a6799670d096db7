"""TPU-resident phase-vocoder time stretch (`LIBZL_TPU_STRETCH=jax`).

The reference renders stretch/pitch offline on the host CPU (tracktion's
SoundTouch, CMakeLists.txt:86; lib/ClipAudioSource.cpp:384-413
render-then-play). The numpy vocoder (ops/resample.time_stretch) is
behaviorally faithful but CPU-bound: on a one-core production host a
deferred re-render contends with the realtime block pump for the single
core. This module runs the SAME algorithm as one XLA program on the
accelerator — batched strided-window STFT, wrapped phase re-accumulation
at the synthesis hop, onset phase reset, reshape-based overlap-add — so
deferred renders cost the host nothing but a dispatch.

Shape discipline (everything under jit is static):
- the input pads to a power-of-two length bucket and the frame count pads
  to a 128 bucket with a validity mask, so repeated re-renders of the same
  clip (the common case: a UI gesture sweeping speed/pitch) reuse one
  compiled program per bucket;
- frame anchors are computed host-side in float64 (exactly the numpy
  path's `np.round(arange(M) * ana_hop)` — duration semantics are
  identical by construction) and shipped as an int32 input.

Quality matches the numpy vocoder: same hann window, identical wrapped
phase-advance math in f32, the same positive-spectral-flux onset reset
(global statistics instead of per-2048-frame-chunk — equal for inputs
under one chunk, a negligible thresholding difference beyond). The numpy
path remains the oracle (tests/test_stretch_jax.py compares them).
"""

from __future__ import annotations

import functools

import numpy as np


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@functools.partial(
    __import__("jax").jit,
    static_argnames=("fft_size", "syn_hop"),
)
def _stretch_kernel(x, anchors, mask, exp_ana, stretch32, fft_size: int,
                    syn_hop: int):
    """One XLA program: windows -> rfft -> phase vocoder -> irfft -> OLA.

    x        [T_pad, C] f32 (sample-padded input)
    anchors  [M_pad] int32 frame anchors (clamped, edge-padded)
    mask     [M_pad] f32 validity (1 = real frame)
    exp_ana  [Kb] f32 expected per-bin phase advance (omega * ana_hop)
    stretch32 f32 scalar syn_hop/ana_hop
    The stretch factor rides in as VALUES so a factor sweep within one
    shape bucket reuses a single compiled program. Returns
    (out [(M_pad-1)*syn_hop + fft_size, C], norm [same]) — un-normalized
    overlap-add plus the window-power envelope; the host finishes the
    division and the trim (cheap, and keeps the floor rule identical to
    the numpy path).
    """
    import jax.numpy as jnp

    f32 = jnp.float32
    M = anchors.shape[0]
    n_ch = x.shape[1]
    n_bins = fft_size // 2 + 1
    win = jnp.asarray(np.hanning(fft_size).astype(np.float32))

    # strided analysis windows: [M, C, K] gather by frame anchor
    idx = anchors[:, None] + jnp.arange(fft_size, dtype=jnp.int32)[None, :]
    frames = jnp.take(x, idx, axis=0)                    # [M, K, C]
    frames = jnp.transpose(frames, (0, 2, 1)) * win[None, None, :]
    F = jnp.fft.rfft(frames, axis=-1)                    # [M, C, Kb] c64
    mag = jnp.abs(F).astype(f32)
    phase = jnp.angle(F).astype(f32)

    two_pi = f32(2.0 * np.pi)
    inv_two_pi = f32(1.0 / (2.0 * np.pi))

    # wrapped per-frame phase deviation vs the expected bin advance
    # (frame 0 carries no advance — preloading exp_ana zeroes it exactly,
    # mirroring ops/resample.time_stretch)
    ddphi = jnp.concatenate(
        [jnp.broadcast_to(exp_ana[None, None, :], (1, n_ch, n_bins)),
         phase[1:] - phase[:-1]], axis=0)
    ddphi = ddphi - exp_ana[None, None, :]
    ddphi = ddphi - two_pi * jnp.round(ddphi * inv_two_pi)
    ddphi = ddphi * stretch32
    c = jnp.cumsum(ddphi, axis=0)
    # linear part: wrapped in float32 from float64 host-free math —
    # counts * omega * hop computed in f32 loses phase accuracy at large M,
    # so split: wrap per-frame using the (fft/hop)-periodicity when exact
    counts = jnp.arange(M, dtype=jnp.int32)
    if fft_size % syn_hop == 0:
        R = fft_size // syn_hop
        lin_table = jnp.asarray(np.mod(
            np.arange(R)[:, None] * (2.0 * np.pi * np.arange(n_bins)
                                     / fft_size) * syn_hop,
            2.0 * np.pi,
        ).astype(np.float32))                            # [R, Kb]
        lin = jnp.take(lin_table, counts % R, axis=0)    # [M, Kb]
    else:
        # M is static: wrap the full table host-side in numpy float64
        # (jnp float64 inside jit is silently f32 without x64 — it would
        # lose exactly the precision this split exists to keep)
        lin = jnp.asarray(np.mod(
            np.arange(M, dtype=np.float64)[:, None]
            * (2.0 * np.pi * np.arange(n_bins) / fft_size * syn_hop),
            2.0 * np.pi,
        ).astype(np.float32))                            # [M, Kb]
    c = c + lin[:, None, :]

    # onset detection: positive spectral flux, global statistics. The
    # carry-in magnitude sum for frame 0 is ZERO exactly like the numpy
    # oracle (flux[0] == mag_sum[0] inflates the threshold identically in
    # both paths; frame 0 itself never resets)
    mag_sum = mag.sum(axis=2)                            # [M, C]
    prev_sums = jnp.concatenate(
        [jnp.zeros_like(mag_sum[:1]), mag_sum[:-1]], axis=0)
    flux = jnp.maximum(mag_sum - prev_sums, 0.0) * mask[:, None]
    nvalid = jnp.maximum(mask.sum(), 1.0)
    mean = (flux.sum(axis=0)) / nvalid
    var = ((flux - mean[None, :]) ** 2 * mask[:, None]).sum(axis=0) / nvalid
    thresh = mean + 2.0 * jnp.sqrt(var)
    onset = flux > jnp.maximum(thresh, f32(1e-6))[None, :]
    onset = onset.at[0, :].set(False)

    # segmented accumulation: phase restarts from the analysis phase at
    # each onset frame (same gather construction as the numpy path)
    midx = jnp.arange(M, dtype=jnp.int32)[:, None]
    seg = jax_cummax(jnp.where(onset, midx, -1))
    # row 0 = the carried base phase[0] (its c-offset is zero by
    # construction: the frame-0 ddphi preload makes c[0] == 0), rows 1..
    # restart from the analysis phase at each onset frame
    bases = jnp.concatenate([phase[:1], phase - c], axis=0)
    acc = jnp.take_along_axis(bases, (seg + 1)[:, :, None], axis=0) + c

    Z = mag * jnp.cos(acc) + 1j * (mag * jnp.sin(acc))
    y = jnp.fft.irfft(Z, n=fft_size, axis=-1).astype(f32)
    y = y * win[None, None, :] * mask[:, None, None]     # [M, C, K]

    out_len = (M - 1) * syn_hop + fft_size
    out = jnp.zeros((out_len, n_ch), f32)
    norm = jnp.zeros(out_len, f32)
    w2 = win * win
    if fft_size % syn_hop == 0:
        R = fft_size // syn_hop
        seg_len = M * syn_hop
        for j in range(R):
            blk = y[:, :, j * syn_hop:(j + 1) * syn_hop]
            out = out.at[j * syn_hop: j * syn_hop + seg_len].add(
                jnp.transpose(blk, (0, 2, 1)).reshape(seg_len, n_ch))
            norm = norm.at[j * syn_hop: j * syn_hop + seg_len].add(
                jnp.tile(w2[j * syn_hop:(j + 1) * syn_hop], M)
                * jnp.repeat(mask, syn_hop))
    else:
        oidx = (midx * syn_hop
                + jnp.arange(fft_size, dtype=jnp.int32)[None, :])  # [M, K]
        out = out.at[oidx.ravel()].add(
            jnp.transpose(y, (0, 2, 1)).reshape(-1, n_ch))
        norm = norm.at[oidx.ravel()].add(
            (w2[None, :] * mask[:, None]).ravel())
    return out, norm


def jax_cummax(x):
    """Cumulative max along axis 0 (segment-start bookkeeping)."""
    import jax
    import jax.numpy as jnp

    return jax.lax.associative_scan(jnp.maximum, x, axis=0)


def time_stretch_jax(
    samples: np.ndarray, stretch: float, fft_size: int = 2048, hop: int = 512
) -> np.ndarray:
    """Phase-vocoder time stretch of [T, C] by `stretch` on the jax
    backend (TPU when available). Duration semantics identical to
    ops/resample.time_stretch: output length = round(T * stretch)."""
    if stretch == 1.0:
        return np.asarray(samples, np.float32)
    samples = np.atleast_2d(np.asarray(samples, np.float32).T).T
    n_in, n_ch = samples.shape
    syn_hop = hop
    ana_hop = hop / stretch
    target_len = max(int(round(n_in * stretch)), 1)
    M = max(
        int((n_in - fft_size) / ana_hop),
        int(np.ceil((target_len - fft_size) / syn_hop)) + 1,
        1,
    )
    x = samples
    if n_in < fft_size:
        x = np.pad(x, ((0, fft_size - n_in), (0, 0)))
    anchors = np.minimum(
        np.round(np.arange(M) * ana_hop).astype(np.int64),
        max(n_in - fft_size, 0),
    ).astype(np.int32)

    # shape buckets: same compiled program across re-renders of this clip
    M_pad = ((M + 127) // 128) * 128
    anchors_pad = np.pad(anchors, (0, M_pad - M), mode="edge")
    mask = np.zeros(M_pad, np.float32)
    mask[:M] = 1.0
    T_pad = _next_pow2(x.shape[0] + 1)
    x_pad = np.pad(x, ((0, T_pad - x.shape[0]), (0, 0)))

    n_bins = fft_size // 2 + 1
    exp_ana = (2.0 * np.pi * np.arange(n_bins) / fft_size
               * ana_hop).astype(np.float32)
    out, norm = _stretch_kernel(
        x_pad, anchors_pad, mask, exp_ana,
        np.float32(syn_hop / ana_hop), fft_size=fft_size, syn_hop=syn_hop,
    )
    out = np.asarray(out)
    norm = np.asarray(norm)
    # identical normalization rule to the numpy path (silence where window
    # coverage collapses instead of amplifying rounding noise)
    real_len = (M - 1) * syn_hop + fft_size
    out = out[:real_len]
    norm = norm[:real_len]
    floor = 0.05 * max(float(norm.max()), 1e-8)
    scale = np.where(norm > floor, 1.0 / np.maximum(norm, floor), 0.0)
    result = out * scale[:, None]
    if result.shape[0] < target_len:
        result = np.pad(result, ((0, target_len - result.shape[0]), (0, 0)))
    return result[:target_len].astype(np.float32)
