"""Pallas TPU kernel for the voice sample fetch.

Why this exists: the voice render needs `sound[pos[v, b]]` for ~262k
(voice, frame) pairs per block. XLA lowers that to a generic gather —
per-element random access into the multi-megabyte sample bank in HBM —
measured at ~5 ms per 128-frame block for 1024 voices (2x slower than
realtime by itself). But the access pattern is not random: within a block,
each voice reads a *contiguous window* (positions advance by a fixed ratio;
loop wraps jump to one other contiguous window). This kernel exploits that:

- The host anchors two 1024-sample fetch windows per voice on 512-sample
  boundaries: window A around the current playback segment, window B around
  the loop-reset target (lib/SamplerSynthVoice.cpp:225-247 semantics).
- Pallas streams the four 512-row blocks per voice HBM->VMEM through the
  automatic block pipeline (double-buffered DMA, not per-element access);
  block indices come from scalar-prefetched window tables.
- In VMEM, the interpolated fetch becomes one weighted one-hot matmul on the
  MXU: rows are frames, columns are window positions, and each row carries
  the two linear-interpolation coefficients (invAlpha at idx, alpha at
  idx+1, lib/SamplerSynthVoice.cpp:197-205):

      out[b, c] = sum_w W[b, w] * window[w, c],
      W[b, w] = (w == idx_b) * (1 - alpha_b) + (w == idx_b + 1) * alpha_b

  With at most two nonzeros per row and HIGHEST precision the result is
  exact f32 interpolation. Output is the pre-gain interpolated sample pair
  [V, B, 2]; gain/envelope/pan stay fused in XLA. (The reference's
  quirk-gain parity mode needs the two taps separately and uses the gather
  path instead — parity testing is not a hot path.)

Grid layout: (V / GROUP, GROUP) — the inner grid dimension walks voices one
at a time so live temporaries stay ~1 MB (an unrolled per-voice loop would
multiply them past the scoped-VMEM limit), while the [GROUP, B] input and
output blocks satisfy TPU tile divisibility and stay VMEM-resident across
the inner steps (their index maps ignore the inner index).

Position encoding (computed in XLA by ops/voice.py): `pos_local` in
[0, 1024) addresses window A, [1024, 2048) addresses window B; anything
outside is clamped here and masked to zero by the caller's validity mask.

The host guarantees (engine/soundbank.py, engine/voicestate.py):
- the flat sample array length is a multiple of 512 with a guard tail, so
  window block indices never run off the end;
- per-voice position spans within a block stay under MAX_SPAN samples
  (pitch ratios clamped to MAX_SPAN/B, ~+2 octaves at 128-frame blocks;
  higher transpositions are clamped — outside the musical envelope).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SOUND_BLOCK = 512       # window anchor granularity (rows of the flat bank)
BLOCKS_PER_WINDOW = 2   # each region = 2 anchored blocks = 1024 rows
REGION = BLOCKS_PER_WINDOW * SOUND_BLOCK
WINDOW_BLOCKS = 4       # A0, A1, B0, B1
WINDOW = WINDOW_BLOCKS * SOUND_BLOCK
GROUP = 8               # voices per block-spec tile (not per grid step)
MAX_SPAN = REGION - SOUND_BLOCK - 3  # position span a block may cover (509)


def _fetch_kernel(wa_ref, wb_ref, w0, w1, w2, w3, pos_ref, alpha_ref, out_ref):
    g = pl.program_id(1)
    window = jnp.concatenate(
        [w0[...], w1[...], w2[...], w3[...]], axis=0
    )  # [WINDOW, 2]
    idx = pos_ref[g, :]              # [B] int32 in [0, WINDOW)
    alpha = alpha_ref[g, :]          # [B] f32
    in_range = (idx >= 0) & (idx < WINDOW - 1)
    safe = jnp.clip(idx, 0, WINDOW - 2)[:, None]
    inv = jnp.where(in_range, 1.0 - alpha, 0.0)[:, None]
    al = jnp.where(in_range, alpha, 0.0)[:, None]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, WINDOW), 1)
    weights = (
        (col_ids == safe).astype(jnp.float32) * inv
        + (col_ids == safe + 1).astype(jnp.float32) * al
    )
    out_ref[g] = jnp.dot(
        weights, window,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("block_frames",))
def fetch_interp(
    sound_data,      # [N, 2] f32, N % 512 == 0, guard tail >= 1536 rows
    pos_local,       # [V, B] int32 (window-relative; see module docstring)
    alpha,           # [V, B] f32
    win_blk_a,       # [V] int32: window A anchor (512-row block index)
    win_blk_b,       # [V] int32: window B anchor (loop-reset target)
    block_frames: int = 128,
):
    """Returns interp [V, B, 2] f32: linear-interpolated, pre-gain samples."""
    V, B = pos_local.shape
    assert V % GROUP == 0, f"voice count {V} must be a multiple of {GROUP}"
    n_steps = V // GROUP

    def win_spec(j: int):
        use_b = j >= BLOCKS_PER_WINDOW
        off = j % BLOCKS_PER_WINDOW

        def index_map(i, g, wa, wb):
            tbl = wb if use_b else wa
            return (tbl[i * GROUP + g] + off, 0)

        return pl.BlockSpec((SOUND_BLOCK, 2), index_map)

    in_specs = [win_spec(j) for j in range(WINDOW_BLOCKS)]
    in_specs.append(pl.BlockSpec((GROUP, B), lambda i, g, wa, wb: (i, 0)))
    in_specs.append(pl.BlockSpec((GROUP, B), lambda i, g, wa, wb: (i, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps, GROUP),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (GROUP, B, 2), lambda i, g, wa, wb: (i, 0, 0)
        ),
    )
    out_shape = jax.ShapeDtypeStruct((V, B, 2), jnp.float32)
    sound_inputs = [sound_data] * WINDOW_BLOCKS
    # off-TPU (CI, CPU dev) the kernel runs in interpreter mode so the
    # windows path stays testable everywhere
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        _fetch_kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(win_blk_a, win_blk_b, *sound_inputs, pos_local, alpha)
