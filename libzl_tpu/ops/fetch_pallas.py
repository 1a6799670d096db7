"""Pallas TPU kernel for the voice sample fetch (the `fetch="windows"` path).

STATUS: the TPU single-chip default since round 2. Round-1's Mosaic
toolchain serialized the per-(voice,chunk) compute at ~56 us and the kernel
lost to XLA's gather; on the round-2 toolchain it wins at both live and
super blocks (4.2 vs 5.5 ms at B=128, 7.8 vs 10.2 ms at B=1024, 1024
voices — NOTES_TPU_ENV.md carries the dated A/B), single-chip and
per-shard under a mesh (shard_map runs the kernel on each device's local
voice shard). int16 banks ride it too — half-byte region DMAs with
in-VMEM dequant (probe 23). Gather remains the default off-TPU, and
`fetch="auto"` falls back to gather for shapes the kernel can't tile
(block_frames not a multiple of 128, per-shard voices not a multiple of
GROUP).

Why this exists: the voice render needs `sound[pos[v, b]]` for V*B
(voice, frame) pairs per block. XLA lowers that to a generic gather;
the access pattern, however, is not random: within a block,
each voice reads one or two *contiguous windows* (positions advance by a
fixed ratio; loop wraps jump to the loop start,
lib/SamplerSynthVoice.cpp:223-247). This kernel exploits that structure:

1. **Streaming windows.** For each voice the host anchors two fetch regions
   on 512-sample boundaries: region A around the current playback segment
   and region B around the loop-reset target. The kernel DMAs each region
   with ONE descriptor (tens of KB, double-buffered across grid steps) —
   scattered HBM access at descriptor granularity, not element granularity.
   The bank is planar [2, N] (engine/soundbank.py) so every DMA and slab
   slice is a lane-aligned run along the sample axis.

2. **Interpolation as planar MXU matmuls.** Per 128-frame chunk the kernel
   derives a lane-aligned 768-column slab offset from the chunk's minimum
   index, builds the banded interpolation weights

       W[u, b] = (u == idx_b - off) * (1 - alpha_b)
               + (u == idx_b - off + 1) * alpha_b

   and computes `out[2, 128] = slab[2, 768] @ W[768, 128]` — the frame axis
   lands on the 128-lane axis of the MXU (placing the stereo axis there
   would waste 126/128 output lanes). Two dots per chunk (one per region)
   sum to the final interpolated pair; each frame's index lives in exactly
   one region's slab, the other contributes zero. HIGHEST precision keeps
   the result exact f32 (<= 2 nonzeros per column).

Output is the planar pre-gain interpolated pair [V, 2, B]; gain, envelope,
pan and mixdown stay fused in XLA. (The reference's quirk-gain parity mode
needs the two taps separately and uses the gather path instead.)

Host guarantees (engine/soundbank.py, engine/voicestate.py):
- the planar bank's sample axis is a multiple of 512 with a tail guard of
  at least `region_rows(B)` samples, so region DMAs never run off the end;
- the bank dtype is f32 or int16; int16 regions DMA at half the bytes and
  dequantize (x/32767, the gather path's rule) at the slab slice;
- pitch ratios are clamped to R_MAX (= 4.0, two octaves up — beyond the
  musical envelope), so a block's position span fits one region;
- `pos_local` is window-relative: [0, region) addresses region A,
  [region, 2*region) addresses region B; out-of-range values are masked to
  zero by the caller's validity mask and clamped here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SOUND_BLOCK = 512     # window anchor granularity (samples, lane-aligned)
R_MAX = 4.0           # max pitch ratio (span per block = R_MAX * B)

from ..constants import (  # noqa: E402
    MAX_PITCH_RATIO as _MAX_PITCH_RATIO,
    WINDOW_ANCHOR_BLOCK as _WINDOW_ANCHOR_BLOCK,
)

assert R_MAX == _MAX_PITCH_RATIO, "keep in sync with constants.MAX_PITCH_RATIO"
assert SOUND_BLOCK == _WINDOW_ANCHOR_BLOCK, (
    "keep in sync with constants.WINDOW_ANCHOR_BLOCK"
)
GROUP = 8             # voices per grid step (tile divisibility on [G, B])
CHUNK = 128           # frames per inner compute chunk
# default slab columns per chunk dot: covers R_MAX*CHUNK + 2 plus up to 127
# samples of 128-alignment slack on the slab offset; multiple of 128 lanes
SLAB = 768


def slab_cols(r_max: float = R_MAX, chunk: int = CHUNK,
              align: int = 128) -> int:
    """Slab width for a pitch-ratio ceiling: the banded weight build costs
    O(slab * chunk) VPU work per chunk — the kernel's dominant cost — so a
    tighter declared transposition envelope buys a measurably faster render
    (probe 9: slab 768 -> 7.8 ms, 512 -> ~7.2, 384 -> ~6.9 per 1024-frame
    block at 1024 voices). `align` is the slab-offset alignment granularity
    (the lane-dim dynamic-slice hint): smaller alignment = fewer slack
    columns, if Mosaic accepts it."""
    span = (align - 1) + int(r_max * chunk) + 2  # align slack + span + taps
    return ((span + 127) // 128) * 128


def region_rows(block_frames: int, r_max: float = R_MAX) -> int:
    """Samples per fetch region: anchor slack + max span, 512-aligned."""
    span = int(r_max * block_frames) + 2
    return ((span + SOUND_BLOCK - 1) // SOUND_BLOCK) * SOUND_BLOCK + SOUND_BLOCK


# Mosaic's dot lowering supports only HIGHEST and DEFAULT (HIGH raises
# NotImplementedError, probe 14)
_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}


# chunk-compute variants (probe surface, NOTES round-3 candidates):
#   loop     — two per-region weight chains + 2 dots/voice (round-2 default
#              until probe 16)
#   fusedw   — ONE hat chain over both regions ([G, 2*slab, CHUNK]) shared
#              by both dots: halves the weight-build op launches and drops
#              the per-region any/where selects (zero weights already give
#              zero contributions). DEFAULT since probe 16 (wins 8/10
#              order-alternated paired trials at B=1024, medians 5.16 vs
#              5.59 ms; tie at B=128 — NOTES_TPU_ENV.md).
#   batchdot — fusedw weights + one G-batched dot_general over stacked
#              [G, 2, 2*slab] slabs (replaces 2*G small dots per chunk).
#              LOSES (probe 15: the stack/concat copies cost more than the
#              saved dot launches, +12% at B=128) — kept as a probe surface.
#   grid     — fusedw compute with the chunk axis as a second grid
#              dimension instead of a fori_loop (Mosaic pipelines the
#              pos/alpha/out block copies across chunk steps). WINS at
#              every block size in clean processes (probes 19/20 + the
#              pinned re-run: 6/8 paired at B=128 with medians -17%/-24%,
#              8/8 at B=1024; best-seen 2.94 ms/block at 1024 voices).
#   auto     — (default) resolves to grid, except fusedw for probe chunks
#              the grid layout can't tile (chunk < 128 with multi-chunk
#              blocks); resolved per shape in fetch_interp.
_VARIANTS = ("loop", "fusedw", "batchdot", "grid", "auto")
_DEFAULT_VARIANT = "auto"


_INT16_DEQUANT = 1.0 / 32767.0  # matches the gather path (ops/voice.py)


def _slab_f32(ref):
    """Slab slice as f32: int16 banks dequantize here, after the DMA —
    the DMA moves half the HBM bytes and the convert runs on VMEM-resident
    data ([2, slab] per dot, negligible next to the weight build)."""
    if ref.dtype == jnp.int16:
        return ref.astype(jnp.float32) * jnp.float32(_INT16_DEQUANT)
    return ref


def _fused_chunk(win_scratch, slot, idx, alpha, *, region, slab,
                 window_rows, align, dot_precision, variant,
                 group: int = GROUP):
    """One chunk's interpolation via the region-merged weight build.

    One hat chain over u in [0, 2*slab) where [0, slab) maps onto region
    A's slab slice and [slab, 2*slab) onto region B's. Each frame's index
    lives in exactly one region, so a single rel per frame suffices;
    parked rel (-8*slab) gives an all-zero column for invalid frames.
    Returns outc [G, 2, chunk]. Shared by the fori_loop kernel body and
    the grid-variant kernel.
    """
    row_ids2s = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * slab, 1), 1)
    big = jnp.int32(window_rows)
    valid = (idx >= 0) & (idx < window_rows - 1)
    alpha_m = jnp.where(valid, alpha, 0.0)
    in_a = valid & (idx < region)
    in_b = valid & (idx >= region)
    off_a = jnp.min(jnp.where(in_a, idx, big), axis=1)      # [G]
    off_a = jnp.clip((off_a // align) * align, 0, region - slab)
    off_b = jnp.min(jnp.where(in_b, idx, big), axis=1)      # [G]
    off_b = jnp.clip((off_b // align) * align, region,
                     2 * region - slab)
    rel = jnp.where(
        in_a, idx - off_a[:, None],
        jnp.where(in_b, idx - off_b[:, None] + slab,
                  jnp.int32(-8 * slab)))             # [G, chunk]
    d = (row_ids2s - rel[:, None, :]).astype(jnp.float32)
    w = jnp.maximum(
        1.0 - jnp.abs(d - alpha_m[:, None, :]), 0.0
    )                                                # [G, 2*slab, chunk]
    if variant == "batchdot":
        slabs = []
        for g in range(group):
            sa = _slab_f32(win_scratch[
                slot, g, :, pl.ds(pl.multiple_of(off_a[g], align), slab)
            ])
            sb = _slab_f32(win_scratch[
                slot, g, :, pl.ds(pl.multiple_of(off_b[g], align), slab)
            ])
            slabs.append(jnp.concatenate([sa, sb], axis=1))
        stacked_slabs = jnp.stack(slabs, axis=0)     # [G, 2, 2*slab]
        return jax.lax.dot_general(
            stacked_slabs, w,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=dot_precision,
        )                                            # [G, 2, chunk]
    parts = []
    for g in range(group):
        sa = _slab_f32(win_scratch[
            slot, g, :, pl.ds(pl.multiple_of(off_a[g], align), slab)
        ])
        sb = _slab_f32(win_scratch[
            slot, g, :, pl.ds(pl.multiple_of(off_b[g], align), slab)
        ])
        part = jax.lax.dot_general(
            sa, w[g, :slab],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision,
        ) + jax.lax.dot_general(
            sb, w[g, slab:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision,
        )                                        # [2, chunk]
        parts.append(part)
    return jnp.stack(parts, axis=0)              # [G, 2, chunk]


def _make_kernel(block_frames: int, region: int, slab: int = SLAB,
                 precision: str = "highest", variant: str = "loop",
                 chunk: int = CHUNK, align: int = 128,
                 group: int = GROUP):
    n_chunks = block_frames // chunk
    window_rows = 2 * region
    dot_precision = _PRECISIONS[precision]
    assert variant in _VARIANTS, variant

    def kernel(wa_ref, wb_ref, sound_ref, pos_ref, alpha_ref, out_ref,
               win_scratch, sems):
        i = pl.program_id(0)
        n_steps = pl.num_programs(0)

        # One DMA per (voice, region): a contiguous lane-aligned run of the
        # planar bank. win_scratch holds both regions back to back per voice.
        def dma(slot, step, g, r, tbl):
            return pltpu.make_async_copy(
                sound_ref.at[
                    :, pl.ds(tbl[step * group + g] * SOUND_BLOCK, region)
                ],
                win_scratch.at[slot, g, :, pl.ds(r * region, region)],
                sems.at[slot, g, r],
            )

        def issue(slot, step):
            for g in range(group):
                dma(slot, step, g, 0, wa_ref).start()
                dma(slot, step, g, 1, wb_ref).start()

        def wait(slot, step):
            for g in range(group):
                dma(slot, step, g, 0, wa_ref).wait()
                dma(slot, step, g, 1, wb_ref).wait()

        @pl.when(i == 0)
        def _():
            issue(0, 0)

        @pl.when(i + 1 < n_steps)
        def _():
            issue((i + 1) % 2, i + 1)

        slot = i % 2
        wait(slot, i)

        row_ids3 = jax.lax.broadcasted_iota(jnp.int32, (1, slab, 1), 1)
        big = jnp.int32(window_rows)

        def chunk_body_fused(c, _):
            out_ref[:, :, c, :] = _fused_chunk(
                win_scratch, slot, pos_ref[:, c, :], alpha_ref[:, c, :],
                region=region, slab=slab, window_rows=window_rows,
                align=align, dot_precision=dot_precision, variant=variant,
                group=group,
            )
            return 0

        def chunk_body(c, _):
            # chunks live on a sublane axis: dynamic indexing on the lane
            # (minor) dimension is not implemented by Mosaic for loads/stores
            idx = pos_ref[:, c, :]                          # [G, CHUNK] i32
            alpha = alpha_ref[:, c, :]                      # [G, CHUNK] f32
            valid = (idx >= 0) & (idx < window_rows - 1)
            alpha_m = jnp.where(valid, alpha, 0.0)

            # NOTE (measured, round 2): conditional-skip variants of this
            # loop LOSE — putting the per-region compute behind pl.when cost
            # +0.2 ms/superblock (probe 5) and a dual-slab fast path for
            # small pitch spans cost +2 ms (probe 8): Mosaic cannot pipeline
            # through the scf.if, which outweighs the saved VPU work. The
            # weight build is batched over the whole GROUP ([G, slab, CHUNK]
            # in one VPU op chain instead of G small ones); only the
            # dynamic-offset slab slices and the dots stay per-voice.
            def region_dot(r):
                lo, hi = r * region, (r + 1) * region
                in_r = valid & (idx >= lo) & (idx < hi)          # [G, CHUNK]
                any_r = in_r.any(axis=1)                         # [G]
                # slab offset per voice: chunk minimum, lane-tile aligned
                off = jnp.min(jnp.where(in_r, idx, big), axis=1)  # [G]
                off = jnp.clip((off // align) * align, lo, hi - slab)
                # hat-function weights: the linear-interp column is exactly
                # max(1 - |(u - rel) - alpha|, 0) — (1-alpha) at u=rel,
                # alpha at u=rel+1, 0 elsewhere; (u-rel) stays exact int
                # math so weights match the two-tap expression to f32
                # rounding. Invalid frames park rel far away -> all-zero
                # column (probe 11).
                rel = jnp.where(in_r, idx - off[:, None],
                                jnp.int32(-8 * slab))            # [G, CHUNK]
                d = (row_ids3 - rel[:, None, :]).astype(jnp.float32)
                w = jnp.maximum(
                    1.0 - jnp.abs(d - alpha_m[:, None, :]), 0.0
                )                                                # [G,slab,CH]
                parts = []
                for g in range(group):
                    off_g = pl.multiple_of(off[g], align)
                    slab_v = _slab_f32(win_scratch[
                        slot, g, :, pl.ds(off_g, slab)
                    ])                                           # [2, slab]
                    part = jax.lax.dot_general(
                        slab_v, w[g],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=dot_precision,
                    )                                            # [2, CHUNK]
                    parts.append(part)
                stacked = jnp.stack(parts, axis=0)               # [G,2,CHUNK]
                return jnp.where(any_r[:, None, None], stacked, 0.0)

            outc = region_dot(0) + region_dot(1)                 # [G,2,CHUNK]
            out_ref[:, :, c, :] = outc
            return 0

        body = chunk_body if variant == "loop" else chunk_body_fused
        jax.lax.fori_loop(0, n_chunks, body, 0, unroll=False)

    return kernel


def _make_kernel_grid(block_frames: int, region: int, slab: int,
                      precision: str, chunk: int, align: int,
                      group: int = GROUP):
    """Grid-variant kernel: chunks are a second grid dimension instead of a
    fori_loop, so Mosaic's pipeliner can overlap each chunk's pos/alpha
    input copy and out write with the neighboring chunks' compute. DMA
    issue/wait happens on each step's first chunk only; the window scratch
    persists across chunk steps (grid iterates the chunk axis fastest)."""
    window_rows = 2 * region
    dot_precision = _PRECISIONS[precision]

    def kernel(wa_ref, wb_ref, sound_ref, pos_ref, alpha_ref, out_ref,
               win_scratch, sems):
        i = pl.program_id(0)
        c = pl.program_id(1)
        n_steps = pl.num_programs(0)

        def dma(slot, step, g, r, tbl):
            return pltpu.make_async_copy(
                sound_ref.at[
                    :, pl.ds(tbl[step * group + g] * SOUND_BLOCK, region)
                ],
                win_scratch.at[slot, g, :, pl.ds(r * region, region)],
                sems.at[slot, g, r],
            )

        def issue(slot, step):
            for g in range(group):
                dma(slot, step, g, 0, wa_ref).start()
                dma(slot, step, g, 1, wb_ref).start()

        def wait(slot, step):
            for g in range(group):
                dma(slot, step, g, 0, wa_ref).wait()
                dma(slot, step, g, 1, wb_ref).wait()

        @pl.when(c == 0)
        def _():
            @pl.when(i == 0)
            def _():
                issue(0, 0)

            @pl.when(i + 1 < n_steps)
            def _():
                issue((i + 1) % 2, i + 1)

            wait(i % 2, i)

        # pos/alpha blocks are [G, chunk] (the chunk axis is folded into
        # the grid); out block is [G, 2, chunk]
        out_ref[:, :, :] = _fused_chunk(
            win_scratch, i % 2, pos_ref[:, :], alpha_ref[:, :],
            region=region, slab=slab, window_rows=window_rows,
            align=align, dot_precision=dot_precision, variant="fusedw",
            group=group,
        )

    return kernel


def parse_suffix(suffix: str):
    """Parse a `fetch="windows:..."` suffix into
    (precision, variant, chunk, align, group).

    Comma-separated tokens: a precision ("highest"|"default"), a kernel
    variant (any of _VARIANTS: "loop"|"fusedw"|"batchdot"|"grid"|"auto"),
    a compute-chunk size ("c64", "c128"), a slab-offset alignment
    ("a32", "a128"), and/or a grid-step voice group ("g8", "g16", "g32").
    Unknown tokens raise.
    """
    precision, variant = "highest", _DEFAULT_VARIANT
    chunk, align, group = CHUNK, 128, GROUP
    for tok in filter(None, suffix.split(",")):
        if tok in _PRECISIONS:
            precision = tok
        elif tok in _VARIANTS:
            variant = tok
        elif tok[:1] == "c" and tok[1:].isdigit():
            chunk = int(tok[1:])
            if chunk not in (32, 64, 128, 256):
                raise ValueError(f"chunk {chunk} not in (32, 64, 128, 256)")
        elif tok[:1] == "a" and tok[1:].isdigit():
            align = int(tok[1:])
            if align not in (8, 16, 32, 64, 128):
                raise ValueError(f"align {align} not in (8..128, pow2)")
        elif tok[:1] == "g" and tok[1:].isdigit():
            group = int(tok[1:])
            if group not in (8, 16, 32):
                # 4 is a hard Mosaic reject: the [g, chunk] block's
                # second-minor dim must be >= 8 (probe 25)
                raise ValueError(f"group {group} not in (8, 16, 32)")
        else:
            raise ValueError(
                f"unknown windows fetch suffix token {tok!r}: precision in "
                f"{sorted(_PRECISIONS)}, variant in {list(_VARIANTS)}, "
                f"chunk 'c<n>', alignment 'a<n>' or group 'g<n>'"
            )
    return precision, variant, chunk, align, group


@functools.partial(
    jax.jit, static_argnames=(
        "block_frames", "r_max", "precision", "variant", "chunk", "align",
        "group",
    )
)
def fetch_interp(
    sound_data,      # [2, N] f32 planar; N % 512 == 0, tail >= region_rows(B)
    pos_local,       # [V, B] int32 (window-relative; see module docstring)
    alpha,           # [V, B] f32
    win_blk_a,       # [V] int32: region A anchor (512-sample block index)
    win_blk_b,       # [V] int32: region B anchor (loop-reset target)
    block_frames: int = 128,
    r_max: float = R_MAX,
    precision: str = "highest",  # dot precision: highest|default (probe 14)
    variant: str = _DEFAULT_VARIANT,  # chunk-compute variant (_VARIANTS)
    chunk: int = CHUNK,          # frames per inner compute chunk
    align: int = 128,            # slab-offset alignment (lane-slice hint)
    group: int = GROUP,          # voices per grid step
):
    """Returns interp [V, 2, B] f32: linear-interpolated, pre-gain samples."""
    V, B = pos_local.shape
    assert V % group == 0, f"voice count {V} must be a multiple of {group}"
    assert B % chunk == 0, f"block size {B} must be a multiple of {chunk}"
    region = region_rows(B, r_max)
    n_steps = V // group

    n_chunks = B // chunk
    # grid pos/alpha blocks are [GROUP, chunk] of a [V, B] array: Mosaic
    # requires the trailing block dim to be 128-divisible or whole-array
    grid_chunk_ok = chunk % 128 == 0 or chunk == B
    if variant == "auto":
        # dated measurement (probes 19/20 + the pinned-control re-run,
        # NOTES_TPU_ENV.md): grid wins at every block size in clean
        # processes (6/8 paired at B=128, 8/8 at B=1024); the earlier
        # B=1024 ambiguity was drift. "auto" stays a resolution point so a
        # future toolchain can re-split by n_chunks if measurements flip.
        # Probe chunks the grid layout can't tile fall back to fusedw.
        variant = "grid" if grid_chunk_ok else "fusedw"
    elif variant == "grid" and not grid_chunk_ok:
        raise ValueError(
            f"grid variant needs chunk % 128 == 0 or chunk == block "
            f"(chunk {chunk}, block {B}); use fusedw/loop for small chunks"
        )
    scratch_shapes = [
        # window scratch matches the bank dtype: int16 banks DMA half the
        # bytes and dequantize at the slab slice (_slab_f32)
        pltpu.VMEM((2, group, 2, 2 * region), sound_data.dtype),
        pltpu.SemaphoreType.DMA((2, group, 2)),
    ]
    if variant == "grid":
        # flat [V, B] pos/alpha and [V, 2, B] out: Mosaic requires block
        # shapes whose trailing dims are 8/128-divisible or whole-array,
        # which a [G, 1, chunk] block of a [V, n_chunks, chunk] array is not
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_steps, n_chunks),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # sound stays in HBM
                pl.BlockSpec((group, chunk), lambda i, c, wa, wb: (i, c)),
                pl.BlockSpec((group, chunk), lambda i, c, wa, wb: (i, c)),
            ],
            out_specs=pl.BlockSpec(
                (group, 2, chunk), lambda i, c, wa, wb: (i, 0, c)
            ),
            scratch_shapes=scratch_shapes,
        )
        kernel = _make_kernel_grid(
            B, region, slab_cols(r_max, chunk, align), precision, chunk,
            align, group,
        )
        out_shape = jax.ShapeDtypeStruct((V, 2, B), jnp.float32)
        interpret = jax.default_backend() != "tpu"
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(win_blk_a, win_blk_b, sound_data, pos_local, alpha)
        return out
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # sound stays in HBM
                pl.BlockSpec((group, n_chunks, chunk), lambda i, wa, wb: (i, 0, 0)),
                pl.BlockSpec((group, n_chunks, chunk), lambda i, wa, wb: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (group, 2, n_chunks, chunk), lambda i, wa, wb: (i, 0, 0, 0)
            ),
            scratch_shapes=scratch_shapes,
        )
        kernel = _make_kernel(B, region, slab_cols(r_max, chunk, align),
                              precision, variant, chunk, align, group)
    out_shape = jax.ShapeDtypeStruct((V, 2, n_chunks, chunk), jnp.float32)
    # off-TPU (CI, CPU dev) the kernel runs in interpreter mode so the
    # windows path stays testable everywhere
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        win_blk_a, win_blk_b, sound_data,
        pos_local.reshape(V, n_chunks, chunk),
        alpha.reshape(V, n_chunks, chunk),
    )
    return out.reshape(V, 2, B)
