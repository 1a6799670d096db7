"""Channel-strip / passthrough mixing ops (the JackPassthrough equivalent).

The reference runs 11 "passthrough" JACK clients (GlobalPlayback +
FXPassthrough-Channel1..10, lib/MidiRouter.cpp:876-883), each splitting a
stereo input into dry / wetFx1 / wetFx2 pairs with per-strip amount, linear
pan and mute (lib/JackPassthrough.cpp:45-115). Here the whole strip fabric is
one vectorized op fused into the render graph; the reference's memcpy/memset
fast paths (:63-92) are special cases of the same formula (amount in {0,1},
pan==0) and therefore semantics-neutral.

Linear pan law (lib/JackPassthrough.cpp:100-110):
    out_l = amount * in_l * min(1 - pan, 1)
    out_r = amount * in_r * min(1 + pan, 1)
"""

from __future__ import annotations

from typing import Any, NamedTuple

import numpy as np


class StripParams(NamedTuple):
    """Parameters for K strips; arrays [K] f32 (muted as 0/1 f32)."""

    dry: Any
    wet1: Any
    wet2: Any
    pan: Any
    muted: Any


def default_strip_params(num_strips: int) -> StripParams:
    """Reference defaults: dry=1, wets=1, pan=0, unmuted
    (lib/JackPassthrough.cpp:24-28); the GlobalPlayback strip's wets are
    zeroed at creation by MidiRouter (lib/MidiRouter.cpp:876-880) — the host
    engine applies that policy, not this constructor."""
    ones = np.ones(num_strips, np.float32)
    zeros = np.zeros(num_strips, np.float32)
    return StripParams(dry=ones.copy(), wet1=ones.copy(), wet2=ones.copy(),
                       pan=zeros.copy(), muted=zeros.copy())


def apply_strips(xp, audio, params: StripParams):
    """Apply K strips to K stereo streams.

    audio: [K, B, 2] f32. Returns (dry, wet1, wet2), each [K, B, 2].
    """
    f32 = np.float32
    one = f32(1.0)
    pan = params.pan[:, None]
    gate = (one - params.muted)[:, None]  # 0 when muted
    l_scale = xp.minimum(one - pan, one) * gate
    r_scale = xp.minimum(one + pan, one) * gate
    scale = xp.stack([l_scale, r_scale], axis=-1)  # [K, 1, 2]
    # hoist the shared product: bit-identical to audio*scale*amount (same
    # left-associative f32 order) but the numpy mirror pays the [K, B, 2]
    # multiply once instead of once per send (XLA CSEs it on device)
    scaled = audio * scale

    def send(amount):
        return (scaled * amount[:, None, None]).astype(f32)

    return send(params.dry), send(params.wet1), send(params.wet2)
