"""Closed-form, vectorized ADSR envelope evaluation.

The reference advances a juce::ADSR one sample at a time inside the voice loop
(lib/SamplerSynthVoice.cpp:201 `adsr.getNextSample()`); rates are the JUCE
linear-segment semantics with parameters set from the clip
(lib/ClipAudioSource.cpp:164-168 — defaults attack=0, decay=0.1, sustain=1,
release=0.05) and the *source* sample rate (lib/SamplerSynthVoice.cpp:135 —
the envelope advances once per output frame but its rates are computed at the
source rate; reproduced here).

The TPU build evaluates the envelope in closed form over a whole block
(SURVEY.md §7 step 2): each stage is a linear ramp, so the envelope at output
frame k of a block is a piecewise-linear function of k, fully data-parallel
over [V, B]. One deviation from per-sample iteration is documented: repeated
`noteOff` calls (the reference's non-looping auto-release,
lib/SamplerSynthVoice.cpp:253-255, recomputes the release rate every frame,
producing an exponential decay env *= (1 - 1/(R*sr))) are modeled exactly as
that exponential (`RELEASE_MODE_EXPONENTIAL`).

This module is written against an array-namespace parameter `xp` so the exact
same expressions run under numpy (host state mirror / golden reference) and
jax.numpy (device kernel). Bit-identical f32 math on both sides is a test
invariant (tests/test_adsr.py).

Stage encoding: 0=idle, 1=attack, 2=decay, 3=sustain, 4=release.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import numpy as np

STAGE_IDLE = 0
STAGE_ATTACK = 1
STAGE_DECAY = 2
STAGE_SUSTAIN = 3
STAGE_RELEASE = 4

RELEASE_MODE_LINEAR = 0       # single noteOff: rate fixed at trigger (juce)
RELEASE_MODE_EXPONENTIAL = 1  # noteOff re-issued per frame (auto-release quirk)


class AdsrProgram(NamedTuple):
    """Per-voice envelope program for one block. All arrays shaped [V].

    stage0/env0:   envelope state at block start.
    a_rate/d_rate: juce rates (1/(A*sr), (1-S)/(D*sr)); 0 when unused.
    sustain:       sustain level.
    rel_rate:      linear release rate, valid when stage0==RELEASE.
    inv_rel:       1/(R*sr_source); 0 means release<=0 (immediate cut).
    rel_log2:      log2(1 - inv_rel), for the exponential mode.
    release_frame: frame at which noteOff applies; >= B means none this block.
    rel_mode:      release mode for both in-progress and newly triggered release.
    """

    stage0: Any
    env0: Any
    a_rate: Any
    d_rate: Any
    sustain: Any
    rel_rate: Any
    inv_rel: Any
    rel_log2: Any
    release_frame: Any
    rel_mode: Any


def _safe_ceil_div(xp, num, den):
    """ceil(num/den) with den==0 -> 0, clamped to >= 0, as int32."""
    den_ok = den > 0
    q = xp.where(den_ok, num / xp.where(den_ok, den, 1.0), 0.0)
    return xp.maximum(xp.ceil(q), 0.0).astype(np.int32)


def ads_env_at(xp, prog: AdsrProgram, k):
    """Attack/decay/sustain envelope value at frame index k (no release).

    k may be any broadcastable int array; result is f32. Frame k's value is
    what juce's getNextSample() returns on the (k+1)-th call.
    """
    f32 = np.float32
    one = f32(1.0)
    env0 = prog.env0
    in_attack = prog.stage0 == STAGE_ATTACK
    ka = xp.where(
        in_attack, _safe_ceil_div(xp, one - env0, prog.a_rate), np.int32(0)
    )
    e_d = xp.where(in_attack, one, env0)
    has_decay = xp.logical_or(
        xp.logical_and(in_attack, prog.d_rate > 0), prog.stage0 == STAGE_DECAY
    )
    kd = xp.where(
        has_decay, _safe_ceil_div(xp, e_d - prog.sustain, prog.d_rate), np.int32(0)
    )
    e_s = xp.where(has_decay, prog.sustain, e_d)
    kf = (k + 1).astype(f32)
    attack_env = xp.minimum(env0 + kf * prog.a_rate, one)
    decay_env = xp.maximum(e_d - (k - ka + 1).astype(f32) * prog.d_rate, prog.sustain)
    return xp.where(k < ka, attack_env, xp.where(k < ka + kd, decay_env, e_s)).astype(
        f32
    )


def release_env(xp, e_r, steps, rel_rate, rel_log2, mode):
    """Envelope `steps` frames after entering release from value e_r."""
    f32 = np.float32
    # steps < 0 only occurs in lanes discarded by an outer where(); clamp so
    # the dead lanes don't overflow.
    sf = xp.maximum(steps, 0).astype(f32)
    linear = xp.maximum(e_r - sf * rel_rate, f32(0.0))
    exponential = e_r * xp.exp2(sf * rel_log2)
    return xp.where(mode == RELEASE_MODE_EXPONENTIAL, exponential, linear).astype(f32)


def envelope_values(xp, prog: AdsrProgram, k):
    """Envelope at arbitrary voice-local frame indices.

    prog fields and `k` must already be mutually broadcastable (e.g. fields
    [V,1] with k [1,B], or fields [V] with k [V]). Returns f32 of the
    broadcast shape.
    """
    f32 = np.float32
    stage0 = prog.stage0
    env0 = prog.env0
    rf = prog.release_frame
    mode = prog.rel_mode

    ads = ads_env_at(xp, prog, k)

    # Value just before the newly triggered release (frame rf-1; env0 if rf==0).
    e_r = xp.where(rf > 0, ads_env_at(xp, prog, xp.maximum(rf - 1, 0)), env0)
    new_rel_rate = e_r * prog.inv_rel
    # inv_rel == 0 means release<=0: immediate cut to zero (juce noteOff else-branch)
    immediate = prog.inv_rel <= 0
    new_release = xp.where(
        immediate,
        f32(0.0),
        release_env(xp, e_r, k - rf + 1, new_rel_rate, prog.rel_log2, mode),
    )

    from_release = release_env(
        xp, env0, k + 1, prog.rel_rate, prog.rel_log2, mode
    )

    env = xp.where(
        stage0 == STAGE_IDLE,
        f32(0.0),
        xp.where(
            stage0 == STAGE_RELEASE,
            from_release,
            xp.where(k < rf, ads, new_release),
        ),
    )
    return env.astype(f32)


def envelope_block(xp, prog: AdsrProgram, block_frames: int, start_frame=None):
    """Envelope values for a whole block: returns [V, B] f32.

    prog fields are [V]; k runs over [0, B). `start_frame` (optional [V])
    shifts the envelope origin for voices that start mid-block: the envelope
    advances in voice-local frames k - start_frame (values at k < start_frame
    are unused — the render mask gates them). `release_frame` is interpreted
    in the same voice-local frame space.
    """
    if xp is np:
        k = np.arange(block_frames, dtype=np.int32)[None, :]
    else:
        import jax

        k = jax.lax.broadcasted_iota(np.int32, (1, block_frames), 1)
    if start_frame is not None:
        k = xp.maximum(k - start_frame[:, None], 0)
    prog2 = AdsrProgram(*(f[:, None] for f in prog))
    return envelope_values(xp, prog2, k)


def envelope_final(xp, prog: AdsrProgram, n_frames):
    """Envelope at the last rendered frame (voice-local n_frames-1) per
    voice: O(V), used by the host state mirror instead of a full block."""
    k = xp.maximum(n_frames - 1, 0).astype(np.int32)
    return envelope_values(xp, prog, k)


def make_rates(attack: float, decay: float, sustain: float, release: float,
               source_rate: float) -> dict:
    """juce::ADSR rate computation (recalculateRates), at the source rate."""
    a_rate = 1.0 / (attack * source_rate) if attack > 0 else 0.0
    d_rate = (1.0 - sustain) / (decay * source_rate) if decay > 0 else 0.0
    inv_rel = 1.0 / (release * source_rate) if release > 0 else 0.0
    if 0 < inv_rel < 1:
        rel_log2 = float(np.log2(np.float32(1.0) - np.float32(inv_rel)))
    elif inv_rel >= 1:
        # juce's env *= (1 - inv_rel) goes <= 0 on the first release frame
        # (sub-frame release times): the exponential form must cut, not
        # hold — exp2(-200) underflows f32 to exactly 0 after one step
        rel_log2 = -200.0
    else:
        rel_log2 = 0.0
    return dict(
        a_rate=np.float32(a_rate),
        d_rate=np.float32(d_rate),
        sustain=np.float32(sustain),
        inv_rel=np.float32(inv_rel),
        rel_log2=np.float32(rel_log2),
    )


def note_on_stage(attack: float, decay: float, sustain: float):
    """juce::ADSR::noteOn state decision: returns (stage, env).

    attack>0 -> attack from current env (we start voices at env 0);
    else decay_rate>0 -> env=1, decay; else env=sustain, sustain.
    """
    if attack > 0:
        return STAGE_ATTACK, 0.0
    if decay > 0 and sustain < 1.0:
        return STAGE_DECAY, 1.0
    return STAGE_SUSTAIN, float(sustain)
