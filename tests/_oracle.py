"""Independent scalar oracles for golden tests.

These re-implement the reference's per-frame semantics the slow, obvious way
(one voice, one frame at a time, float64 positions) as a cross-check of the
engine's closed-form block evaluation. They are derived from the documented
behavior of lib/SamplerSynthVoice.cpp / juce::ADSR, not from the engine code.
"""

from __future__ import annotations

import numpy as np

from libzl_tpu.ops import adsr as adsr_mod


class JuceAdsrSim:
    """Per-sample juce::ADSR semantics (linear segments, post-increment)."""

    def __init__(self, attack, decay, sustain, release, sr):
        f = np.float32
        self.a_rate = f(1.0 / (attack * sr)) if attack > 0 else f(0)
        self.d_rate = f((1.0 - sustain) / (decay * sr)) if decay > 0 else f(0)
        self.sustain = f(sustain)
        self.release = release
        self.sr = sr
        self.env = f(0)
        self.stage = adsr_mod.STAGE_IDLE
        self.rel_rate = f(0)

    def note_on(self):
        if self.a_rate > 0:
            self.stage = adsr_mod.STAGE_ATTACK
        elif self.d_rate > 0:
            self.env = np.float32(1.0)
            self.stage = adsr_mod.STAGE_DECAY
        else:
            self.env = self.sustain
            self.stage = adsr_mod.STAGE_SUSTAIN

    def note_off(self):
        if self.stage != adsr_mod.STAGE_IDLE:
            if self.release > 0:
                self.rel_rate = np.float32(
                    self.env / np.float32(self.release * self.sr)
                )
                self.stage = adsr_mod.STAGE_RELEASE
            else:
                self.env = np.float32(0)
                self.stage = adsr_mod.STAGE_IDLE

    @property
    def active(self):
        return self.stage != adsr_mod.STAGE_IDLE

    def next_sample(self):
        f = np.float32
        if self.stage == adsr_mod.STAGE_ATTACK:
            self.env = f(self.env + self.a_rate)
            if self.env >= 1.0:
                self.env = f(1.0)
                self.stage = (
                    adsr_mod.STAGE_DECAY if self.d_rate > 0
                    else adsr_mod.STAGE_SUSTAIN
                )
        elif self.stage == adsr_mod.STAGE_DECAY:
            self.env = max(self.sustain, f(self.env - self.d_rate))
            if self.env <= self.sustain:
                self.stage = adsr_mod.STAGE_SUSTAIN
        elif self.stage == adsr_mod.STAGE_RELEASE:
            self.env = max(f(0), f(self.env - self.rel_rate))
            if self.env <= 0:
                self.stage = adsr_mod.STAGE_IDLE
                self.env = f(0)
        elif self.stage == adsr_mod.STAGE_IDLE:
            return f(0)
        return self.env


class ScalarVoiceSim:
    """One voice, rendered one frame at a time (reference voice-loop rules)."""

    def __init__(
        self,
        sound,              # [L, 2] f32
        *,
        ratio,              # pitch ratio (pass the engine's quantized value)
        istart,             # int start sample
        stop,               # int stop sample
        gain=1.0,
        clip_volume=1.0,
        pan=0.0,
        adsr=(0.0, 0.1, 1.0, 0.05),
        source_rate=48000.0,
        looping=False,
        beat_quantized=False,
        loop_samples=None,  # f64 samples per loop (beat-quantized)
        first_loop_sample=None,  # absolute sample of the first wrap
        quirk_gain=False,
    ):
        self.sound = np.asarray(sound, np.float32)
        self.L = self.sound.shape[0]
        self.ratio = float(ratio)
        self.istart = int(istart)
        self.stop = int(stop)
        self.gain = np.float32(gain)
        self.clip_volume = np.float32(clip_volume)
        self.pan = np.float32(pan)
        self.looping = looping
        self.beat_quantized = beat_quantized
        self.loop_samples = loop_samples
        self.next_loop_sample = first_loop_sample
        self.quirk = quirk_gain
        self.adsr = JuceAdsrSim(*adsr, source_rate)
        self.adsr.note_on()
        self.release_samples = adsr[3] * source_rate
        self.pos = float(self.istart)
        self.playing = True
        self.note_off_sent = False

    def note_off(self):
        self.note_off_sent = True

    def render(self, num_frames, block_start_sample=0):
        """Returns [num_frames, 2] f32 (zeros after the voice stops)."""
        out = np.zeros((num_frames, 2), np.float32)
        f = np.float32
        for k in range(num_frames):
            if not self.playing:
                break
            if self.note_off_sent:
                self.adsr.note_off()
                self.note_off_sent = False
            ipos = int(self.pos)
            alpha = f(self.pos - ipos)
            inv = f(1.0) - alpha
            env = self.adsr.next_sample()
            if self.L - 1 > ipos:
                t0 = self.sound[ipos]
                t1 = self.sound[ipos + 1]
                if self.quirk:
                    l = t0[0] * inv + t1[0] * alpha * self.gain * env * self.clip_volume
                    r = t0[1] * inv + t1[1] * alpha * self.gain * env * self.clip_volume
                else:
                    g = self.gain * env * self.clip_volume
                    l = (t0[0] * inv + t1[0] * alpha) * g
                    r = (t0[1] * inv + t1[1] * alpha) * g
            else:
                l = r = f(0.0)
            m = f(0.5) * (l + r)
            s = l - r
            lp = f(0.5) * (f(1.0) + self.pan)
            rp = f(0.5) * (f(1.0) - self.pan)
            out[k, 0] = lp * m + s
            out[k, 1] = rp * m - s

            self.pos += self.ratio
            if self.looping:
                if self.beat_quantized:
                    if block_start_sample + k >= self.next_loop_sample:
                        self.next_loop_sample += self.loop_samples
                        self.pos = float(self.istart)
                elif self.pos >= self.stop:
                    self.pos = float(self.istart)
            else:
                if self.pos >= self.stop:
                    self.playing = False
                elif self.pos >= self.stop - self.release_samples:
                    self.note_off_sent = True
            if not self.adsr.active:
                self.playing = False
        return out
