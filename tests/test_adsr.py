"""ADSR tests: closed form vs an independent scalar juce-style simulator,
and numpy vs jax bit-exactness."""

import numpy as np
import pytest

from libzl_tpu.ops import adsr


class JuceAdsrSim:
    """Independent per-sample reimplementation of juce::ADSR semantics
    (linear segments, post-increment getNextSample), used only as a test
    oracle. float32 arithmetic throughout."""

    def __init__(self, attack, decay, sustain, release, sr):
        self.p = (attack, decay, sustain, release)
        self.sr = sr
        f = np.float32
        self.a_rate = f(1.0 / (attack * sr)) if attack > 0 else f(0)
        self.d_rate = f((1.0 - sustain) / (decay * sr)) if decay > 0 else f(0)
        self.sustain = f(sustain)
        self.release = release
        self.env = f(0)
        self.stage = adsr.STAGE_IDLE
        self.rel_rate = f(0)

    def note_on(self):
        if self.a_rate > 0:
            self.stage = adsr.STAGE_ATTACK
        elif self.d_rate > 0:
            self.env = np.float32(1.0)
            self.stage = adsr.STAGE_DECAY
        else:
            self.env = self.sustain
            self.stage = adsr.STAGE_SUSTAIN

    def note_off(self):
        if self.stage != adsr.STAGE_IDLE:
            if self.release > 0:
                self.rel_rate = np.float32(self.env / np.float32(self.release * self.sr))
                self.stage = adsr.STAGE_RELEASE
            else:
                self.env = np.float32(0)
                self.stage = adsr.STAGE_IDLE

    def next_sample(self):
        f = np.float32
        if self.stage == adsr.STAGE_ATTACK:
            self.env = f(self.env + self.a_rate)
            if self.env >= 1.0:
                self.env = f(1.0)
                self.stage = (
                    adsr.STAGE_DECAY if self.d_rate > 0 else adsr.STAGE_SUSTAIN
                )
        elif self.stage == adsr.STAGE_DECAY:
            self.env = max(self.sustain, f(self.env - self.d_rate))
            if self.env <= self.sustain:
                self.stage = adsr.STAGE_SUSTAIN
        elif self.stage == adsr.STAGE_RELEASE:
            self.env = max(f(0), f(self.env - self.rel_rate))
            if self.env <= 0:
                self.stage = adsr.STAGE_IDLE
                self.env = f(0)
        elif self.stage == adsr.STAGE_IDLE:
            return f(0)
        return self.env


def make_prog(stage, env, rates, rel_rate=0.0, release_frame=1 << 30, mode=0):
    return adsr.AdsrProgram(
        stage0=np.array([stage], np.int32),
        env0=np.array([env], np.float32),
        a_rate=np.array([rates["a_rate"]], np.float32),
        d_rate=np.array([rates["d_rate"]], np.float32),
        sustain=np.array([rates["sustain"]], np.float32),
        rel_rate=np.array([rel_rate], np.float32),
        inv_rel=np.array([rates["inv_rel"]], np.float32),
        rel_log2=np.array([rates["rel_log2"]], np.float32),
        release_frame=np.array([release_frame], np.int32),
        rel_mode=np.array([mode], np.int32),
    )


CASES = [
    # attack, decay, sustain, release
    (0.0, 0.1, 1.0, 0.05),   # reference defaults (ClipAudioSource.cpp:164-168)
    (0.01, 0.05, 0.5, 0.1),
    (0.002, 0.0, 0.7, 0.0),
    (0.5, 0.3, 0.2, 0.2),
]


@pytest.mark.parametrize("params", CASES)
def test_closed_form_matches_iterative_ads(params):
    sr = 44100.0
    B = 512
    rates = adsr.make_rates(*params, sr)
    sim = JuceAdsrSim(*params, sr)
    sim.note_on()
    expected = np.array([sim.next_sample() for _ in range(B)], np.float32)

    stage, env = adsr.note_on_stage(params[0], params[1], params[2])
    prog = make_prog(stage, env, rates)
    got = adsr.envelope_block(np, prog, B)[0]
    np.testing.assert_allclose(got, expected, atol=2e-5)


@pytest.mark.parametrize("params", CASES)
def test_closed_form_matches_iterative_with_release(params):
    sr = 48000.0
    B = 1024
    rf = 300
    rates = adsr.make_rates(*params, sr)
    sim = JuceAdsrSim(*params, sr)
    sim.note_on()
    expected = []
    for k in range(B):
        if k == rf:
            sim.note_off()
        expected.append(sim.next_sample())
    expected = np.array(expected, np.float32)

    stage, env = adsr.note_on_stage(params[0], params[1], params[2])
    prog = make_prog(stage, env, rates, release_frame=rf)
    got = adsr.envelope_block(np, prog, B)[0]
    # The scalar oracle accumulates f32 rounding over ~700 release steps;
    # the closed form is the more accurate of the two.
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_exponential_release_matches_repeated_noteoff():
    # The reference's non-looping auto-release calls noteOff every frame
    # (lib/SamplerSynthVoice.cpp:253-255) -> env *= (1 - 1/(R*sr)).
    params = (0.0, 0.1, 1.0, 0.05)
    sr = 48000.0
    B = 2048
    rates = adsr.make_rates(*params, sr)
    sim = JuceAdsrSim(*params, sr)
    sim.note_on()
    expected = []
    for _ in range(B):
        sim.note_off()
        expected.append(sim.next_sample())
    expected = np.array(expected, np.float32)

    prog = make_prog(
        adsr.STAGE_SUSTAIN, 1.0, rates, release_frame=0,
        mode=adsr.RELEASE_MODE_EXPONENTIAL,
    )
    got = adsr.envelope_block(np, prog, B)[0]
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-6)


def test_release_continues_across_blocks():
    params = (0.0, 0.1, 1.0, 0.05)
    sr = 48000.0
    rates = adsr.make_rates(*params, sr)
    sim = JuceAdsrSim(*params, sr)
    sim.note_on()
    sim.note_off()
    expected = np.array([sim.next_sample() for _ in range(256)], np.float32)

    # Block 1: release triggered at frame 0 from sustain.
    prog1 = make_prog(adsr.STAGE_SUSTAIN, 1.0, rates, release_frame=0)
    b1 = adsr.envelope_block(np, prog1, 128)[0]
    # Block 2: continue in-release with the rate fixed at trigger time.
    rel_rate = np.float32(1.0) * rates["inv_rel"]
    prog2 = make_prog(adsr.STAGE_RELEASE, b1[-1], rates, rel_rate=rel_rate)
    b2 = adsr.envelope_block(np, prog2, 128)[0]
    got = np.concatenate([b1, b2])
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_numpy_jax_bit_exact():
    import jax.numpy as jnp

    B = 128
    rng = np.random.default_rng(0)
    V = 64
    stages = rng.integers(0, 5, V).astype(np.int32)
    prog = adsr.AdsrProgram(
        stage0=stages,
        env0=rng.uniform(0, 1, V).astype(np.float32),
        a_rate=rng.uniform(0, 0.01, V).astype(np.float32),
        d_rate=rng.uniform(0, 0.001, V).astype(np.float32),
        sustain=rng.uniform(0, 1, V).astype(np.float32),
        rel_rate=rng.uniform(0, 0.001, V).astype(np.float32),
        inv_rel=rng.uniform(0, 0.001, V).astype(np.float32),
        rel_log2=rng.uniform(-0.001, 0, V).astype(np.float32),
        release_frame=rng.integers(0, 2 * B, V).astype(np.int32),
        rel_mode=rng.integers(0, 2, V).astype(np.int32),
    )
    env_np = adsr.envelope_block(np, prog, B)
    env_jax = np.asarray(adsr.envelope_block(jnp, prog, B))
    # Same formulas, same f32 ops -> bitwise equality on CPU backend,
    # except exp2 whose libm implementation may differ by an ulp.
    exp_rows = prog.rel_mode == 1
    np.testing.assert_array_equal(env_np[~exp_rows], env_jax[~exp_rows])
    np.testing.assert_allclose(env_np[exp_rows], env_jax[exp_rows], rtol=1e-6)


def test_subframe_release_cuts_immediately():
    """release*sr <= 1 makes juce's env *= (1 - 1/(R*sr)) go <= 0 on the
    first release frame — the closed-form exponential must cut to 0, not
    hold a constant envelope (rel_log2 was 0 for inv_rel >= 1)."""
    sr = 48000.0
    for release in (0.5 / sr, 1.0 / sr):
        params = (0.0, 0.1, 1.0, release)
        rates = adsr.make_rates(*params, sr)
        assert rates["inv_rel"] >= 1.0
        sim = JuceAdsrSim(*params, sr)
        sim.note_on()
        expected = []
        for _ in range(8):
            sim.note_off()
            expected.append(sim.next_sample())
        prog = make_prog(
            adsr.STAGE_SUSTAIN, 1.0, rates, release_frame=0,
            mode=adsr.RELEASE_MODE_EXPONENTIAL,
        )
        got = adsr.envelope_block(np, prog, 8)[0]
        np.testing.assert_allclose(got, np.array(expected, np.float32),
                                   atol=1e-6)
