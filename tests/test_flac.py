"""FLAC codec (io/flac.py + native/zl_flac.cpp): lossless roundtrips.

The encoder (pure Python, spec-derived) and decoder (native C++,
spec-derived) are independent implementations of RFC 9639; every test
asserts BIT-EXACT roundtrips, which a matched pair of misreadings would
almost certainly break structurally. Covers: FIXED and LPC predictors,
partition orders 0-3, escape (raw-bits) partitions, wasted bits, all four
stereo decorrelation modes, CONSTANT/silence, odd tail blocks, and the
read_audio dispatch.
"""

import numpy as np
import pytest

from libzl_tpu.io import flac
from libzl_tpu.io.wav import read_audio

SR = 48000

pytestmark = pytest.mark.skipif(
    not flac.available(), reason="native FLAC decoder unavailable (no g++?)"
)


def material(seconds=0.6, channels=2, seed=3):
    rng = np.random.default_rng(seed)
    n = int(SR * seconds)
    t = np.arange(n) / SR
    chans = [
        0.5 * np.sin(2 * np.pi * (330 + 110 * c) * t)
        + 0.02 * rng.standard_normal(n)
        for c in range(channels)
    ]
    return np.stack(chans, axis=1).astype(np.float32)


def as_pcm(x):
    return np.clip(np.round(np.asarray(x) * 32768.0), -32768, 32767).astype(
        np.int32
    )


def roundtrip(tmp_path, x, **kw):
    p = tmp_path / "t.flac"
    flac.write_flac(p, x, SR, **kw)
    a = flac.read_flac(p)
    assert a.sample_rate == SR
    assert a.samples.shape == x.shape
    np.testing.assert_array_equal(as_pcm(a.samples), as_pcm(x))
    return p


@pytest.mark.parametrize("mode", [
    "independent", "mid-side", "left-side", "right-side",
])
def test_stereo_modes_lossless(tmp_path, mode):
    roundtrip(tmp_path, material(), stereo_mode=mode)


@pytest.mark.parametrize("predictor,po", [
    ("fixed", 0), ("fixed", 2), ("lpc", 0), ("lpc", 3),
])
def test_predictors_and_partitions(tmp_path, predictor, po):
    roundtrip(tmp_path, material(), predictor=predictor, partition_order=po)


def test_lpc_compresses_better_than_fixed(tmp_path):
    x = material(seconds=1.0)
    p_fixed = tmp_path / "f.flac"
    p_lpc = tmp_path / "l.flac"
    flac.write_flac(p_fixed, x, SR, predictor="fixed")
    flac.write_flac(p_lpc, x, SR, predictor="lpc")
    assert p_lpc.stat().st_size < p_fixed.stat().st_size < x.nbytes // 2


def test_wasted_bits(tmp_path):
    # samples are multiples of 16: four common trailing zero bits
    x = (np.round(material() * 2048.0) * 16.0 / 32768.0).astype(np.float32)
    roundtrip(tmp_path, x, predictor="lpc")


def test_escape_partitions(tmp_path, monkeypatch):
    monkeypatch.setattr(flac, "_ESCAPE_QUOTIENT_LIMIT", 0)
    roundtrip(tmp_path, material(), partition_order=2)


def test_silence_and_mono_and_odd_tail(tmp_path):
    roundtrip(tmp_path, np.zeros((10000, 2), np.float32))
    roundtrip(tmp_path, material(channels=1))
    # length deliberately not a multiple of the block size
    roundtrip(tmp_path, material(seconds=0.171))


def test_read_audio_dispatches_flac(tmp_path):
    x = material()
    p = tmp_path / "clip.dat"  # wrong extension: magic-sniffed
    flac.write_flac(p, x, SR)
    a = read_audio(p)
    np.testing.assert_array_equal(as_pcm(a.samples), as_pcm(x))


def test_clip_loads_flac(tmp_path):
    from libzl_tpu.engine.engine import AudioEngine
    from libzl_tpu.models.clip import ClipAudioSource

    p = tmp_path / "clip.flac"
    flac.write_flac(p, material(seconds=0.2), SR)
    e = AudioEngine(sample_rate=SR, backend="numpy", num_voices=8)
    clip = ClipAudioSource(e, filepath=str(p))
    clip.play(loop=False, midi_channel=0)
    e.start_transport(bpm=120)
    out = np.concatenate(
        [np.asarray(e.process_block().outputs.master) for _ in range(20)]
    )
    assert np.abs(out).max() > 0.05


def test_corrupt_flac_raises(tmp_path):
    p = tmp_path / "bad.flac"
    p.write_bytes(b"fLaC" + b"\x00" * 64)
    with pytest.raises(ValueError):
        flac.read_flac(p)


def test_coded_number_framing():
    """FLAC's coded number is UTF-8 framing WITHOUT the surrogate gap: it
    must agree with UTF-8 below the gap and not raise inside/above it."""
    for n in (0, 0x7F, 0x80, 0x7FF, 0x800, 0xD7FF, 0xFFFF, 0x10FFFF):
        if n < 0xD800:
            assert flac._utf8_number(n) == chr(n).encode("utf-8")
    assert flac._utf8_number(0xD800) == b"\xed\xa0\x80"
    assert len(flac._utf8_number((1 << 31) - 1)) == 6
    assert len(flac._utf8_number((1 << 36) - 1)) == 7


def test_recorder_flac_target(tmp_path):
    """A record prefix ending .flac selects lossless FLAC recording (the
    sidecar WAV streams in realtime, transcoding happens post-roll)."""
    from libzl_tpu.engine.recorder import DiskRecorder

    target = tmp_path / "take.flac"
    rec = DiskRecorder()
    rec.start(target, SR)
    rng = np.random.default_rng(0)
    blocks = [
        (0.2 * rng.standard_normal((128, 2))).astype(np.float32)
        for _ in range(50)
    ]
    for b in blocks:
        rec.push(b)
    rec.stop()
    assert target.exists()
    assert not (tmp_path / "take.flac.part.wav").exists()
    a = flac.read_flac(target)
    ref = np.concatenate(blocks)
    # the realtime WAV writer quantizes with round(x * 32767) — the FLAC
    # transcode preserves exactly those samples
    expected = np.round(np.clip(ref, -1.0, 1.0) * 32767.0).astype(np.int32)
    np.testing.assert_array_equal(as_pcm(a.samples), expected)


def test_corrupt_total_samples_header_bounded_alloc(tmp_path):
    """A corrupt 36-bit STREAMINFO total_samples must not drive a
    multi-hundred-GB allocation: the reader bounds its guess against the
    compressed size and reports a clean truncation error."""
    import pytest

    p = tmp_path / "ok.flac"
    sig = (0.25 * np.sin(2 * np.pi * 440 * np.arange(2000) / 48000)
           ).astype(np.float32)
    flac.write_flac(p, sig, 48000)
    blob = bytearray(p.read_bytes())
    # STREAMINFO total_samples: last 36 bits of the 34-byte block starting
    # at offset 8 (4 "fLaC" + 4 block header); bytes 8+13..8+17, low 4 bits
    # of byte 21 plus bytes 22-25 hold <4 bits rate tail><36 bits total>
    blob[8 + 13] |= 0x0F
    for i in range(14, 18):
        blob[8 + i] = 0xFF
    bad = tmp_path / "bad.flac"
    bad.write_bytes(bytes(blob))
    with pytest.raises(ValueError):
        flac.read_flac(bad)


def test_write_flac_rejects_out_of_range_sample_rate(tmp_path):
    import pytest

    sig = np.zeros(256, np.float32)
    for rate in (0, 1 << 20, 1_500_000):
        with pytest.raises(ValueError, match="sample_rate"):
            flac.write_flac(tmp_path / "r.flac", sig, rate)
    flac.write_flac(tmp_path / "ok.flac", sig, (1 << 20) - 1)  # max legal


def test_write_flac_header_field_bounds(tmp_path):
    """RFC 9639 field widths enforced at encode time: STREAMINFO blocksize
    is 16-bit (>=16) and sample rate 20-bit — out-of-range values used to
    wrap silently in the header and break external decoders."""
    x = np.zeros(64, np.float32)
    with pytest.raises(ValueError, match="block_size"):
        flac.write_flac(tmp_path / "a.flac", x, 48000, block_size=8)
    with pytest.raises(ValueError, match="block_size"):
        flac.write_flac(tmp_path / "b.flac", x, 48000, block_size=70000)
    with pytest.raises(ValueError, match="sample_rate"):
        flac.write_flac(tmp_path / "c.flac", x, 0)
    with pytest.raises(ValueError, match="sample_rate"):
        flac.write_flac(tmp_path / "d.flac", x, 1 << 20)


def test_read_flac_without_native_decoder(tmp_path, monkeypatch):
    p = tmp_path / "x.flac"
    p.write_bytes(b"fLaC")
    monkeypatch.setattr(flac, "load", lambda: None)
    with pytest.raises(ValueError, match="not supported on this host"):
        flac.read_flac(p)


def test_coded_number_out_of_range():
    with pytest.raises(ValueError, match="coded number out of range"):
        flac._utf8_number(1 << 36)


def test_write_flac_rejects_three_channels(tmp_path):
    x = np.zeros((256, 3), np.float32)
    with pytest.raises(ValueError, match="at most 2 channels"):
        flac.write_flac(tmp_path / "x.flac", x, SR)


@pytest.mark.parametrize("frames", [1, 2])
def test_tiny_blocks_roundtrip(tmp_path, frames):
    """1- and 2-frame signals take the order-0 residual path (too short
    for the fixed predictor) and must still roundtrip bit-exactly."""
    x = (np.arange(1, frames + 1, dtype=np.float32) * 0.123)[:, None]
    roundtrip(tmp_path, x)


def test_partition_order_resets_on_odd_tail(tmp_path):
    """A tail block whose length is not divisible by 2^partition_order (or
    leaves partitions shorter than the predictor order) must fall back to
    one partition — and still roundtrip."""
    x = material(seconds=(4096 + 100) / SR)
    assert x.shape[0] == 4096 + 100
    roundtrip(tmp_path, x, partition_order=3)


def test_decode_grows_capacity_when_header_declares_nothing(tmp_path):
    """total_samples=0 is legal (streamed FLAC): the reader's capacity
    guess from the compressed size must grow-and-retry until the
    hyper-compressed stream fits."""
    p = tmp_path / "t.flac"
    n = 400_000  # constant silence compresses to ~a few hundred bytes
    flac.write_flac(p, np.zeros(n, np.float32), SR)
    blob = bytearray(p.read_bytes())
    # STREAMINFO total_samples: low 4 bits of byte 8+13, bytes 8+14..17
    blob[8 + 13] &= 0xF0
    for i in range(14, 18):
        blob[8 + i] = 0
    q = tmp_path / "nolen.flac"
    q.write_bytes(bytes(blob))
    a = flac.read_flac(q)
    assert a.samples.shape == (n, 1)
    assert not a.samples.any()


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            byte = self.data[self.pos // 8]
            v = (v << 1) | ((byte >> (7 - self.pos % 8)) & 1)
            self.pos += 1
        return v


def test_verbatim_escape_subframe():
    """Residuals past the Rice-representable ceiling must fall back to a
    VERBATIM subframe (RFC 9639 §9.2.4) — with wasted bits still factored
    out. Unreachable through the 16-bit write_flac front end, so driven at
    the subframe level and verified bit-for-bit."""
    bps = 32
    # odd magnitudes x2: exactly one wasted bit, and the order-2 residual
    # still exceeds the 2^28 escape ceiling after the wasted shift
    a = (1 << 29) + 1
    sig = np.array([0, a, -a, a, 0, -a], np.int64) * 2
    bw = flac._BitWriter()
    flac._write_subframe(bw, sig.copy(), bps)
    bw.align()
    br = _BitReader(bw.bytes())
    assert br.read(1) == 0          # padding bit
    assert br.read(6) == 1          # subframe type: VERBATIM
    assert br.read(1) == 1          # wasted-bits flag
    assert br.read(1) == 1          # unary(wasted-1) for wasted=1: "1"
    eff = bps - 1
    for want in (sig >> 1).tolist():
        got = br.read(eff)
        if got >= 1 << (eff - 1):
            got -= 1 << eff         # two's complement
        assert got == want
