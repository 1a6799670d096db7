"""AIFF/AIFC read support (the juce basic-formats breadth,
lib/WaveFormItem.cpp:29) + the read_audio container sniffing."""

import struct

import numpy as np
import pytest

from libzl_tpu.io.wav import read_aiff, read_audio, write_wav

SR = 48000


def _f80(value: float) -> bytes:
    """Encode an 80-bit extended float (sample rates are small ints)."""
    import math

    if value == 0:
        return b"\x00" * 10
    exp = int(math.floor(math.log2(value)))
    mant = int(value / 2.0**exp * (1 << 63))
    return struct.pack(">H", exp + 16383) + struct.pack(">Q", mant)


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return cid + struct.pack(">I", len(body)) + body + pad


def make_aiff(samples, rate=SR, comp=None, bits=16):
    """Build an AIFF (comp=None) or AIFC file in memory."""
    x = np.asarray(samples)
    n_frames, n_ch = x.shape
    if comp in (None, b"NONE", b"twos"):
        raw = (np.clip(x, -1, 1) * 32767).astype(">i2").tobytes()
        bits = 16
    elif comp == b"sowt":
        raw = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
        bits = 16
    elif comp == b"fl32":
        raw = x.astype(">f4").tobytes()
        bits = 32
    else:
        raise ValueError(comp)
    comm = struct.pack(">hLh", n_ch, n_frames, bits) + _f80(rate)
    form_type = b"AIFF" if comp is None else b"AIFC"
    if comp is not None:
        comm += comp + b"\x00\x00"  # empty pascal compression name
    ssnd = struct.pack(">LL", 0, 0) + raw
    body = form_type + _chunk(b"COMM", comm) + _chunk(b"SSND", ssnd)
    return b"FORM" + struct.pack(">I", len(body)) + body


def tone(seconds=0.1, freq=440.0, channels=2):
    t = np.arange(int(SR * seconds)) / SR
    x = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    return np.stack([x] * channels, axis=1)


@pytest.mark.parametrize("comp", [None, b"sowt", b"fl32"])
def test_aiff_roundtrip(tmp_path, comp):
    x = tone()
    p = tmp_path / "t.aiff"
    p.write_bytes(make_aiff(x, comp=comp))
    a = read_aiff(p)
    assert a.sample_rate == SR
    assert a.samples.shape == x.shape
    tol = 1e-4 if comp in (None, b"sowt") else 1e-7
    np.testing.assert_allclose(a.samples, x, atol=tol)


def test_read_audio_sniffs_container(tmp_path):
    x = tone()
    wav_p = tmp_path / "w.dat"   # wrong extension on purpose
    aiff_p = tmp_path / "a.dat"
    write_wav(wav_p, x, SR)
    aiff_p.write_bytes(make_aiff(x))
    for p in (wav_p, aiff_p):
        a = read_audio(p)
        assert a.sample_rate == SR
        np.testing.assert_allclose(a.samples, x, atol=1e-4)


def test_clip_loads_aiff(tmp_path):
    from libzl_tpu.engine.engine import AudioEngine
    from libzl_tpu.models.clip import ClipAudioSource

    p = tmp_path / "clip.aif"
    p.write_bytes(make_aiff(tone(seconds=0.2)))
    e = AudioEngine(sample_rate=SR, backend="numpy", num_voices=8)
    clip = ClipAudioSource(e, filepath=str(p))
    clip.play(loop=False, midi_channel=0)
    e.start_transport(bpm=120)
    out = np.concatenate(
        [np.asarray(e.process_block().outputs.master) for _ in range(20)]
    )
    assert np.abs(out).max() > 0.05


def test_compressed_formats_raise_clearly(tmp_path):
    flac = tmp_path / "x.flac"
    flac.write_bytes(b"fLaC" + b"\x00" * 64)
    with pytest.raises(ValueError, match="FLAC"):
        read_audio(flac)
    ogg = tmp_path / "x.ogg"
    ogg.write_bytes(b"OggS" + b"\x00" * 64)
    with pytest.raises(ValueError, match="OGG"):
        read_audio(ogg)
    aifc = tmp_path / "x.aifc"
    # an AIFC claiming ulaw compression
    comm = struct.pack(">hLh", 1, 10, 16) + _f80(SR) + b"ulaw" + b"\x00\x00"
    ssnd = struct.pack(">LL", 0, 0) + b"\x00" * 20
    body = b"AIFC" + _chunk(b"COMM", comm) + _chunk(b"SSND", ssnd)
    aifc.write_bytes(b"FORM" + struct.pack(">I", len(body)) + body)
    with pytest.raises(ValueError, match="compressed AIFC"):
        read_audio(aifc)


def test_aiff_20bit_left_justified(tmp_path):
    """sampleSize need not be a multiple of 8 (AIFF-C spec): 20-bit samples
    store left-justified in 3 bytes and must decode at the storage width."""
    x = tone(seconds=0.05, channels=1)
    n_frames = x.shape[0]
    ints24 = (np.clip(x[:, 0], -1, 1) * (1 << 19)).astype(np.int32) << 4
    raw = bytearray()
    for v in ints24.tolist():
        raw += int(v & 0xFFFFFF).to_bytes(3, "big")
    comm = struct.pack(">hLh", 1, n_frames, 20) + _f80(SR)
    ssnd = struct.pack(">LL", 0, 0) + bytes(raw)
    body = b"AIFF" + _chunk(b"COMM", comm) + _chunk(b"SSND", ssnd)
    p = tmp_path / "t20.aiff"
    p.write_bytes(b"FORM" + struct.pack(">I", len(body)) + body)
    a = read_aiff(p)
    assert a.samples.shape == (n_frames, 1)
    np.testing.assert_allclose(a.samples[:, 0], x[:, 0], atol=3e-6)
