"""Decoder edge formats: the WAV/AIFF branches the roundtrip suites skip.

The juce basic-formats matrix (WaveFormItem.cpp:29 registers them all)
includes widths and float variants real sample libraries contain; each
branch below decodes against a hand-built container with a known signal,
so a byte-order or scaling slip fails loudly rather than as quiet noise.
"""

import struct

import numpy as np
import pytest

from libzl_tpu.io.wav import AudioData, _decode_pcm, read_aiff, read_wav

SR = 48000


def _riff(fmt_code: int, bits: int, data: bytes, n_channels: int = 1) -> bytes:
    block = n_channels * (bits // 8)
    fmt = struct.pack("<HHIIHH", fmt_code, n_channels, SR, SR * block,
                      block, bits)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _aiff(comp: bytes, bits: int, body: bytes, n_frames: int,
          n_channels: int = 1) -> bytes:
    # 80-bit extended float for 48000.0 = 0xBB80 * 2^48 * 2^(exp-16446)
    # with the explicit integer bit set -> exp = 16398
    f80 = struct.pack(">HQ", 16383 + 15, 0xBB80 << 48)
    comm = struct.pack(">hLh", n_channels, n_frames, bits) + f80 + comp \
        + b"\x00\x00"
    ssnd = struct.pack(">LL", 0, 0) + body
    chunks = (
        b"COMM" + struct.pack(">L", len(comm)) + comm
        + b"SSND" + struct.pack(">L", len(ssnd)) + ssnd
    )
    return b"FORM" + struct.pack(">L", 4 + len(chunks)) + b"AIFC" + chunks


def test_u8_pcm_wav(tmp_path):
    """8-bit WAV PCM is unsigned with a 128 bias."""
    x = np.array([-1.0, -0.5, 0.0, 0.5, 127 / 128], np.float32)
    raw = np.round(x * 128.0 + 128.0).clip(0, 255).astype(np.uint8).tobytes()
    p = tmp_path / "u8.wav"
    p.write_bytes(_riff(1, 8, raw))
    back = read_wav(p)
    np.testing.assert_allclose(back.samples[:, 0], x, atol=1 / 128)


def test_i32_pcm_wav(tmp_path):
    x = np.array([-1.0, 0.25, 0.5], np.float64)
    raw = np.round(x * (1 << 31)).clip(-(1 << 31), (1 << 31) - 1) \
        .astype("<i4").tobytes()
    p = tmp_path / "i32.wav"
    p.write_bytes(_riff(1, 32, raw))
    back = read_wav(p)
    np.testing.assert_allclose(back.samples[:, 0], x, atol=2**-30)


def test_f64_wav(tmp_path):
    """scipy writes float64 WAVs (format 3, 64-bit); loading them as f4
    would yield twice the frames of noise."""
    x = np.sin(np.arange(100) * 0.1)
    p = tmp_path / "f64.wav"
    p.write_bytes(_riff(3, 64, x.astype("<f8").tobytes()))
    back = read_wav(p)
    assert back.num_frames == 100
    np.testing.assert_allclose(back.samples[:, 0], x, atol=1e-6)


def test_unsupported_float_width_raises(tmp_path):
    p = tmp_path / "f16.wav"
    p.write_bytes(_riff(3, 16, b"\x00" * 32))
    with pytest.raises(ValueError, match="float WAV width"):
        read_wav(p)


def test_unsupported_format_code_raises(tmp_path):
    p = tmp_path / "adpcm.wav"
    p.write_bytes(_riff(2, 4, b"\x00" * 32))
    with pytest.raises(ValueError):
        read_wav(p)


def test_decode_pcm_unsupported_width():
    with pytest.raises(ValueError, match="sample width"):
        _decode_pcm(b"\x00" * 10, 5, 1)


def test_aiff_fl64(tmp_path):
    x = np.array([-0.75, 0.0, 0.3, 1.0], np.float64)
    p = tmp_path / "f64.aiff"
    p.write_bytes(_aiff(b"fl64", 64, x.astype(">f8").tobytes(), len(x)))
    back = read_aiff(p)
    np.testing.assert_allclose(back.samples[:, 0], x, atol=1e-6)


def test_aiff_8bit_sowt_is_signed(tmp_path):
    """AIFF 8-bit is SIGNED (unlike WAV's unsigned u8) — a bias slip here
    plays full-scale DC."""
    x = np.array([-1.0, -0.5, 0.0, 0.5], np.float32)
    raw = np.round(x * 128.0).clip(-128, 127).astype(np.int8).tobytes()
    p = tmp_path / "s8.aifc"
    p.write_bytes(_aiff(b"sowt", 8, raw, len(x)))
    back = read_aiff(p)
    np.testing.assert_allclose(back.samples[:, 0], x, atol=1 / 128)
    assert abs(float(back.samples.mean())) < 0.3  # no unsigned-bias DC


def test_aiff_sample_rate_f80(tmp_path):
    """The COMM sampleRate rides an 80-bit extended float."""
    raw = np.zeros(4, ">i2").tobytes()
    p = tmp_path / "rate.aiff"
    p.write_bytes(_aiff(b"NONE", 16, raw, 4))
    assert read_aiff(p).sample_rate == SR
