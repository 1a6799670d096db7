"""WAV I/O format coverage (PCM depths, IEEE float, RIFF edge cases)."""

import struct

import numpy as np
import pytest

from libzl_tpu.io.wav import AudioData, read_wav, to_stereo, write_wav

SR = 48000


def sig(frames=4800):
    t = np.arange(frames) / SR
    return (0.7 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)


@pytest.mark.parametrize("depth,tol", [(16, 2**-14), (24, 2**-22), (32, 2**-24)])
def test_pcm_roundtrip(tmp_path, depth, tol):
    x = sig()
    p = tmp_path / f"pcm{depth}.wav"
    write_wav(p, x, SR, bit_depth=depth)
    back = read_wav(p)
    assert back.sample_rate == SR
    assert back.num_frames == len(x)
    np.testing.assert_allclose(back.samples[:, 0], x, atol=tol)


def test_stereo_roundtrip(tmp_path):
    x = np.stack([sig(), -sig()], axis=1)
    p = tmp_path / "st.wav"
    write_wav(p, x, SR, bit_depth=24)
    back = read_wav(p)
    assert back.num_channels == 2
    np.testing.assert_allclose(back.samples, x, atol=2**-22)


def test_ieee_float_wav(tmp_path):
    """Float WAVs (format code 3) go through the manual RIFF parser."""
    x = sig(1000)
    data = x.astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, SR, SR * 4, 4, 32)
    riff = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    p = tmp_path / "float.wav"
    p.write_bytes(riff)
    back = read_wav(p)
    assert back.sample_rate == SR
    np.testing.assert_array_equal(back.samples[:, 0], x)


def test_extra_chunks_skipped(tmp_path):
    """RIFF files with LIST/cue chunks before data still parse."""
    x = sig(500)
    data = x.astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, SR, SR * 4, 4, 32)
    junk = b"JUNKdata-here!"
    riff = (
        b"RIFF" + struct.pack(
            "<I", 4 + 8 + len(fmt) + 8 + len(junk) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", len(junk)) + junk
        + b"data" + struct.pack("<I", len(data)) + data
    )
    p = tmp_path / "chunks.wav"
    p.write_bytes(riff)
    back = read_wav(p)
    assert back.num_frames == 500


def test_to_stereo_shapes():
    mono = sig(100)
    st = to_stereo(mono)
    assert st.shape == (100, 2)
    np.testing.assert_array_equal(st[:, 0], st[:, 1])
    five = np.zeros((10, 5), np.float32)
    assert to_stereo(five).shape == (10, 2)


def test_not_a_wav(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"not a wave file at all")
    with pytest.raises(ValueError):
        read_wav(p)
