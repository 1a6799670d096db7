"""Error-branch coverage for io/codecs.py via injected codec fakes.

The roundtrip tests exercise the happy paths through the real system
libraries; these drive the failure branches (allocator/open/format/encode
errors, native-state cleanup on those paths) with set_codec_lib_for_testing
fakes, the same injection surface the ALSA binding uses. Every fake entry
point is a plain function attribute because the bindings assign
.restype/.argtypes before calling.
"""

import ctypes

import numpy as np
import pytest

from libzl_tpu.io import codecs

SR = 48000


@pytest.fixture(autouse=True)
def _clean_overrides():
    yield
    codecs._overrides.clear()
    codecs._libs.clear()


def _set(name, fake):
    codecs.set_codec_lib_for_testing(name, fake)


# ------------------------------------------------------------- OGG encode


def test_write_ogg_unavailable(tmp_path):
    for name in ("vorbis", "vorbisenc", "ogg"):
        _set(name, None)
    with pytest.raises(ValueError, match="OGG encoding is not supported"):
        codecs.write_ogg(tmp_path / "x.ogg", np.zeros(64, np.float32), SR)


def test_write_ogg_init_vbr_failure_clears_state(tmp_path):
    """vorbis_encode_init_vbr rejecting the (rate, quality) combination
    must clear vorbis_info and raise — no leaked native state. Driven with
    1-D input to cover the mono-promotion path too."""

    class FakeVorbis:
        def __init__(self):
            self.cleared = 0

            def vorbis_info_init(vi):
                return None

            def vorbis_info_clear(vi):
                self.cleared += 1

            def vorbis_analysis_buffer(vd, n):
                raise AssertionError("unreachable after init failure")

            self.vorbis_info_init = vorbis_info_init
            self.vorbis_info_clear = vorbis_info_clear
            self.vorbis_analysis_buffer = vorbis_analysis_buffer

    class FakeVorbisEnc:
        def __init__(self):
            def vorbis_encode_init_vbr(vi, ch, rate, q):
                return -131  # OV_EINVAL

            self.vorbis_encode_init_vbr = vorbis_encode_init_vbr

    vb = FakeVorbis()
    _set("vorbis", vb)
    _set("vorbisenc", FakeVorbisEnc())
    _set("ogg", object())
    with pytest.raises(ValueError, match="vorbis_encode_init_vbr failed"):
        codecs.write_ogg(tmp_path / "x.ogg", np.zeros(64, np.float32), SR)
    assert vb.cleared == 1


def test_chained_ogg_format_change_raises_with_chain_aware_lib(tmp_path):
    """A vorbisfile build that reports per-link layouts (bitstream
    advances at the join) must make read_ogg raise rather than reshape
    PCM decoded under the old layout."""
    import types

    class ChainFake:
        def __init__(self):
            def ov_fopen(path, vf):
                return 0

            def ov_info(vf, link):
                # link -1 = current (initially 0): stereo 48k; link 1:
                # mono 44.1k
                idx = 0 if int(link) < 0 else min(int(link), 1)
                ch, rate = ((2, 48000), (1, 44100))[idx]
                return types.SimpleNamespace(
                    contents=types.SimpleNamespace(channels=ch, rate=rate)
                )

            reads = [-2]  # then EOF

            def ov_read_float(vf, pcm, n, bitstream):
                # first call: report 16 frames on link 1 (changed layout)
                if reads:
                    reads.pop()
                    bitstream._obj.value = 1
                    return 16
                return 0

            def ov_clear(vf):
                return 0

            self.ov_fopen = ov_fopen
            self.ov_info = ov_info
            self.ov_read_float = ov_read_float
            self.ov_clear = ov_clear

    p = tmp_path / "x.ogg"
    p.write_bytes(b"OggS")
    _set("vorbisfile", ChainFake())
    with pytest.raises(ValueError, match="changes format mid-stream"):
        codecs.read_ogg(p)


# ------------------------------------------------------------- MP3 decode


class FakeMpg123:
    """Scriptable mpg123: `reads` is a list of (rc, payload_bytes) pairs;
    getformat returns from the `formats` queue (repeating the last)."""

    def __init__(self, new_rc=1, open_rc=0, getformat_rc=0,
                 formats=((48000, 2),), reads=((-12, b""),)):
        self.closed = 0
        self.deleted = 0
        fq = list(formats)
        rq = list(reads)

        def mpg123_init():
            return 0

        def mpg123_new(decoder, byref_err):
            byref_err._obj.value = 0 if new_rc else 99
            return new_rc

        def mpg123_param(h, key, val, fval):
            return 0

        def mpg123_open(h, path):
            return open_rc

        def mpg123_getformat(h, byref_rate, byref_ch, byref_enc):
            rate, ch = fq.pop(0) if len(fq) > 1 else fq[0]
            byref_rate._obj.value = rate
            byref_ch._obj.value = ch
            byref_enc._obj.value = 0x200  # MPG123_ENC_FLOAT_32
            return getformat_rc

        def mpg123_read(h, buf, size, byref_done):
            rc, payload = rq.pop(0) if rq else (-12, b"")
            ctypes.memmove(buf, payload, len(payload))
            byref_done._obj.value = len(payload)
            return rc

        def mpg123_close(h):
            self.closed += 1

        def mpg123_delete(h):
            self.deleted += 1

        self.mpg123_init = mpg123_init
        self.mpg123_new = mpg123_new
        self.mpg123_param = mpg123_param
        self.mpg123_open = mpg123_open
        self.mpg123_getformat = mpg123_getformat
        self.mpg123_read = mpg123_read
        self.mpg123_close = mpg123_close
        self.mpg123_delete = mpg123_delete


def _read_mp3_with(fake, tmp_path):
    p = tmp_path / "x.mp3"
    p.write_bytes(b"ID3")
    _set("mpg123", fake)
    return codecs.read_mp3(p)


def test_mp3_handle_allocation_failure(tmp_path):
    with pytest.raises(ValueError, match="mpg123_new failed"):
        _read_mp3_with(FakeMpg123(new_rc=0), tmp_path)


def test_mp3_open_failure_still_frees_handle(tmp_path):
    fake = FakeMpg123(open_rc=-1)
    with pytest.raises(ValueError, match="not a decodable MP3 file"):
        _read_mp3_with(fake, tmp_path)
    assert fake.closed == 1 and fake.deleted == 1


def test_mp3_getformat_failure(tmp_path):
    with pytest.raises(ValueError, match="mpg123_getformat failed"):
        _read_mp3_with(FakeMpg123(getformat_rc=-1), tmp_path)


def test_mp3_benign_format_change_before_output(tmp_path):
    """MPG123_NEW_FORMAT before any PCM was produced is the normal stream
    preamble: adopt the new layout and continue (no raise)."""
    fake = FakeMpg123(
        formats=[(48000, 2), (44100, 1)],
        reads=[(-11, b""), (-12, b"")],  # NEW_FORMAT then DONE
    )
    out = _read_mp3_with(fake, tmp_path)
    assert out.sample_rate == 44100
    assert out.samples.shape == (0, 1)


def test_mp3_midstream_read_error(tmp_path):
    fake = FakeMpg123(reads=[(0, b"\0" * 8), (-4, b"")])
    with pytest.raises(ValueError, match="corrupt MP3 stream"):
        _read_mp3_with(fake, tmp_path)
    assert fake.closed == 1 and fake.deleted == 1


def test_mp3_nonfloat_output_rejected(tmp_path):
    """A decoder that ignored FORCE_FLOAT hands back garbage when
    reinterpreted as f32 — the reader must detect and raise, not return
    deafening noise."""
    payload = np.full(16, np.inf, np.float32).tobytes()
    fake = FakeMpg123(reads=[(0, payload), (-12, b"")])
    with pytest.raises(ValueError, match="did not produce float32"):
        _read_mp3_with(fake, tmp_path)


# ------------------------------------------------------------- MP3 encode


class FakeLame:
    def __init__(self, init_rv=4096, init_params_rc=0, encode_rc=0,
                 flush_rc=0):
        self.closed = 0

        def lame_init():
            return init_rv

        def one_arg_setter(gfp, v):
            return 0

        def lame_init_params(gfp):
            return init_params_rc

        def lame_encode_buffer_ieee_float(gfp, l, r, n, buf, size):
            return encode_rc

        def lame_encode_flush(gfp, buf, size):
            return flush_rc

        def lame_close(gfp):
            self.closed += 1

        self.lame_init = lame_init
        self.lame_set_num_channels = one_arg_setter
        self.lame_set_in_samplerate = one_arg_setter
        self.lame_set_brate = one_arg_setter
        self.lame_set_quality = one_arg_setter
        self.lame_init_params = lame_init_params
        self.lame_encode_buffer_ieee_float = lame_encode_buffer_ieee_float
        self.lame_encode_flush = lame_encode_flush
        self.lame_close = lame_close


def test_write_mp3_unavailable(tmp_path):
    _set("lame", None)
    with pytest.raises(ValueError, match="MP3 encoding is not supported"):
        codecs.write_mp3(tmp_path / "x.mp3", np.zeros(64, np.float32), SR)


def test_write_mp3_rejects_three_channels(tmp_path):
    _set("lame", object())  # rejected before any lame call
    with pytest.raises(ValueError, match="at most 2 channels"):
        codecs.write_mp3(
            tmp_path / "x.mp3", np.zeros((64, 3), np.float32), SR)


def test_write_mp3_init_failure_mono_input(tmp_path):
    _set("lame", FakeLame(init_rv=0))
    with pytest.raises(ValueError, match="lame_init failed"):
        codecs.write_mp3(tmp_path / "x.mp3", np.zeros(64, np.float32), SR)


def test_write_mp3_init_params_failure_closes_encoder(tmp_path):
    fake = FakeLame(init_params_rc=-1)
    _set("lame", fake)
    with pytest.raises(ValueError, match="lame_init_params failed"):
        codecs.write_mp3(tmp_path / "x.mp3", np.zeros(64, np.float32), SR)
    assert fake.closed == 1


def test_write_mp3_encode_failure_closes_encoder(tmp_path):
    fake = FakeLame(encode_rc=-1)
    _set("lame", fake)
    with pytest.raises(ValueError, match="lame_encode_buffer failed"):
        codecs.write_mp3(tmp_path / "x.mp3", np.zeros(64, np.float32), SR)
    assert fake.closed == 1
