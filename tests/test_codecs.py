"""OGG Vorbis / MP3 codec bindings (io/codecs.py): roundtrips through the
system libraries, read_audio container dispatch, clip loading, and the
clear-error path when a codec library is absent."""

import numpy as np
import pytest

from libzl_tpu.io import codecs
from libzl_tpu.io.wav import read_audio

SR = 48000


def tone(seconds=0.5):
    t = np.arange(int(SR * seconds)) / SR
    return np.stack(
        [0.5 * np.sin(2 * np.pi * 440 * t), 0.5 * np.sin(2 * np.pi * 330 * t)],
        axis=1,
    ).astype(np.float32)


def _aligned_corr(decoded, original, max_lag=4000):
    """Best correlation over decoder-delay lags (MP3 adds encoder delay)."""
    best = -2.0
    ref = original[:20000, 0]
    for lag in range(0, max_lag, 4):
        seg = decoded[lag : lag + 20000, 0]
        if len(seg) < 20000:
            break
        best = max(best, float(np.corrcoef(seg, ref)[0, 1]))
    return best


@pytest.mark.skipif(
    not (codecs.ogg_read_available() and codecs.ogg_write_available()),
    reason="no system vorbis libraries",
)
def test_ogg_roundtrip(tmp_path):
    x = tone()
    p = tmp_path / "t.ogg"
    codecs.write_ogg(p, x, SR)
    a = codecs.read_ogg(p)
    assert a.sample_rate == SR
    # vorbis is sample-aligned: exact frame count; correlate the core
    # region (the lossy codec's warm-up/tail transients are off-model)
    assert a.samples.shape == x.shape
    core = slice(4096, -4096)
    assert float(np.corrcoef(a.samples[core, 0], x[core, 0])[0, 1]) > 0.99


@pytest.mark.skipif(
    not (codecs.mp3_read_available() and codecs.mp3_write_available()),
    reason="no system mp3 libraries",
)
def test_mp3_roundtrip(tmp_path):
    x = tone()
    p = tmp_path / "t.mp3"
    codecs.write_mp3(p, x, SR)
    a = codecs.read_mp3(p)
    assert a.sample_rate == SR
    assert a.samples.shape[1] == 2
    assert _aligned_corr(a.samples, x) > 0.99


@pytest.mark.skipif(
    not (codecs.ogg_write_available() and codecs.mp3_write_available()),
    reason="no system codec libraries",
)
def test_read_audio_dispatches_codecs(tmp_path):
    x = tone()
    ogg = tmp_path / "a.dat"  # wrong extensions: magic-sniffed
    mp3 = tmp_path / "b.dat"
    codecs.write_ogg(ogg, x, SR)
    codecs.write_mp3(mp3, x, SR)
    a = read_audio(ogg)
    assert a.sample_rate == SR and a.samples.shape == x.shape
    b = read_audio(mp3)
    assert b.sample_rate == SR and _aligned_corr(b.samples, x) > 0.99


@pytest.mark.skipif(
    not codecs.ogg_write_available(), reason="no system vorbis libraries"
)
def test_clip_loads_ogg(tmp_path):
    from libzl_tpu.engine.engine import AudioEngine
    from libzl_tpu.models.clip import ClipAudioSource

    p = tmp_path / "clip.ogg"
    codecs.write_ogg(p, tone(seconds=0.2), SR)
    e = AudioEngine(sample_rate=SR, backend="numpy", num_voices=8)
    clip = ClipAudioSource(e, filepath=str(p))
    clip.play(loop=False, midi_channel=0)
    e.start_transport(bpm=120)
    out = np.concatenate(
        [np.asarray(e.process_block().outputs.master) for _ in range(20)]
    )
    assert np.abs(out).max() > 0.05


def test_absent_codec_raises_clearly(tmp_path, monkeypatch):
    codecs.set_codec_lib_for_testing("vorbisfile", None)
    codecs.set_codec_lib_for_testing("mpg123", None)
    try:
        ogg = tmp_path / "x.ogg"
        ogg.write_bytes(b"OggS" + b"\x00" * 64)
        with pytest.raises(ValueError, match="OGG is not supported"):
            read_audio(ogg)
        mp3 = tmp_path / "x.mp3"
        mp3.write_bytes(b"ID3" + b"\x00" * 64)
        with pytest.raises(ValueError, match="MP3 is not supported"):
            read_audio(mp3)
    finally:
        codecs._overrides.clear()
        codecs._libs.clear()


@pytest.mark.skipif(
    not (codecs.ogg_read_available() and codecs.ogg_write_available()),
    reason="no system vorbis libraries",
)
def test_chained_ogg_mixed_layout_safe(tmp_path):
    """Chained OGG whose links change channel layout: a chain-aware
    vorbisfile reports the new layout per link and the reader raises
    (the pcm pointer array is only valid up to the CURRENT link's channel
    count); a build that pins the first link's layout (observed on this
    host: bitstream stays 0 across the join) must still decode finite
    audio under that layout. Either way: no crash, no garbage."""
    import numpy as np

    a = tmp_path / "a.ogg"
    b = tmp_path / "b.ogg"
    codecs.write_ogg(a, tone(seconds=0.1)[:, :1], SR)   # mono link
    codecs.write_ogg(b, tone(seconds=0.1), SR)          # stereo link
    for order, first_ch in (((a, b), 1), ((b, a), 2)):
        chained = tmp_path / "chained.ogg"
        chained.write_bytes(order[0].read_bytes() + order[1].read_bytes())
        try:
            out = codecs.read_ogg(chained)
        except ValueError as e:
            assert "mid-stream" in str(e)
        else:
            assert out.samples.shape[1] == first_ch
            assert np.isfinite(out.samples).all()
    # same-layout chains decode both links fine
    same = tmp_path / "same.ogg"
    same.write_bytes(a.read_bytes() + a.read_bytes())
    out = codecs.read_ogg(same)
    assert out.samples.shape[1] == 1
    assert out.samples.shape[0] > int(0.15 * SR)


@pytest.mark.skipif(
    not (codecs.mp3_read_available() and codecs.mp3_write_available()),
    reason="no system mp3 libraries",
)
def test_concatenated_mp3_format_change_raises(tmp_path):
    """Concatenated MP3 segments with different channel counts trigger a
    mid-stream MPG123_NEW_FORMAT; PCM decoded under the old layout must
    not be reshaped with the new one (garbled audio) — raise instead."""
    a = tmp_path / "a.mp3"
    b = tmp_path / "b.mp3"
    codecs.write_mp3(a, tone(seconds=0.2)[:, :1], SR)   # mono segment
    codecs.write_mp3(b, tone(seconds=0.2), SR)          # stereo segment
    chained = tmp_path / "chained.mp3"
    chained.write_bytes(a.read_bytes() + b.read_bytes())
    with pytest.raises(ValueError, match="mid-stream"):
        codecs.read_mp3(chained)


class _FakeVorbisfile:
    """Callable-attribute fake driven through set_codec_lib_for_testing:
    read_ogg assigns .restype/.argtypes, so every entry point must be a
    plain function object (instance attributes), not bound methods."""

    def __init__(self, info=(2, 48000), reads=()):
        self.cleared = 0
        queue = list(reads)

        def ov_fopen(path, vf):
            return 0

        def ov_info(vf, link):
            if info is None:
                return None
            import types

            ch, rate = info
            return types.SimpleNamespace(
                contents=types.SimpleNamespace(channels=ch, rate=rate)
            )

        def ov_read_float(vf, pcm, n, bitstream):
            return queue.pop(0) if queue else 0

        def ov_clear(vf):
            self.cleared += 1
            return 0

        self.ov_fopen = ov_fopen
        self.ov_info = ov_info
        self.ov_read_float = ov_read_float
        self.ov_clear = ov_clear


def _with_fake_vf(fake, path):
    codecs.set_codec_lib_for_testing("vorbisfile", fake)
    try:
        return codecs.read_ogg(path)
    finally:
        codecs._overrides.clear()
        codecs._libs.clear()


def test_ogg_corrupt_stream_raises_not_spins(tmp_path):
    """A persistent negative ov_read_float (OV_EBADLINK etc.) must raise,
    never loop forever; an OV_HOLE gap is skipped per vorbisfile
    guidance. ov_clear still runs on the error path."""
    p = tmp_path / "x.ogg"
    p.write_bytes(b"OggS")
    fake = _FakeVorbisfile(reads=[-3, -129])
    with pytest.raises(ValueError, match="corrupt OGG Vorbis stream"):
        _with_fake_vf(fake, p)
    assert fake.cleared == 1


def test_ogg_info_failure_raises(tmp_path):
    p = tmp_path / "x.ogg"
    p.write_bytes(b"OggS")
    with pytest.raises(ValueError, match="ov_info failed"):
        _with_fake_vf(_FakeVorbisfile(info=None), p)


def test_ogg_bad_stream_params_raise(tmp_path):
    p = tmp_path / "x.ogg"
    p.write_bytes(b"OggS")
    with pytest.raises(ValueError, match="bad OGG stream params"):
        _with_fake_vf(_FakeVorbisfile(info=(0, 48000)), p)
