"""Thumbnail / waveform model tests."""

import numpy as np

from libzl_tpu.io.wav import AudioData
from libzl_tpu.models.waveform import WaveFormItem
from libzl_tpu.ops.thumbnail import thumbnail_jit, thumbnail_math, thumbnail_region

SR = 48000


def ramp_audio(frames=51200):
    x = np.linspace(-1, 1, frames, dtype=np.float32)[:, None]
    return x


def test_thumbnail_minmax_semantics():
    x = ramp_audio(5120)
    mins, maxs = thumbnail_math(np, x, 512)
    assert mins.shape == (512, 1) and maxs.shape == (512, 1)
    assert (maxs >= mins).all()
    # a monotone ramp: bucket mins are the first sample of each bucket
    np.testing.assert_allclose(mins[:, 0], x[::10, 0][:512], atol=1e-6)


def test_thumbnail_batched_jit():
    rng = np.random.default_rng(0)
    batch = rng.standard_normal((4, 4096, 2)).astype(np.float32)
    mins, maxs = thumbnail_jit(batch, num_buckets=256)
    assert np.asarray(mins).shape == (4, 256, 2)
    want_min, want_max = thumbnail_math(np, batch, 256)
    np.testing.assert_array_equal(np.asarray(mins), want_min)
    np.testing.assert_array_equal(np.asarray(maxs), want_max)


def test_region_zoom():
    x = ramp_audio(SR)
    mins, maxs = thumbnail_region(x, 0.25, 0.75, SR, 128)
    # window [-0.5, 0.5] of the ramp
    assert maxs.max() <= 0.51 and mins.min() >= -0.51
    # empty/inverted window -> zeros
    mins, maxs = thumbnail_region(x, 0.9, 0.1, SR, 128)
    assert not mins.any() and not maxs.any()


def test_waveform_item_cache_and_callbacks():
    item = WaveFormItem(num_buckets=64)
    repaints = []
    item.repaint_callback = lambda: repaints.append(1)
    item.set_source(AudioData(ramp_audio(SR), SR))
    assert item.length == 1.0
    assert item.end == 1.0
    assert len(repaints) == 1
    e1 = item.envelope()
    e2 = item.envelope()
    assert e1[0] is e2[0]  # cached
    item.set_start(0.5)
    assert len(repaints) == 2
    e3 = item.envelope()
    assert e3[0] is not e1[0]
    # cache keeps at most 5 entries
    for s in np.linspace(0, 0.4, 7):
        item.set_start(float(s))
        item.envelope()
    assert len(item._cache) <= 5


def test_empty_and_mono_edge_cases():
    """Zero-length input yields a flat zero envelope (edge-pad cannot
    extend an empty axis), and a 1-D mono empty zoom window returns
    [buckets, 1] — not [buckets, frame_count]."""
    import numpy as np

    from libzl_tpu.ops.thumbnail import thumbnail_math, thumbnail_region

    mins, maxs = thumbnail_math(np, np.zeros((0, 2), np.float32), 64)
    assert mins.shape == (64, 2) and not mins.any() and not maxs.any()
    mono = np.ones(48000, np.float32)
    mins, maxs = thumbnail_region(mono, 1.0, 1.0, 48000.0, 32)
    assert mins.shape == (32, 1)


def test_waveform_cache_keys_on_num_buckets(tmp_path):
    import numpy as np

    from libzl_tpu.io.wav import write_wav
    from libzl_tpu.models.waveform import WaveFormItem

    p = tmp_path / "w.wav"
    write_wav(p, np.random.default_rng(0).uniform(
        -0.5, 0.5, (4800, 1)).astype(np.float32), 48000)
    item = WaveFormItem()
    item.set_source(str(p))
    a, _ = item.envelope()
    item.num_buckets = 128
    b, _ = item.envelope()
    assert a.shape[0] != b.shape[0]
    assert b.shape[0] == 128
