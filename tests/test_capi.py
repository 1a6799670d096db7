"""C ABI integration: build native/libzl.so and drive it via ctypes the way
the reference's test clients do (SURVEY.md §4) — in a subprocess, since the
shim owns process-global engine state."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
NATIVE = REPO / "native"

CLIENT = r"""
import ctypes, os, sys, time
import numpy as np
sys.path.insert(0, os.environ["ZL_REPO"])

# make a test clip first (pure python, before loading the shim)
from libzl_tpu.io.wav import write_wav, read_wav
sr = 48000
t = np.arange(sr) / sr
write_wav(os.environ["ZL_WAV"], (0.5*np.sin(2*np.pi*330*t)).astype(np.float32), sr)

zl = ctypes.CDLL(os.environ["ZL_SO"])
zl.ClipAudioSource_new.restype = ctypes.c_void_p
zl.ClipAudioSource_new.argtypes = [ctypes.c_char_p, ctypes.c_bool]
zl.ClipAudioSource_byID.restype = ctypes.c_void_p
zl.ClipAudioSource_getDuration.restype = ctypes.c_float
zl.ClipAudioSource_getDuration.argtypes = [ctypes.c_void_p]
zl.ClipAudioSource_getFileName.restype = ctypes.c_char_p
zl.ClipAudioSource_getFileName.argtypes = [ctypes.c_void_p]
zl.ClipAudioSource_id.argtypes = [ctypes.c_void_p]
zl.ClipAudioSource_play.argtypes = [ctypes.c_void_p, ctypes.c_bool]
zl.ClipAudioSource_stop.argtypes = [ctypes.c_void_p]
zl.ClipAudioSource_setVolume.argtypes = [ctypes.c_void_p, ctypes.c_float]
zl.ClipAudioSource_setProgressCallback.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
zl.dBFromVolume.restype = ctypes.c_float
zl.dBFromVolume.argtypes = [ctypes.c_float]
zl.JackPassthrough_getDryAmount.restype = ctypes.c_float

zl.initJuce()
clip = zl.ClipAudioSource_new(os.environ["ZL_WAV"].encode(), False)
assert clip, "clip creation failed"
cid = zl.ClipAudioSource_id(clip)
assert zl.ClipAudioSource_byID(cid) == clip
dur = zl.ClipAudioSource_getDuration(clip)
assert abs(dur - 1.0) < 1e-3, dur
name = zl.ClipAudioSource_getFileName(clip).decode()
assert name.endswith(".wav"), name

progress_hits = []
@ctypes.CFUNCTYPE(None, ctypes.c_float)
def on_progress(v):
    progress_hits.append(v)
zl.ClipAudioSource_setProgressCallback(clip, ctypes.cast(on_progress, ctypes.c_void_p))

# record the global playback while playing the clip via the C API
zl.AudioLevels_setRecordGlobalPlayback(True)
zl.AudioLevels_setGlobalPlaybackFilenamePrefix(os.environ["ZL_OUT"].encode())
zl.AudioLevels_startRecording()
assert zl.AudioLevels_isRecording()

zl.SyncTimer_startTimer(120)  # the argument is a BPM (SyncTimer.cpp:869-872)
zl.ClipAudioSource_play(clip, True)
# deterministic drive: the shim shares this interpreter, so the bridge
# runtime is reachable directly — step exact block counts instead of
# sleeping wall-clock time (LIBZL_TPU_NO_PUMP is set by the test env)
from libzl_tpu.capi import bridge
rt = bridge._rt()
assert rt._pump is None, "NO_PUMP must be in effect for the deterministic drive"
rt.step_blocks(400)
zl.ClipAudioSource_stop(clip)
rt.step_blocks(120)
zl.AudioLevels_stopRecording()
zl.SyncTimer_stopTimer()

# short wall-clock pump smoke (full pump coverage lives in
# test_pump_block_sequence_integrity)
rt.start_pump()
time.sleep(0.2)
rt.stop_pump()

# passthrough API round trip
zl.JackPassthrough_setDryAmount(3, ctypes.c_float(0.5))
assert abs(zl.JackPassthrough_getDryAmount(3) - 0.5) < 1e-6
assert abs(zl.dBFromVolume(ctypes.c_float(1.0))) < 1e-6

out = read_wav(os.environ["ZL_OUT"])
peak = float(np.abs(out.samples).max())
assert out.num_frames == 520 * 128, out.num_frames  # exact: 520 stepped blocks
assert peak > 0.05, peak
assert progress_hits, "no progress callbacks fired"
zl.shutdownJuce()
print("CAPI-OK frames=%d peak=%.3f progress_hits=%d" % (out.num_frames, peak, len(progress_hits)))
"""


@pytest.fixture(scope="module")
def libzl_so():
    so = NATIVE / "libzl.so"
    subprocess.run(["make", "-C", str(NATIVE)], check=True,
                   capture_output=True)
    assert so.exists()
    return so


def test_ctypes_client_end_to_end(libzl_so, tmp_path):
    env = dict(os.environ)
    env.update(
        ZL_REPO=str(REPO),
        ZL_SO=str(libzl_so),
        ZL_WAV=str(tmp_path / "in.wav"),
        ZL_OUT=str(tmp_path / "out.wav"),
        LIBZL_TPU_BACKEND="numpy",
        LIBZL_TPU_VOICES="32",  # numpy fallback pace on CI hosts
        LIBZL_TPU_NO_PUMP="1",  # the client drives blocks deterministically
        JAX_PLATFORMS="cpu",
        PYTHONPATH=str(REPO),
    )
    proc = subprocess.run(
        [sys.executable, "-c", CLIENT],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "CAPI-OK" in proc.stdout


def test_c_host_embedding(libzl_so, tmp_path):
    """True embedding: a C binary links libzl.so, initJuce boots the
    interpreter + engine, the clip API works, clean shutdown."""
    binary = tmp_path / "embed_smoke"
    subprocess.run(
        ["gcc", "-O1", "-o", str(binary), str(NATIVE / "embed_smoke.c"),
         "-I", str(NATIVE), "-L", str(NATIVE), "-l:libzl.so",
         f"-Wl,-rpath,{NATIVE}"],
        check=True, capture_output=True,
    )
    wav = tmp_path / "embed.wav"
    t = np.arange(48000) / 48000
    from libzl_tpu.io.wav import write_wav

    write_wav(wav, (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32),
              48000)
    env = dict(os.environ)
    env.update(
        PYTHONPATH=str(REPO),
        LIBZL_TPU_BACKEND="numpy",
        LIBZL_TPU_VOICES="32",
        JAX_PLATFORMS="cpu",
    )
    proc = subprocess.run(
        [str(binary), str(wav)], env=env, capture_output=True, text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "EMBED-OK" in proc.stdout


@pytest.mark.parametrize("depth", [1, 3])
def test_pump_block_sequence_integrity(tmp_path, depth):
    """The pipelined pump (consume the oldest in-flight block only after
    dispatching the newest, LIBZL_TPU_PIPELINE deep) must deliver every
    rendered block to the recorder exactly once, in order, including the
    drained final blocks. A recorded linear ramp is a contiguous prefix of
    the source iff no block was dropped/dup'd/reordered."""
    import time

    import numpy as np

    from libzl_tpu.capi import bridge
    from libzl_tpu.io.wav import read_wav, write_wav

    sr = 48000
    n = sr * 2
    ramp = (np.arange(1, n + 1, dtype=np.float32) / n * 0.5)[:, None]
    src = tmp_path / "ramp.wav"
    rec = tmp_path / "rec.wav"
    write_wav(src, ramp, sr)

    os.environ["LIBZL_TPU_BACKEND"] = "numpy"
    os.environ["LIBZL_TPU_VOICES"] = "32"
    os.environ["LIBZL_TPU_PIPELINE"] = str(depth)
    try:
        bridge.init_engine(pump=True)
        cid = bridge.clip_new(str(src))
        bridge.levels_set_record_global_playback(True)
        bridge.levels_set_global_playback_filename_prefix(str(rec))
        bridge.levels_start_recording()
        bridge.clip_play(cid, False, 0)  # one-shot at root: ratio 1.0
        # the pump is wall-paced but CI hosts render slower than realtime:
        # poll until enough blocks are through rather than sleeping a fixed
        # wall time
        engine = bridge._rt().engine
        target = engine.total_blocks + 60
        deadline = time.monotonic() + 20.0
        while engine.total_blocks < target and time.monotonic() < deadline:
            time.sleep(0.05)
        bridge.levels_stop_recording()
    finally:
        bridge.shutdown_engine()
        os.environ.pop("LIBZL_TPU_BACKEND", None)
        os.environ.pop("LIBZL_TPU_VOICES", None)
        os.environ.pop("LIBZL_TPU_PIPELINE", None)

    x = read_wav(rec).samples[:, 0]
    nz = np.flatnonzero(np.abs(x) > 0)
    assert nz.size > 1280, "too little audio recorded to judge"
    seg = x[nz[0] : nz[-1] + 1]
    # align to the source via a mid-segment sample (mono renders at 0.5x,
    # the M/S pan convention; first few ramp samples sit below the 16-bit
    # WAV resolution and record as true zeros)
    k = int(round(seg[1000] / 0.5 * n / 0.5)) - 1001
    assert 0 <= k < 64, f"head offset {k} outside quantization slack"
    expect = 0.5 * ramp[k : k + len(seg), 0]
    err = float(np.abs(seg - expect).max())
    assert err < 3.1e-5, f"block sequence broken (max dev {err})"


def test_bounce_drain_delivers_every_block_in_order(tmp_path):
    """LIBZL_TPU_BOUNCE_DRAIN=K: non-pacing sinks get K blocks per
    device->host sync (the bounce amortization, one fetch per K blocks) —
    the delivered stream must be bit-identical to per-block delivery,
    including the partial drain at stop and the per-block fallback when
    recording starts mid-run."""
    import numpy as np

    from libzl_tpu.capi.bridge import EngineRuntime
    from libzl_tpu.engine.commands import ClipCommand
    from libzl_tpu.io.sinks import AudioSink
    from libzl_tpu.io.wav import AudioData
    from libzl_tpu.models.clip import ClipAudioSource

    class CaptureSink(AudioSink):
        pacing = False

        def __init__(self):
            self.blocks = []

        def write(self, block):
            self.blocks.append(np.array(block))

    sr = 48000
    n = sr
    ramp = (np.arange(1, n + 1, dtype=np.float32) / n * 0.5)[:, None]

    def run(drain, record_at=None):
        rt = EngineRuntime(sr, 128, 16, backend="numpy",
                           bounce_drain=drain)
        sink = CaptureSink()
        rt.set_sink(sink)
        clip = ClipAudioSource(rt.engine, audio=AudioData(ramp, sr))
        rt.engine.start_transport(bpm=120)
        cmd = ClipCommand.channel(clip.id, 0)
        cmd.midi_note = 60
        cmd.start_playback = True
        rt.engine.schedule_clip_command(cmd, 0)
        if record_at is None:
            rt.step_blocks(50)
        else:
            rt.step_blocks(record_at)
            rt.engine.levels.set_record_global_playback(True)
            rt.engine.levels.set_global_playback_filename_prefix(
                str(tmp_path / f"rec{drain}"))
            rt.engine.levels.start_recording()
            rt.step_blocks(50 - record_at)
            rt.engine.levels.stop_recording()
        return np.concatenate(sink.blocks, axis=0), len(sink.blocks)

    plain, n1 = run(1)
    drained, n2 = run(4)
    assert n1 == n2 == 50
    np.testing.assert_array_equal(drained, plain)
    # a partial drain tail (50 % 4 != 0) flushed at step_blocks end
    mid, n3 = run(6, record_at=21)  # recording starts mid-drain
    assert n3 == 50
    np.testing.assert_array_equal(mid, plain)


def test_bounce_drain_with_global_recording(tmp_path):
    """Global-playback recording rides the drain (fed from the batched
    master fetch): the recorded WAV must equal the per-block path's."""
    import numpy as np

    from libzl_tpu.capi.bridge import EngineRuntime
    from libzl_tpu.engine.commands import ClipCommand
    from libzl_tpu.io.sinks import NullSink
    from libzl_tpu.io.wav import AudioData, read_wav
    from libzl_tpu.models.clip import ClipAudioSource

    sr = 48000
    t = np.arange(sr // 2) / sr
    wave = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)[:, None]

    def run(drain, tag):
        rt = EngineRuntime(sr, 128, 16, backend="numpy", bounce_drain=drain)
        rt.set_sink(NullSink())
        clip = ClipAudioSource(rt.engine, audio=AudioData(wave, sr))
        rt.engine.start_transport(bpm=120)
        cmd = ClipCommand.channel(clip.id, 0)
        cmd.midi_note = 60
        cmd.start_playback = True
        rt.engine.schedule_clip_command(cmd, 0)
        lv = rt.engine.levels
        assert not lv.only_global_recording()
        lv.set_record_global_playback(True)
        lv.set_global_playback_filename_prefix(
            str(tmp_path / f"rec_{tag}.wav"))
        rt._flush_drain()
        lv.start_recording()
        assert lv.only_global_recording()
        rt.step_blocks(40)
        rt._flush_drain()
        lv.stop_recording()
        return read_wav(str(tmp_path / f"rec_{tag}.wav")).samples

    plain = run(1, "plain")
    drained = run(5, "drained")
    assert plain.shape[0] == 40 * 128
    np.testing.assert_array_equal(drained, plain)


def test_pipelined_drain_async_jax(tmp_path):
    """On the jax backend the full-drain flush goes ASYNC: the batch's
    device->host copy starts immediately but delivery waits one drain
    window (probe 7: the relay copy overlaps rendering). The delivered
    stream must still be bit-identical and in order, the in-flight batch
    must land on demanded flushes (record toggles, step_blocks end), and
    the one-window latency must be observable (that's the pipelining)."""
    import numpy as np

    from libzl_tpu.capi.bridge import EngineRuntime
    from libzl_tpu.engine.commands import ClipCommand
    from libzl_tpu.io.sinks import AudioSink
    from libzl_tpu.io.wav import AudioData
    from libzl_tpu.models.clip import ClipAudioSource

    class CaptureSink(AudioSink):
        pacing = False

        def __init__(self):
            self.blocks = []

        def write(self, block):
            self.blocks.append(np.array(block))

    sr = 48000
    n = sr
    ramp = (np.arange(1, n + 1, dtype=np.float32) / n * 0.5)[:, None]

    def build(drain):
        rt = EngineRuntime(sr, 128, 16, backend="jax", bounce_drain=drain)
        sink = CaptureSink()
        rt.set_sink(sink)
        clip = ClipAudioSource(rt.engine, audio=AudioData(ramp, sr))
        rt.engine.start_transport(bpm=120)
        cmd = ClipCommand.channel(clip.id, 0)
        cmd.midi_note = 60
        cmd.start_playback = True
        rt.engine.schedule_clip_command(cmd, 0)
        return rt, sink

    rt1, sink1 = build(1)
    rt1.step_blocks(24)
    plain = np.concatenate(sink1.blocks, axis=0)

    rt4, sink4 = build(4)
    # step_blocks flushes at the end; drive _consume directly to observe
    # the mid-stream pipelining latency
    def pump(rt, k):
        for _ in range(k):
            with rt._lock:
                res = rt.engine.process_block()
                bno = rt.engine.total_blocks
            rt._consume(bno, res)

    pump(rt4, 8)   # two full drains: first went async, second delivers #1
    assert len(sink4.blocks) == 4, "first drain must pipeline, not deliver"
    assert rt4._pending_drain is not None
    pump(rt4, 10)  # blocks 9-16 drain; 17-18 buffered
    rt4._flush_drain()  # demanded: in-flight batch + partial tail land
    assert rt4._pending_drain is None
    assert len(sink4.blocks) == 18
    pump(rt4, 6)
    rt4._flush_drain()
    drained = np.concatenate(sink4.blocks, axis=0)
    assert len(sink4.blocks) == 24
    np.testing.assert_allclose(drained, plain, atol=1e-6)


def test_demanded_flush_races_pipelined_flush():
    """A demanded flush from an API thread (record toggles, set_sink) must
    SERIALIZE with the pump's pipelined flush — without the flush lock the
    API thread can pop the in-flight async batch and deliver it while the
    pump is still mid-delivery of the OLDER previous batch, interleaving
    sink writes out of block order. Hammer both paths concurrently and
    assert the delivered stream is exactly the per-block stream."""
    import threading

    import numpy as np

    from libzl_tpu.capi.bridge import EngineRuntime
    from libzl_tpu.engine.commands import ClipCommand
    from libzl_tpu.io.sinks import AudioSink
    from libzl_tpu.io.wav import AudioData
    from libzl_tpu.models.clip import ClipAudioSource

    class CaptureSink(AudioSink):
        pacing = False

        def __init__(self):
            self.blocks = []
            self._wlock = threading.Lock()

        def write(self, block):
            # per-write atomicity only — ORDER across writes is the
            # engine's contract under test
            with self._wlock:
                self.blocks.append(np.array(block))

    sr = 48000
    n = sr
    ramp = (np.arange(1, n + 1, dtype=np.float32) / n * 0.5)[:, None]

    def build(drain):
        rt = EngineRuntime(sr, 128, 16, backend="jax", bounce_drain=drain)
        sink = CaptureSink()
        rt.set_sink(sink)
        clip = ClipAudioSource(rt.engine, audio=AudioData(ramp, sr))
        rt.engine.start_transport(bpm=120)
        cmd = ClipCommand.channel(clip.id, 0)
        cmd.midi_note = 60
        cmd.start_playback = True
        rt.engine.schedule_clip_command(cmd, 0)
        return rt, sink

    rt1, sink1 = build(1)
    rt1.step_blocks(96)
    plain = np.concatenate(sink1.blocks, axis=0)

    rt, sink = build(3)
    stop = threading.Event()

    def hammer():
        # the levels_start_recording / set_sink pattern: demanded flushes
        # at arbitrary points relative to the pump's pipelined flushes
        while not stop.is_set():
            rt._flush_drain()

    t = threading.Thread(target=hammer)
    t.start()
    try:
        for _ in range(96):
            with rt._lock:
                res = rt.engine.process_block()
                bno = rt.engine.total_blocks
            rt._consume(bno, res)
    finally:
        stop.set()
        t.join(timeout=10)
    rt._flush_drain()
    raced = np.concatenate(sink.blocks, axis=0)
    assert len(sink.blocks) == 96
    np.testing.assert_allclose(raced, plain, atol=1e-6)


def test_drain_shape_warmup_precompiles_flush_concat():
    """_warm_drain_shapes must enumerate exactly the signatures the real
    drain windows hit: driving full pipelined flushes afterwards adds ZERO
    new compiles to the jitted concat (a mid-performance relay compile is
    seconds of pump stall)."""
    import numpy as np

    from libzl_tpu.capi import bridge
    from libzl_tpu.capi.bridge import EngineRuntime
    from libzl_tpu.engine.commands import ClipCommand
    from libzl_tpu.io.sinks import AudioSink
    from libzl_tpu.io.wav import AudioData
    from libzl_tpu.models.clip import ClipAudioSource

    class CaptureSink(AudioSink):
        pacing = False

        def __init__(self):
            self.blocks = []

        def write(self, block):
            self.blocks.append(np.array(block))

    sr = 48000
    ramp = (np.arange(1, sr + 1, dtype=np.float32) / sr * 0.5)[:, None]
    rt = EngineRuntime(sr, 128, 16, backend="jax", bounce_drain=4)
    sink = CaptureSink()
    rt.set_sink(sink)
    clip = ClipAudioSource(rt.engine, audio=AudioData(ramp, sr))

    rt._warm_drain_shapes()
    assert bridge._flat_concat_jit is not None
    warmed = bridge._flat_concat_jit._cache_size()
    assert warmed > 0

    def pump(n):
        for _ in range(n):
            with rt._lock:
                res = rt.engine.process_block()
                bno = rt.engine.total_blocks
            rt._consume(bno, res)

    # idle prefix FIRST: the idle shortcut's numpy zero outputs mix with
    # jax render outputs inside later drain batches — the mixed tuples
    # must not key fresh jit entries (the production pump idles before
    # the first note; observed re-compiles without the device_put
    # normalization in _concat_drain)
    pump(40)
    rt.engine.start_transport(bpm=120)
    cmd = ClipCommand.channel(clip.id, 0)
    cmd.midi_note = 60
    cmd.start_playback = True
    rt.engine.schedule_clip_command(cmd, 0)
    # full drain/cadence cycle (lcm(K=4, levels_every) windows) through
    # the REAL pipelined path, with live and idle blocks interleaved
    cycles = 4 * rt.engine._levels_every
    pump(2 * cycles)
    assert bridge._flat_concat_jit._cache_size() == warmed, (
        "pipelined flush hit a signature the warmup did not enumerate"
    )
    assert len(sink.blocks) > 0
