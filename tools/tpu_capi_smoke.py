"""Real-TPU C-ABI smoke: the full production path on hardware.

Loads native/libzl.so (CPython-embedding shim), boots the engine on the
TPU backend with bucket warmup, plays a looped clip through the realtime
pump for ~3 s while recording global playback, and verifies the WAV. The
closest analog of running the reference's test/playtest.py on the target
device.

    nohup python tools/tpu_capi_smoke.py > /tmp/tpu_capi_smoke.log 2>&1 &

NOTE: must run as a SUBPROCESS client of the shim (the shim owns
process-global state), so this script execs the client inline.
"""

import ctypes
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    os.environ.setdefault("LIBZL_TPU_BACKEND", "jax")
    os.environ.setdefault("LIBZL_TPU_VOICES", "256")
    os.environ.setdefault("LIBZL_TPU_WARMUP", "1")
    wav_in = "/tmp/tpu_capi_in.wav"
    wav_out = "/tmp/tpu_capi_out.wav"

    from libzl_tpu.io.wav import read_wav, write_wav

    sr = 48000
    t = np.arange(sr) / sr
    write_wav(
        wav_in,
        (0.5 * np.sin(2 * np.pi * 330 * t)).astype(np.float32), sr,
    )

    zl = ctypes.CDLL(os.path.join(REPO, "native", "libzl.so"))
    zl.ClipAudioSource_new.restype = ctypes.c_void_p
    zl.ClipAudioSource_new.argtypes = [ctypes.c_char_p, ctypes.c_bool]
    zl.ClipAudioSource_play.argtypes = [ctypes.c_void_p, ctypes.c_bool]
    zl.ClipAudioSource_stop.argtypes = [ctypes.c_void_p]

    t0 = time.perf_counter()
    zl.initJuce()   # TPU backend boot: bucket warmup (pays the relay's
    # first-D2H fence inside warmup) + pump
    print(f"initJuce (jax/TPU, warmup+fence, pump): "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    from libzl_tpu.capi import bridge
    eng = bridge._rt().engine
    import jax
    print("backend:", jax.default_backend(), "fetch:", eng.fetch,
          "buckets:", eng._bucket_ladder, flush=True)

    clip = zl.ClipAudioSource_new(wav_in.encode(), False)
    assert clip, "clip creation failed"
    zl.AudioLevels_setRecordGlobalPlayback(True)
    zl.AudioLevels_setGlobalPlaybackFilenamePrefix(wav_out.encode())
    zl.AudioLevels_startRecording()
    zl.SyncTimer_startTimer(120)  # the argument is a BPM (SyncTimer.cpp:869-872)
    zl.ClipAudioSource_play(clip, True)
    time.sleep(3.0)
    zl.ClipAudioSource_stop(clip)
    time.sleep(0.3)
    zl.AudioLevels_stopRecording()
    zl.SyncTimer_stopTimer()

    slo = eng.slo
    print(f"SLO: {slo.missed_blocks}/{slo.total_blocks} deadline misses, "
          f"dsp load {eng.dsp_load.load:.2f}", flush=True)
    pump_err = bridge._rt().pump_error
    zl.shutdownJuce()

    out = read_wav(wav_out)
    peak = float(np.abs(out.samples).max())
    print(f"recorded {out.num_frames} frames, peak {peak:.3f}", flush=True)
    # while RECORDING, the pump syncs every block for the disk writer; on
    # this harness's relay each D2H costs ~30 ms (NOTES_TPU_ENV.md), so the
    # wall-clock pump sustains ~33 blocks/s here regardless of engine
    # speed — assert meaningful recorded audio, not realtime frames (a
    # directly-attached host records realtime; see the groovebox demo for
    # the deterministic-drive recording path)
    assert out.num_frames >= 50 * 128, out.num_frames
    assert peak > 0.05, peak
    assert pump_err is None, pump_err
    print("TPU-CAPI-SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
