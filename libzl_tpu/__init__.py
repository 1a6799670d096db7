"""libzl_tpu — a TPU-native audio engine with the capabilities of zynthbox/libzl.

Architecture (see SURVEY.md §7):
- a pure jitted render function over a voice×block grid (`libzl_tpu.engine.render`)
- a host-side block scheduler replacing JACK/SyncTimer (`libzl_tpu.engine.engine`)
- session objects (clips, positions, levels) in `libzl_tpu.models`
- MIDI routing/transport in `libzl_tpu.midi`
- multi-chip sharding in `libzl_tpu.parallel`
- a C ABI shim preserving lib/libzl.h in `native/`
"""

from .constants import (
    BEAT_SUBDIVISIONS,
    DEFAULT_BLOCK_FRAMES,
    DEFAULT_NUM_VOICES,
    DEFAULT_SAMPLE_RATE,
    NUM_SAMPLER_CHANNELS,
)

__version__ = "0.1.0"

_LAZY = {
    "AudioEngine": ("libzl_tpu.engine.engine", "AudioEngine"),
    "ClipAudioSource": ("libzl_tpu.models.clip", "ClipAudioSource"),
    "WaveFormItem": ("libzl_tpu.models.waveform", "WaveFormItem"),
    "save_session": ("libzl_tpu.models.session", "save_session"),
    "load_session": ("libzl_tpu.models.session", "load_session"),
    "make_mesh": ("libzl_tpu.parallel.sharding", "make_mesh"),
}


def __getattr__(name):
    """Lazy top-level API (keeps `import libzl_tpu` light)."""
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'libzl_tpu' has no attribute {name!r}")
