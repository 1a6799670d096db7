"""Windows (Pallas) fetch path vs gather path — interpret mode on CPU."""

import numpy as np

from libzl_tpu.engine.voicestate import VoicePool
from libzl_tpu.ops.voice import render_voices

SR = 48000.0
B = 128


def _make_pool_with_wraps():
    frames = 5000
    t = np.arange(frames) / SR
    sound = np.stack(
        [0.5 * np.sin(2 * np.pi * 440 * t), 0.5 * np.sin(2 * np.pi * 441 * t)],
        axis=1,
    ).astype(np.float32)
    # pad like the soundbank would (guard + block alignment)
    padded = np.zeros((2, 8192), np.float32)
    padded[:, :frames] = sound.T
    pool = VoicePool(16, B, SR)
    rng = np.random.default_rng(3)
    for v in range(12):
        pool.note_on(
            v, clip_id=v, midi_note=int(rng.integers(48, 73)),
            midi_channel=v % 10, lane=2 + v % 10,
            base=1024, length=frames, source_rate=SR, root_note=60,
            start_sec=0.0, stop_sec=frames / SR,
            gain=0.8, clip_volume=0.9, pan=float(rng.uniform(-1, 1)),
            attack=0.002, decay=0.05, sustain=0.6, release=0.05,
            looping=bool(v % 2), length_beats=1.0 + (v % 3) * 0.3,
            start_tick=0,
        )
    return padded, pool


def test_windows_matches_gather_over_blocks():
    import jax.numpy as jnp

    padded, pool = _make_pool_with_wraps()
    for b in range(40):  # crosses positional loop wraps for short loops
        prog = pool.build_program(
            block_start_sample=b * B, tick_anchor_sample=0.0,
            tick_anchor=0, samples_per_tick=250.0,
        )
        mix_g, peak_g, c_g = render_voices(
            jnp, padded, prog, B, return_contrib=True, fetch="gather"
        )
        mix_w, peak_w, c_w = render_voices(
            jnp, padded, prog, B, return_contrib=True, fetch="windows"
        )
        np.testing.assert_allclose(
            np.asarray(c_w), np.asarray(c_g), atol=2e-6,
            err_msg=f"block {b}",
        )
        np.testing.assert_allclose(
            np.asarray(peak_w), np.asarray(peak_g), atol=2e-6
        )
        pool.advance(prog)


def test_superblock_windows_matches_gather():
    """B=1024 super-block rendering (throughput mode) through the stream
    kernel, including loop wraps inside the super-block."""
    import jax.numpy as jnp

    B_SUPER = 1024
    frames = 6000
    t = np.arange(frames) / SR
    sound = np.stack(
        [0.4 * np.sin(2 * np.pi * 330 * t), 0.4 * np.sin(2 * np.pi * 331 * t)],
        axis=1,
    ).astype(np.float32)
    padded = np.zeros((2, 16384), np.float32)
    padded[:, 512 : 512 + frames] = sound.T
    pool = VoicePool(8, B_SUPER, SR)
    rng = np.random.default_rng(5)
    for v in range(8):
        pool.note_on(
            v, clip_id=v, midi_note=int(rng.integers(50, 74)),
            midi_channel=v % 10, lane=2 + v % 10,
            base=512, length=frames, source_rate=SR, root_note=62,
            start_sec=0.0, stop_sec=frames / SR,
            gain=0.9, clip_volume=1.0, pan=0.0,
            attack=0.0, decay=0.1, sustain=1.0, release=0.05,
            looping=True, length_beats=1.0 if v % 2 else 0.37,
            start_tick=0,
        )
    for b in range(6):
        prog = pool.build_program(
            block_start_sample=b * B_SUPER, tick_anchor_sample=0.0,
            tick_anchor=0, samples_per_tick=250.0,
        )
        _, _, c_g = render_voices(
            jnp, padded, prog, B_SUPER, return_contrib=True, fetch="gather"
        )
        _, _, c_w = render_voices(
            jnp, padded, prog, B_SUPER, return_contrib=True, fetch="windows"
        )
        np.testing.assert_allclose(
            np.asarray(c_w), np.asarray(c_g), atol=2e-6, err_msg=f"block {b}"
        )
        if b < 2:
            # the grid variant's multi-chunk path (8 chunk grid steps here)
            _, _, c_gr = render_voices(
                jnp, padded, prog, B_SUPER, return_contrib=True,
                fetch="windows:grid",
            )
            np.testing.assert_allclose(
                np.asarray(c_gr), np.asarray(c_g), atol=2e-6,
                err_msg=f"grid block {b}",
            )
        pool.advance(prog)


def test_windows_variants_match_gather_over_blocks():
    """The fusedw/batchdot chunk-compute variants (fetch_pallas._VARIANTS)
    must agree with gather across positional loop wraps, like the default
    loop variant does."""
    import pytest
    import jax.numpy as jnp

    # the default suffix-less path exercises _DEFAULT_VARIANT (fusedw);
    # keep the other variants and the chunk/align probe knobs covered
    for variant in ("loop", "batchdot", "grid", "c64", "a32", "a32,c64", "g16"):
        padded, pool = _make_pool_with_wraps()
        for b in range(25):
            prog = pool.build_program(
                block_start_sample=b * B, tick_anchor_sample=0.0,
                tick_anchor=0, samples_per_tick=250.0,
            )
            _, _, c_g = render_voices(
                jnp, padded, prog, B, return_contrib=True, fetch="gather"
            )
            _, _, c_w = render_voices(
                jnp, padded, prog, B, return_contrib=True,
                fetch=f"windows:{variant}",
            )
            np.testing.assert_allclose(
                np.asarray(c_w), np.asarray(c_g), atol=2e-6,
                err_msg=f"variant {variant} block {b}",
            )
            pool.advance(prog)


def test_windows_int16_bank_matches_gather():
    """int16 banks ride the windows kernel too: the DMA moves int16 rows
    and the slab dequantizes in VMEM (fetch_pallas._slab_f32), matching the
    gather path's x/32767 exactly."""
    import jax.numpy as jnp

    padded, pool = _make_pool_with_wraps()
    q = np.clip(
        np.round(padded * np.float32(32767.0)), -32768, 32767
    ).astype(np.int16)
    for b in range(20):
        prog = pool.build_program(
            block_start_sample=b * B, tick_anchor_sample=0.0,
            tick_anchor=0, samples_per_tick=250.0,
        )
        _, _, c_g = render_voices(
            jnp, q, prog, B, return_contrib=True, fetch="gather"
        )
        _, _, c_w = render_voices(
            jnp, q, prog, B, return_contrib=True, fetch="windows"
        )
        np.testing.assert_allclose(
            np.asarray(c_w), np.asarray(c_g), atol=2e-6, err_msg=f"block {b}"
        )
        pool.advance(prog)


def test_windows_suffix_parsing():
    from libzl_tpu.ops.fetch_pallas import parse_suffix

    assert parse_suffix("") == ("highest", "auto", 128, 128, 8)
    assert parse_suffix("default") == ("default", "auto", 128, 128, 8)
    assert parse_suffix("loop") == ("highest", "loop", 128, 128, 8)
    assert parse_suffix("batchdot") == ("highest", "batchdot", 128, 128, 8)
    assert parse_suffix("grid") == ("highest", "grid", 128, 128, 8)
    assert parse_suffix("default,fusedw") == ("default", "fusedw", 128, 128, 8)
    assert parse_suffix("c64") == ("highest", "auto", 64, 128, 8)
    assert parse_suffix("a32,c64") == ("highest", "auto", 64, 32, 8)
    import pytest

    with pytest.raises(ValueError):
        parse_suffix("nope")
    with pytest.raises(ValueError):
        parse_suffix("c100")
    with pytest.raises(ValueError):
        parse_suffix("a256")
    assert parse_suffix("g16") == ("highest", "auto", 128, 128, 16)
    with pytest.raises(ValueError):
        parse_suffix("g5")
    with pytest.raises(ValueError):
        parse_suffix("g4")  # sublane-dim reject on TPU (probe 25)


def test_windows_quirk_gain_matches():
    import jax.numpy as jnp

    padded, pool = _make_pool_with_wraps()
    prog = pool.build_program(
        block_start_sample=0, tick_anchor_sample=0.0,
        tick_anchor=0, samples_per_tick=250.0,
    )
    _, _, c_g = render_voices(
        jnp, padded, prog, B, return_contrib=True, fetch="gather",
        quirk_gain=True,
    )
    _, _, c_w = render_voices(
        jnp, padded, prog, B, return_contrib=True, fetch="windows",
        quirk_gain=True,
    )
    np.testing.assert_allclose(np.asarray(c_w), np.asarray(c_g), atol=2e-6)


def test_interleaved_rows_gather_matches_planar():
    import jax.numpy as jnp

    padded, pool = _make_pool_with_wraps()
    inter = np.ascontiguousarray(padded.T)
    for b in range(10):
        prog = pool.build_program(
            block_start_sample=b * B, tick_anchor_sample=0.0,
            tick_anchor=0, samples_per_tick=250.0,
        )
        _, _, c_p = render_voices(
            jnp, padded, prog, B, return_contrib=True, fetch="gather"
        )
        _, _, c_i = render_voices(
            jnp, inter, prog, B, return_contrib=True, fetch="gather"
        )
        np.testing.assert_array_equal(np.asarray(c_i), np.asarray(c_p))
        pool.advance(prog)


def test_windows_kernel_hostile_positions_fuzz():
    """Direct kernel contract fuzz: randomized window-relative positions
    including out-of-range and boundary values must match a straight
    two-tap interpolation oracle over the same window scratch, with
    out-of-range lanes exactly zero (the kernel clamps; the caller's
    validity mask is NOT in play here)."""
    import jax.numpy as jnp

    from libzl_tpu.ops.fetch_pallas import fetch_interp, region_rows

    rng = np.random.default_rng(77)
    B_ = 128
    region = region_rows(B_)
    window_rows = 2 * region
    N = 16384
    sound = rng.standard_normal((2, N)).astype(np.float32) * 0.5
    V = 8
    max_blk = (N - region) // 512
    for trial in range(4):
        win_a = rng.integers(0, max_blk, V).astype(np.int32)
        win_b = rng.integers(0, max_blk, V).astype(np.int32)
        kind = rng.integers(0, 4, (V, B_))
        # host contract: in-region positions within one 128-frame chunk
        # span at most r_max*chunk (+2 taps) — draw per-voice chunk-local
        # windows of 512 samples inside each region
        base_a = rng.integers(0, region - 516, V)[:, None]
        base_b = region + rng.integers(0, region - 516, V)[:, None]
        jitter = rng.integers(0, 512, (V, B_))
        pos = np.where(
            kind == 0, base_a + jitter,                               # A
            np.where(
                kind == 1, base_b + jitter,                           # B
                np.where(kind == 2, rng.integers(-100, 0, (V, B_)),   # neg
                         rng.integers(window_rows - 1,
                                      window_rows + 100, (V, B_))),   # past
            ),
        ).astype(np.int32)
        alpha = rng.random((V, B_)).astype(np.float32)
        out = np.asarray(fetch_interp(
            sound, pos, alpha, win_a, win_b, block_frames=B_,
        ))
        # oracle: two-tap interp from the same per-voice windows
        for v in range(V):
            wa = sound[:, win_a[v] * 512 : win_a[v] * 512 + region]
            wb = sound[:, win_b[v] * 512 : win_b[v] * 512 + region]
            window = np.concatenate([wa, wb], axis=1)  # [2, 2*region]
            for b in range(B_):
                p = int(pos[v, b])
                if not (0 <= p < window_rows - 1):
                    assert out[v, :, b].max() == 0.0 and \
                        out[v, :, b].min() == 0.0, (trial, v, b, p)
                    continue
                a = float(alpha[v, b])
                want = window[:, p] * (1 - a) + window[:, p + 1] * a
                np.testing.assert_allclose(
                    out[v, :, b], want, atol=3e-6,
                    err_msg=f"trial {trial} v={v} b={b} p={p}",
                )
