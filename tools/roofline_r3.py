"""Roofline accounting for the voice-fetch kernels (VERDICT r2 #2).

Computes per-block bytes moved and ops executed for the gather and
windows(grid) fetch paths, the corresponding hardware bounds on v5e, and
the fraction of bound achieved by the round-3 measurements. Pure host
math — runs anywhere; `python tools/roofline_r3.py [V] [B]`.

v5e single-chip model (public figures, How-to-Scale-Your-Model ch.2):
  HBM bandwidth  ~819 GB/s
  MXU            197 TFLOP/s bf16 -> ~98 TFLOP/s f32 (HIGHEST precision)
  VPU            (8,128) lanes x 4 ALUs x ~0.94 GHz ~ 3.85 T elementwise
                 f32 op/s (this reproduces NOTES round-2's ~210 us lower
                 bound for the 1024-voice live block)

Measured device-side kernel times come from tools/tpu_probe1_r3.py
(fetch_only minus the trivial-dispatch floor, chained in-process A/B).
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from libzl_tpu.ops.fetch_pallas import GROUP, SLAB, region_rows, slab_cols

HBM_GBPS = 819e9
VPU_OPS = 3.85e12
MXU_F32 = 98e12
CLOCK = 0.94e9

# probe1_r3 (2026-08-17, in-process): chained per-call medians, ms
MEASURED = {
    # (V, B): (fetch_only_ms, trivial_dispatch_ms)
    (1024, 128): (1.155, 0.799),
    (2048, 128): (1.695, 0.799),
}


def windows_model(V: int, B: int, r_max: float = 4.0, chunk: int = 128,
                  dtype_bytes: int = 4):
    region = region_rows(B, r_max)
    slab = slab_cols(r_max, chunk)
    n_chunks = B // chunk
    dma_bytes = V * 2 * 2 * region * dtype_bytes          # 2 regions x 2 ch
    # hat weight build: ~4 elementwise ops per [2*slab, chunk] element per
    # voice per chunk (iota-sub, alpha-sub, abs, max)
    weight_ops = V * n_chunks * 2 * slab * chunk * 4
    # interpolation dots: per voice per chunk, [2, 2*slab] x [2*slab, chunk]
    dot_flops = V * n_chunks * 2 * (2 * slab) * chunk * 2
    # skinny-dot streaming bound: M=2 uses 2/128 of the systolic array;
    # each dot streams K=2*slab rows -> ~K cycles, G dots per step overlap
    # across the (assume 4) MXUs at best
    dot_stream_s = V * n_chunks * (2 * slab) / CLOCK / 4
    return dict(
        region=region, slab=slab,
        dma_bytes=dma_bytes,
        weight_ops=weight_ops,
        dot_flops=dot_flops,
        t_hbm=dma_bytes / HBM_GBPS,
        t_vpu=weight_ops / VPU_OPS,
        t_mxu_flops=dot_flops / MXU_F32,
        t_mxu_stream=dot_stream_s,
    )


def gather_model(V: int, B: int, dtype_bytes: int = 4):
    # two row-gathers (taps) of interleaved stereo pairs + the elementwise
    # interp/env/pan tail (~25 ops per (v, frame) in the fused graph)
    gather_bytes = V * B * 2 * 2 * dtype_bytes
    tail_ops = V * B * 25
    return dict(
        gather_bytes=gather_bytes,
        tail_ops=tail_ops,
        t_hbm=gather_bytes / HBM_GBPS,
        t_vpu=tail_ops / VPU_OPS,
        # element-gather descriptor bound: ~100-285 ns/row measured in
        # isolation round 1 (NOTES), contradicted in-graph; report bytes
        # bound only and let the measurement speak
    )


def report(V: int = 1024, B: int = 128):
    w = windows_model(V, B)
    g = gather_model(V, B)
    budget_ms = B / 48000 * 1e3
    print(f"== roofline V={V} B={B} (budget {budget_ms:.2f} ms) ==")
    print(f" windows(grid): region={w['region']} slab={w['slab']}")
    print(f"   DMA      {w['dma_bytes'] / 1e6:8.2f} MB  "
          f"-> HBM bound   {w['t_hbm'] * 1e6:8.1f} us")
    print(f"   weights  {w['weight_ops'] / 1e6:8.0f} Mop "
          f"-> VPU bound   {w['t_vpu'] * 1e6:8.1f} us")
    print(f"   dots     {w['dot_flops'] / 1e6:8.0f} MF  "
          f"-> MXU flops   {w['t_mxu_flops'] * 1e6:8.1f} us, "
          f"skinny-stream ~{w['t_mxu_stream'] * 1e6:.0f} us")
    bound = max(w["t_vpu"], w["t_hbm"], w["t_mxu_stream"])
    print(f"   binding bound: {bound * 1e6:.0f} us "
          f"({'VPU' if bound == w['t_vpu'] else 'MXU-stream' if bound == w['t_mxu_stream'] else 'HBM'})")
    meas = MEASURED.get((V, B))
    if meas:
        fetch, floor = meas
        dev_ms = fetch - floor
        print(f"   measured kernel ~{dev_ms * 1e3:.0f} us device-side "
              f"(fetch_only {fetch:.2f} ms - dispatch floor {floor:.2f} ms)"
              f" -> {bound * 1e3 / dev_ms * 100:.0f}% of binding bound")
    print(f" gather: bytes {g['gather_bytes'] / 1e6:.2f} MB -> HBM bound "
          f"{g['t_hbm'] * 1e6:.1f} us; tail {g['tail_ops'] / 1e6:.0f} Mop "
          f"-> VPU {g['t_vpu'] * 1e6:.1f} us")
    print()


if __name__ == "__main__":
    V = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    for v, b in ((96, 128), (V, B), (V, 1024), (4096, 1024)):
        report(v, b)
