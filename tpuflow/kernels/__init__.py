"""Custom TPU kernels (Pallas) — status and design notes.

The hot device ops of this framework and how each is served today:

| op                       | implementation                 | why |
|--------------------------|--------------------------------|-----|
| all-pairs cost volume    | XLA batched matmul (MXU)       | one einsum per volume, f32 accumulate, bf16 at rest; lax.map bounds transients |
| corr pyramid pooling     | XLA reshape-mean               | pure bandwidth; XLA fuses |
| corr radius lookup       | XLA take_along_axis patch      | one (2r+2)^2 row-local gather per query; flat [N, lh*lw] layout pads nothing and the shared-fraction trick cuts gathered bytes ~3x |
| on-the-fly correlation   | XLA gather + einsum            | memory-bound fallback for grids whose volume exceeds HBM |
| GRU / conv stacks        | XLA convs (MXU, bf16)          | standard |
| TAA warp + blend         | XLA gather + VPU elementwise   | per-pixel dynamic 2D addressing |
| encoders (flow->RGB)     | XLA elementwise (fused)        | VPU-bound, fully fused under jit |
| NCC template match       | XLA grouped conv (MXU)         | TM_CCOEFF_NORMED as conv + window sums |
| phase correlation        | XLA FFT                        | batched rfft2/irfft2 |

Every gather-shaped op above was layout-engineered for Mosaic/XLA tiling
(flat minor dims that are 128-lane multiples; no tiny trailing dims; x/y
index planes kept separate) after HBM-inflation and in-loop layout-copy
pathologies were observed and fixed — see tpuflow/core/corr.py.

## Measured on v5e (1280x1280 tile window, MOF seq=5, bf16)

Ablation (benchmarks/ablate_tile.py):
  full forward, 12 iterations ............ 14.2s  (row-band lookup)
                                           10.9s  (patch-take lookup)
  decoder_depth=1 ........................  0.95s
  12 iterations, lookup stubbed ..........  0.25s   <- everything else
  => the correlation lookup is ~99% of runtime.

Raw gather rate (take_along_axis [76800,100] from [76800,25600]):
  ~103 ms = 75M elements/s (~12.5 cycles/element), identical for bf16
  and f32 operands.  Every level gathers N*(2r+2)^2 = 7.7M elements, so
  8 gathers/iteration x 12 iterations reproduces the full-model time
  exactly — XLA's TPU gather is the hard floor for this formulation.

Variants already tried (all numerics-equal, tests enforce):
  lookup       (patch-take, default) 31M scalars/iter @ 14 cyc/elem
  lookup_rows  (row-band + one-hot)  123M span elems  @ 4.6 cyc/elem — net slower
  lookup_span  (16-wide spans)       12M span elems — its nested-vmap
               dynamic_slice lowering CRASHED the v5e worker under the
               remote-compile harness; quarantined.

## Round-2 outcome (see docs/ROUND2_NOTES.md for the measurements)

The gather formulation was replaced at the XLA level instead of dropping
to Pallas: the production lookup is now a one-hot row/column-select
MATMUL over tile-ALIGNED grouped volumes ([N, mult8, mult128], explicit
zeros) that cross an encode/refine jit split as arguments
(core/corr.py:DenseCorrPyramid, core/mofnet.py, runtime/engine.py).
That removed both the scalar-gather floor and XLA's in-loop
remat-relayout of jit-internal volumes: 12-iteration 2-direction lookup
0.73 s -> 0.34 s at the 1280-tile, whole-window bench 0.046 -> 0.523
frames/s stride-1 across the round.

## Round-3 outcome (measurements in docs/ROUND3_NOTES.md §2)

Three compiled Pallas kernels now exist; the decisive facts:

1. `flashcorr.py` (v1): fused on-the-fly correlation + patch lookup.
   The kernel runs at ~74% MXU utilization for its formulation, but the
   FORMULATION carries 1.6x lane padding, a 1x-of-corr select tax, and
   a deep-level dense sidecar whose band intermediates are level-size-
   independent (~40% of lookup time).  Index prep + bilinear epilogue
   measured NEGLIGIBLE (~1 ms/call) — the round-2 guess that
   "materialization traffic" was the fat was wrong for the flash path.
2. `flashcorr2.py` (v2, production candidate): phase-packed layout —
   zero lane padding at every level (g rows per 640-lane group + the
   dense path's phase arithmetic; phase reaches sublanes via a one-hot
   identity-matmul transpose), all levels through the kernel against
   avg-pooled features (== pooled volumes exactly, by linearity).
   No volume build, no volume bytes in HBM, constant VMEM in grid size
   — the same kernel is the full-frame >=4K path.
3. `bandlookup.py`: chunk-range DMA over a materialized row-outer
   volume.  SLOWER than the XLA dense stream at product shapes (291 vs
   173 ms/12-iter smooth, 488 chaotic; 1.67x volume bytes) — per-MXU-op
   issue cost of many small selects beats the DMA savings.  Kept as
   `corr_impl='band'`.

## Round-3 device sweep outcome (docs/ROUND3_NOTES.md §7-8)

Every variant was measured on the v5e; the standings at the bench tile
(12-iteration 2-direction lookup, BN=3):

- dense (XLA one-hot stream): 669 ms lookup, flow-INDEPENDENT;
  build now ~57 ms/window after the pooled-feature rewrite
  (each level one einsum against 2^l-pooled features, written directly
  in the aligned layout — enc_j measured 406 -> 107 ms/window).
- flash2 (QBS=8): 548 ms smooth / ~790 chaotic + 8 ms build.  Chunk
  gating wins only when flows are smooth/converged; random-init bench
  flows are chaotic, so DENSE stays the materializable-grid default and
  flash2 owns the big-grid branch (2160p 4-level lookup 0.079 s vs
  ~30 min XLA fallback) + `corr_impl='flash2'` for smooth workloads.
- Probes (TPUFLOW_F2_STAGE / micro_flash2break / micro_denselevels):
  flash2 spends corr 7.5 / select 7.2 / epilogue 9.3 ms per dir-iter,
  nearly level-size-independent (VPU-issue-bound); dense is 1.8x off
  its HBM roofline at L0 and 4.5-5x at deep levels (fixed per-query
  select costs).  Exact per-query patch extraction costs ~1x of its
  operand in one-hot work in EVERY formulation tried (XLA batched tiny
  matmuls, Pallas select+epilogue, band DMA) — the remaining ~2x needs
  extraction shared across raster-adjacent queries (windowed corr,
  sketched in ROUND3_NOTES §8).

SK update stack: measured at ~87% of its depthwise/VPU floor
(profile_pcblock.py with the fixed host-sync timer); XLA already emits
packed-bf16 VPU ops (dw 15x15 at 2.5-3.2 TF/s > the 2 TF/s f32 bound).
A Pallas depthwise kernel has no headroom here — CLOSED.
"""
