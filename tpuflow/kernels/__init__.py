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

## Round-3 plan (in priority order)

1. Pallas fused lookup: the remaining 0.34 s is materialization traffic
   (bands/C/patch intermediates, ~2x the volume bytes).  A kernel that
   builds the one-hot selects in VMEM and streams the volume once would
   approach the ~10 ms/iteration bandwidth floor.  Bring-up rule from
   round 1 still stands: interpret mode on CPU first; nested-vmap
   dynamic_slice lowering CRASHED the v5e worker via the remote-compile
   harness.
2. On-the-fly blockwise correlation in Pallas (never materialize the
   volume): MXU matmul per (query block, region) — the only viable
   full-frame 4K path; the XLA OnTheFlyCorr fallback is correct but
   scalar-gather-bound (~30 min/lookup at 2160p).
3. Pallas fused PCBlock (SK update stack measures ~6x off its FLOP
   floor).
"""
