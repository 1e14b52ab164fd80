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

A hand-written Pallas lookup kernel (per-query-block patch DMA via
PrefetchScalarGridSpec with double buffering) is the next step if
profiling shows the XLA gather still bounds the refinement loop; the
benchmark harness for that decision is benchmarks/profile_tile.py.
"""
