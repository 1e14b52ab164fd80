"""FlashCorr: fused on-the-fly correlation + radius-patch lookup (Pallas).

The RAFT-family lookup samples a (2r+1)^2 window of the correlation
volume around each query's flow target, every refinement iteration
(reference semantics: VideoFlow corr lookup consumed via
videoflow_core.py:91-94).  The XLA paths materialize the O((HW)^2)
volume (DenseCorrPyramid) or gather features (OnTheFlyCorr); this kernel
instead RECOMPUTES each query's correlation row on the MXU from
VMEM-resident feature chunks and extracts the patch in VMEM — flash-
attention's compute-over-storage trade applied to cost volumes (the
memory-efficient-sampling idea of arXiv:2505.16942):

  - no volume bytes in HBM (the L0 volume alone is 2.8 GB at the
    1080x1280 bench tile; freeing it enables window batching),
  - no volume build in `encode`,
  - per-iteration HBM traffic is features only (~35 MB vs ~3 GB),
  - the same kernel IS the full-frame >=4K path: VMEM use is constant
    in the grid size.

Mosaic constraints that shaped the formulation (probed on v5e — see
benchmarks/micro_select.py and benchmarks/micro_flashcorr.py):
  - batched dot_general lowers to per-batch tiny matmuls (~80x off) —
    all selects are 2D one-hot matmuls over query sub-blocks;
  - dynamic_update_slice is unimplemented; minor-dim reshapes of small
    blocks and narrow slice stores crash the compiler — so the row
    one-hot is built TRANSPOSED from 2D iota + a lane-vector broadcast
    (no reshape), and every store is a full-width static slice;
  - rr/cc index vectors arrive pre-packed as lane vectors ([B, nQ,
    QB*SP] int32, SP = side padded to 16) so per-sub-block access is an
    aligned 256-lane slice.

Per grid step (b, qi, mi):
  corr = q_blk @ f2_chunk^T            MXU, f32 accumulate, * 1/sqrt(C)
  for each 16-query sub-block:
    Rt one-hot (rows of chunk -> patch rows), transposed  [QBS*GR, 256]
    bands[si] += Rt^T @ corr_sub                          MXU
  at last chunk: per sub-block column one-hot Ct, block-diag mask and a
  static extract matmul produce patch [QB*SP, SP]; stores are static.

The patch values are EXACT volume entries (every one-hot product is
1.0 * v with a single nonzero per sum), so numerics match the dense
lookup's bf16-at-rest volume bit-for-bit; bilinear/border handling is
shared XLA code in core/corr.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QB = 512    # queries per grid block
QBS = 16    # queries per select sub-block (one 2D one-hot matmul each)
SP = 16     # patch side padded to a lane-friendly group (side <= 16)
LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def level_pad_dims(lh: int, lw: int) -> Tuple[int, int, int]:
    """(lh_pad, lw_pad, gr) for a [lh, lw] target plane: lanes padded to
    128 multiples, rows grouped so each chunk is ~2048 lanes."""
    lw_pad = _round_up(lw, LANE)
    gr = max(1, min(2048 // lw_pad, 64))
    lh_pad = _round_up(lh, gr)
    return lh_pad, lw_pad, gr


def pad_f2_level(f2l: jnp.ndarray) -> jnp.ndarray:
    """[B, lh, lw, C] pooled target features -> [B, lh_pad, lw_pad, C]
    zero-padded to the kernel's plane layout (zero features make the
    padded positions' correlations exactly 0; they are never selected
    because rr/cc are clamped to the real plane)."""
    b, lh, lw, c = f2l.shape
    lh_pad, lw_pad, _ = level_pad_dims(lh, lw)
    if (lh_pad, lw_pad) != (lh, lw):
        f2l = jnp.pad(f2l, ((0, 0), (0, lh_pad - lh), (0, lw_pad - lw), (0, 0)))
    return f2l


def _kernel(q_ref, f2_ref, rrl_ref, ccl_ref, out_ref, bands_ref, *,
            gr: int, lw_pad: int, scale: float, out_dtype):
    qi = pl.program_id(1)
    mi = pl.program_id(2)
    nsub = QB // QBS

    @pl.when(mi == 0)
    def _():
        bands_ref[:] = jnp.zeros_like(bands_ref)

    q = q_ref[0]                       # [QB, C]
    f2c = f2_ref[0]                    # [gr*lw_pad, C]
    corr = jax.lax.dot_general(
        q, f2c, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    corr = (corr * scale).astype(out_dtype)   # [QB, gr*lw_pad]

    r0 = mi * gr
    for si in range(nsub):
        corr_sub = corr[si * QBS : (si + 1) * QBS].reshape(QBS * gr, lw_pad)
        rr_row = rrl_ref[0, qi, si * QBS * SP : (si + 1) * QBS * SP]
        u_q = jax.lax.broadcasted_iota(jnp.int32, (QBS * gr, QBS * SP), 1) // SP
        v_q = jax.lax.broadcasted_iota(jnp.int32, (QBS * gr, QBS * SP), 0) // gr
        v_g = jax.lax.broadcasted_iota(jnp.int32, (QBS * gr, QBS * SP), 0) % gr
        rt = ((u_q == v_q) & (v_g + r0 == rr_row[None, :])).astype(out_dtype)
        sel = jax.lax.dot_general(
            rt, corr_sub, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_dtype)            # [QBS*SP, lw_pad]
        # One-hot rows: accumulation is exact (one nonzero per sum).
        bands_ref[si, :, :] += sel

    @pl.when(mi == pl.num_programs(2) - 1)
    def _():
        um = jax.lax.broadcasted_iota(jnp.int32, (QBS * SP, QBS * SP), 0) // SP
        jm = jax.lax.broadcasted_iota(jnp.int32, (QBS * SP, QBS * SP), 1) // SP
        blockdiag = (um == jm).astype(out_dtype)
        et = jax.lax.broadcasted_iota(jnp.int32, (QBS * SP, SP), 0) % SP
        tt = jax.lax.broadcasted_iota(jnp.int32, (QBS * SP, SP), 1)
        extract = (et == tt).astype(out_dtype)            # [QBS*SP, SP]
        lanew = jax.lax.broadcasted_iota(jnp.int32, (lw_pad, QBS * SP), 0)
        for si in range(nsub):
            cc_row = ccl_ref[0, qi, si * QBS * SP : (si + 1) * QBS * SP]
            ct = (lanew == cc_row[None, :]).astype(out_dtype)
            bands = bands_ref[si, :, :]                   # [QBS*SP, lw_pad]
            pf = jax.lax.dot_general(
                bands, ct, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_dtype)                           # [u=(q,s), j=(q2,t)]
            patch = jax.lax.dot_general(
                pf * blockdiag, extract, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                             # [QBS*SP, SP]
            out_ref[0, si * QBS * SP : (si + 1) * QBS * SP, :] = patch.astype(
                out_ref.dtype
            )


def _lane_pack(idx: jnp.ndarray, nqb: int) -> jnp.ndarray:
    """[B, NqPad, side] int32 -> [B, nqb, QB*SP] with -1 in dead lanes."""
    b, nq, side = idx.shape
    pad = jnp.full((b, nq, SP - side), -1, jnp.int32)
    return jnp.concatenate([idx, pad], axis=2).reshape(b, nqb, QB * SP)


@functools.partial(
    jax.jit,
    static_argnames=("lh", "lw", "side", "interpret"),
)
def flash_patch_level(
    f1: jnp.ndarray,
    f2pad: jnp.ndarray,
    rr: jnp.ndarray,
    cc: jnp.ndarray,
    *,
    lh: int,
    lw: int,
    side: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Patch extraction for one pyramid level.

    f1:    [B, Nq, C] query features (unscaled; 1/sqrt(C) applied inside).
    f2pad: [B, lh_pad, lw_pad, C] padded pooled target features
           (pad_f2_level output).
    rr:    [B, Nq, side] int32 patch-row indices, clamped to [0, lh).
    cc:    [B, Nq, side] int32 patch-col indices, clamped to [0, lw).

    Returns patch [B, Nq, side, side] in f1.dtype — exact volume entries,
    matching DenseCorrPyramid storage numerics (f32 MXU accumulate *
    1/sqrt(C), cast to the feature dtype at rest).
    """
    assert side <= SP, f"side {side} exceeds kernel lane group {SP}"
    b, nq, c = f1.shape
    lh_pad, lw_pad, gr = level_pad_dims(lh, lw)
    assert f2pad.shape[1:3] == (lh_pad, lw_pad), (
        f"f2pad {f2pad.shape} vs expected {(lh_pad, lw_pad)} — pad with "
        "pad_f2_level"
    )
    nm = lh_pad // gr
    cm = gr * lw_pad

    nq_pad = _round_up(nq, QB)
    nqb = nq_pad // QB
    if nq_pad != nq:
        f1 = jnp.pad(f1, ((0, 0), (0, nq_pad - nq), (0, 0)))
        rr = jnp.pad(rr, ((0, 0), (0, nq_pad - nq), (0, 0)), constant_values=-1)
        cc = jnp.pad(cc, ((0, 0), (0, nq_pad - nq), (0, 0)), constant_values=-1)

    rrl = _lane_pack(rr, nqb)
    ccl = _lane_pack(cc, nqb)
    f2flat = f2pad.reshape(b, lh_pad * lw_pad, c)
    dt = f1.dtype
    scale = 1.0 / float(np.sqrt(c))

    out = pl.pallas_call(
        functools.partial(
            _kernel, gr=gr, lw_pad=lw_pad, scale=scale, out_dtype=dt
        ),
        grid=(b, nqb, nm),
        in_specs=[
            pl.BlockSpec((1, QB, c), lambda bi, qi, mi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cm, c), lambda bi, qi, mi: (bi, mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nqb, QB * SP), lambda bi, qi, mi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nqb, QB * SP), lambda bi, qi, mi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, QB * SP, SP), lambda bi, qi, mi: (bi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, nq_pad * SP, SP), dt),
        scratch_shapes=[
            pltpu.VMEM((QB // QBS, QBS * SP, lw_pad), dt),
        ],
        interpret=interpret,
    )(f1, f2flat, rrl, ccl)

    patch = out.reshape(b, nq_pad, SP, SP)[:, :nq, :side, :side]
    return patch
