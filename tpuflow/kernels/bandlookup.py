"""Banded sparse streaming correlation lookup (Pallas TPU).

The RAFT-family radius lookup (reference semantics: VideoFlow corr
lookup, videoflow_core.py:91-94) samples, for every query, a patch of
(2r+2)^2 EXACT volume entries around its flow target — i.e. `side`
CONSECUTIVE plane rows per query.  Across a block of raster-adjacent
queries the union of needed rows is one contiguous range whose size
tracks the local flow spread: typically ~(block rows + flow spread +
side) ≈ 20-40 of the 135+ plane rows at product shapes.

The XLA dense lookup (core/corr.py DenseCorrPyramid) must STREAM the
whole volume through one-hot select matmuls every refinement iteration
(~1.5 GB x 6 direction-frames x 12 iterations per 1080p window), because
XLA has no data-dependent reads.  This kernel reads ONLY each query
block's row range:

  - host/XLA side computes, per query block, the chunk range
    [lo, hi) of chunk_rows-row volume chunks its patches touch
    (exact — from the same clamped indices the lookup uses);
  - the ranges ride in as scalar-prefetch SMEM values; the kernel
    fori-loops lo..hi, DMA-ing chunks [chunk_rows, QB, lw_pad] from HBM
    and accumulating per-sub-block one-hot row selects into VMEM bands;
  - at loop end the column one-hot + block-diagonal extract produce the
    patch, exactly as kernels/flashcorr.py does (same Mosaic-proven
    machinery: 2D transposed one-hots from iota + lane vectors, static
    full-width stores).

Blocking: per-MXU-op cost, not FLOPs, governs this kernel (measured on
v5e: the (chunk_rows=8, QBS=8) variant issues ~380 tiny dots per grid
step and lands at the dense path's time).  chunk_rows x QBS sets the
select dot shape [chunk_rows*QBS, QBS*SP]; the defaults give 512-deep
contractions (full MXU pipe) at ~2-3 chunks per typical query block.

Volume layout: [B, lh8, NQ_pad, lw_pad] — plane row OUTER (so a chunk
slab [chunk_rows, QB, lw_pad] is one strided DMA), queries in sublanes
(NQ_pad mult of QB), lanes a 128-multiple of the plane width.  No row
grouping and no phase arithmetic: lanes are pure x.  Built by
core/corr.py BandCorrPyramid.

Numerics: every selected value is an exact volume entry (one-hot
products are 1.0 * v with a single nonzero per sum, f32 MXU
accumulation), so results match DenseCorrPyramid/CorrPyramid lookups on
the same volume values bit-for-bit; bilinear/border handling is shared
XLA code in core/corr.py.

Worst case (wild flow: every block spans every chunk) degrades to the
full-volume stream — i.e. the XLA path's traffic — never worse.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Blocking constants (env-overridable for device sweeps,
# benchmarks/micro_bandlookup.py; defaults are the v5e-tuned values).
QB = 512          # queries per grid block
QBS = int(os.environ.get("TPUFLOW_BAND_QBS", "32"))   # queries / sub-block
SP = 16           # patch side padded to a lane-friendly group (side <= 16)
CHUNK_ROWS = int(os.environ.get("TPUFLOW_BAND_CHUNK", "16"))  # rows / DMA
LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _band_kernel(lohi_ref, rrl_ref, ccl_ref, vol_ref, out_ref,
                 slab_ref, bands_ref, sem, *, lw_pad: int, chunk_rows: int,
                 qbs: int, out_dtype):
    bi = pl.program_id(0)
    qi = pl.program_id(1)
    nsub = QB // qbs
    rows = chunk_rows * qbs  # slab rows per select sub-block
    cols = qbs * SP

    bands_ref[:] = jnp.zeros_like(bands_ref)

    lo = lohi_ref[bi, qi, 0]
    hi = lohi_ref[bi, qi, 1]

    # Loop-invariant one-hot scaffolding, hoisted: the q-match mask and
    # the row iota (per-chunk work is then one subtract + compare + mult).
    q_v = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) % qbs
    q_u = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) // SP
    qmask = (q_v == q_u).astype(slab_ref.dtype)
    y_v = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) // qbs

    def chunk_body(c, _):
        copy = pltpu.make_async_copy(
            vol_ref.at[bi, pl.ds(c * chunk_rows, chunk_rows),
                       pl.ds(qi * QB, QB), :],
            slab_ref,
            sem,
        )
        copy.start()
        copy.wait()
        r0 = c * chunk_rows
        for si in range(nsub):
            # [chunk_rows, qbs, lw_pad] -> [chunk_rows*qbs, lw_pad]:
            # leading-dim merge (tile stacking), layout-preserving.
            sub = slab_ref[:, si * qbs:(si + 1) * qbs, :].reshape(rows, lw_pad)
            rr_row = rrl_ref[0, si, :]
            rt = qmask * (y_v + r0 == rr_row[None, :]).astype(slab_ref.dtype)
            sel = jax.lax.dot_general(
                rt, sub, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(bands_ref.dtype)       # [qbs*SP, lw_pad]
            # One-hot rows: each band row is written by exactly one
            # chunk (a plane row lives in one chunk), so += is exact.
            bands_ref[si, :, :] += sel
        return 0

    jax.lax.fori_loop(lo, hi, chunk_body, 0)

    # Column one-hot + block-diagonal extract (flashcorr.py stage 2).
    um = jax.lax.broadcasted_iota(jnp.int32, (cols, cols), 0) // SP
    jm = jax.lax.broadcasted_iota(jnp.int32, (cols, cols), 1) // SP
    blockdiag = (um == jm).astype(out_dtype)
    et = jax.lax.broadcasted_iota(jnp.int32, (cols, SP), 0) % SP
    tt = jax.lax.broadcasted_iota(jnp.int32, (cols, SP), 1)
    extract = (et == tt).astype(out_dtype)               # [qbs*SP, SP]
    lanew = jax.lax.broadcasted_iota(jnp.int32, (lw_pad, cols), 0)
    for si in range(nsub):
        cc_row = ccl_ref[0, si, :]
        ct = (lanew == cc_row[None, :]).astype(out_dtype)  # [lw_pad, cols]
        bands = bands_ref[si, :, :]                        # [cols, lw_pad]
        pf = jax.lax.dot_general(
            bands, ct, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_dtype)                                # [(q,s), (q2,t)]
        patch = jax.lax.dot_general(
            pf * blockdiag, extract, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [qbs*SP, SP]
        out_ref[0, si * cols:(si + 1) * cols, :] = patch.astype(out_ref.dtype)


def _lane_pack(idx: jnp.ndarray, nqb: int, qbs: int) -> jnp.ndarray:
    """[B, NqPad, side] int32 -> [B*nqb, QB//qbs, qbs*SP] with -1 in dead
    lanes: per-(batch, query-block) leading dim so the kernel reads each
    sub-block's lane vector with a fully static index (Mosaic rejects
    dynamic sublane loads inside the chunk loop)."""
    b, nq, side = idx.shape
    pad = jnp.full((b, nq, SP - side), -1, jnp.int32)
    return jnp.concatenate([idx, pad], axis=2).reshape(
        b * nqb, QB // qbs, qbs * SP
    )


def compute_band_ranges(
    rr: jnp.ndarray, nqb: int, nchunks: int, chunk_rows: int = CHUNK_ROWS
) -> jnp.ndarray:
    """Per-query-block chunk range [lo, hi) of the rows in `rr`.

    rr: [B, NqPad, side] CLAMPED row indices, pad queries edge-replicated
    (so they never widen a range).  Returns [B, nqb, 2] int32.
    """
    b = rr.shape[0]
    blk = rr.reshape(b, nqb, QB * rr.shape[2])
    lo = jnp.min(blk, axis=2) // chunk_rows
    hi = jnp.max(blk, axis=2) // chunk_rows + 1
    hi = jnp.minimum(hi, nchunks)
    return jnp.stack([lo, hi], axis=2).astype(jnp.int32)


def pad_plane_dims(lh: int, lw: int) -> Tuple[int, int]:
    """(lh8, lw_pad): rows to a CHUNK_ROWS multiple (whole DMA chunks),
    lanes to a 128 multiple."""
    return _round_up(lh, CHUNK_ROWS), _round_up(lw, LANE)


@functools.partial(
    jax.jit,
    static_argnames=("lh", "lw", "side", "chunk_rows", "qbs", "interpret"),
)
def band_patch_level(
    vol: jnp.ndarray,
    rr: jnp.ndarray,
    cc: jnp.ndarray,
    *,
    lh: int,
    lw: int,
    side: int,
    chunk_rows: int = CHUNK_ROWS,
    qbs: int = QBS,
    interpret: bool = False,
) -> jnp.ndarray:
    """Patch extraction for one pyramid level from a band-layout volume.

    vol: [B, lh8, NQ_pad, lw_pad] (BandCorrPyramid layout; zero padding).
    rr:  [B, Nq, side] int32 patch-row indices, clamped to [0, lh).
    cc:  [B, Nq, side] int32 patch-col indices, clamped to [0, lw).

    Returns patch [B, Nq, side, side] in vol.dtype — exact volume
    entries (see module docstring).
    """
    assert side <= SP, f"side {side} exceeds kernel lane group {SP}"
    assert QB % qbs == 0 and lh % 1 == 0
    b, nq, _ = rr.shape
    lh8, nq_pad, lw_pad = vol.shape[1], vol.shape[2], vol.shape[3]
    assert (lh8, lw_pad) == pad_plane_dims(lh, lw), (
        f"vol plane {(lh8, lw_pad)} vs expected {pad_plane_dims(lh, lw)}"
    )
    assert lh8 % chunk_rows == 0, (lh8, chunk_rows)
    assert nq_pad % QB == 0 and nq_pad >= nq
    nqb = nq_pad // QB
    nchunks = lh8 // chunk_rows

    if nq_pad != nq:
        # Edge-replicate so pad queries never widen a block's row range.
        rr = jnp.concatenate(
            [rr, jnp.broadcast_to(rr[:, -1:], (b, nq_pad - nq, side))], axis=1
        )
        cc = jnp.concatenate(
            [cc, jnp.broadcast_to(cc[:, -1:], (b, nq_pad - nq, side))], axis=1
        )

    lohi = compute_band_ranges(rr, nqb, nchunks, chunk_rows)
    rrl = _lane_pack(rr, nqb, qbs)
    ccl = _lane_pack(cc, nqb, qbs)
    dt = vol.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nqb),
        in_specs=[
            pl.BlockSpec(
                (1, QB // qbs, qbs * SP),
                lambda bi, qi, lohi: (bi * nqb + qi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, QB // qbs, qbs * SP),
                lambda bi, qi, lohi: (bi * nqb + qi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, QB * SP, SP), lambda bi, qi, lohi: (bi, qi, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((chunk_rows, QB, lw_pad), dt),
            pltpu.VMEM((QB // qbs, qbs * SP, lw_pad), dt),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _band_kernel, lw_pad=lw_pad, chunk_rows=chunk_rows, qbs=qbs,
            out_dtype=dt,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nq_pad * SP, SP), dt),
        interpret=interpret,
    )(lohi, rrl, ccl, vol)

    return out.reshape(b, nq_pad, SP, SP)[:, :nq, :side, :side]
