"""Pallas TPU kernel for the correlation-pyramid radius lookup.

Why: XLA's TPU gather moves ~75M elements/s (~12.5 cycles/element,
measured — see tpuflow/kernels/__init__.py), and the lookup gathers
N*(2r+2)^2 scalars per level per direction per iteration, making it ~99%
of MOFNet's runtime.  This kernel replaces the scattered scalar gather
with ONE contiguous band DMA per (query, level): each query's patch rows
live in a `band x lw` contiguous span of its own volume row, so the DMA
engine streams it HBM->VMEM while other copies are in flight.  In-VMEM
patch extraction is `side` small dynamic slices plus a side x side
one-hot column remap; the bilinear combine is static vector math.

Semantics: identical to CorrPyramid.lookup (patch-take formulation,
edge-replicate border clamps) — enforced by interpret-mode equality tests.

Layout contract: volume levels are the flat [N, lh*lw] arrays produced by
build_corr_pyramid.

STATUS (round 1): numerics verified in interpret mode; the compiled
kernel is blocked on a Mosaic constraint chain, each hit and fixed in
turn — dynamic lane-offset vector loads (replaced by one-hot selects),
register reshapes (removed), offset-mismatched concats (replaced by
masked accumulation) — until the remaining blocker: the HBM DMA source
slice `pl.ds(row0*lw, band*lw)` must start lane-tile-aligned, and plane
rows are lw=160 wide (not a 128 multiple).  Fix for round 2: store
pyramid levels in a grouped layout [N, lh/g, lw*g] with lw*g a 128
multiple (level 0: g=4 -> [N, 40, 640], zero padding), DMA whole groups
by single middle-dim index, and fold the group phase into the one-hot
row select.  Costs +~30% HBM for deep levels; the per-query DMA replaces
the ~103 ms/level XLA gather with ~3 aligned 1.25 KB copies per query.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pack_meta(py, px, lh, lw, band, side):
    """Per-query int32 metadata row:
    [band_row0, 0, row_rel x side, col_abs x side]
    where band_row0 = clip(py, 0, lh-band),
    row_rel = clip(py+k, 0, lh-1) - band_row0 (in [0, band-1]),
    col_abs = clip(px+k, 0, lw-1)             (edge-replicate clamp)."""
    jj = jnp.arange(side, dtype=jnp.int32)
    row0 = jnp.clip(py, 0, lh - band)
    row_rel = jnp.clip(py[:, None] + jj[None, :], 0, lh - 1) - row0[:, None]
    col_abs = jnp.clip(px[:, None] + jj[None, :], 0, lw - 1)
    return jnp.concatenate(
        [row0[:, None], row0[:, None] * 0, row_rel, col_abs], axis=1
    ).astype(jnp.int32)


def lookup_level_pallas(
    volume: jnp.ndarray,   # [N, lh*lw]
    lh: int,
    lw: int,
    py: jnp.ndarray,       # [N] int32 patch-row origins (unclamped)
    px: jnp.ndarray,       # [N] int32 patch-col origins (unclamped)
    wx: jnp.ndarray,       # [N] f32 shared x fraction
    wy: jnp.ndarray,       # [N] f32 shared y fraction
    radius: int,
    qblk: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """One pyramid level's lookup for all N queries -> [N, (2r+1)^2] f32."""
    n = volume.shape[0]
    side = 2 * radius + 2
    band = min(side, lh)
    p_out = (2 * radius + 1) ** 2
    assert n % qblk == 0, (n, qblk)

    meta = _pack_meta(py, px, lh, lw, band, side)  # [N, 2 + 2*side]
    frac = jnp.stack([wx, wy], axis=1).astype(jnp.float32)
    mwidth = meta.shape[1]

    def kernel(meta_ref, frac_ref, volume_ref, out_ref, band_scratch, sems):
        i = pl.program_id(0)

        def make_dma(q):
            row0 = meta_ref[q, 0]
            return pltpu.make_async_copy(
                volume_ref.at[i * qblk + q, pl.ds(row0 * lw, band * lw)],
                band_scratch.at[q],
                sems.at[q],
            )

        for q in range(qblk):
            make_dma(q).start()

        for q in range(qblk):
            make_dma(q).wait()

            wxq = frac_ref[q, 0]
            wyq = frac_ref[q, 1]

            # No dynamic vector indexing (Mosaic cannot bound it), no
            # register reshape, no offset-mismatched concat: select the
            # patch rows by accumulating each STATIC band row masked with
            # its one-hot row weight (pure VPU broadcast multiply-add).
            row_rel = jnp.stack([meta_ref[q, 2 + ky] for ky in range(side)])
            rows_sel = jnp.zeros((side, lw), jnp.float32)
            for k in range(band):
                band_k = band_scratch[q : q + 1, k * lw : (k + 1) * lw].astype(
                    jnp.float32
                )  # [1, lw]
                sel_k = (row_rel == k).astype(jnp.float32)[:, None]  # [side, 1]
                rows_sel = rows_sel + sel_k * band_k

            col_abs = jnp.stack([meta_ref[q, 2 + side + kx] for kx in range(side)])
            lw_iota = jax.lax.broadcasted_iota(jnp.int32, (side, lw), 1)
            col_onehot = (col_abs[:, None] == lw_iota).astype(jnp.float32)
            # patch[ky, s] = rows_sel[ky, col_abs[s]]
            patch = jax.lax.dot_general(
                rows_sel, col_onehot,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [side(rows), side(cols)]

            v00 = patch[:-1, :-1]
            v01 = patch[:-1, 1:]
            v10 = patch[1:, :-1]
            v11 = patch[1:, 1:]
            sampled = (
                v00 * (1 - wxq) * (1 - wyq)
                + v01 * wxq * (1 - wyq)
                + v10 * (1 - wxq) * wyq
                + v11 * wxq * wyq
            )  # [side-1, side-1]
            # Row-wise stores: Mosaic cannot reshape [s,s] -> [1, s*s].
            w_out = side - 1
            for ky in range(w_out):
                out_ref[q, ky * w_out : (ky + 1) * w_out] = sampled[ky, :]

    grid = (n // qblk,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qblk, mwidth), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((qblk, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((qblk, p_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, p_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((qblk, band * lw), volume.dtype),
            pltpu.SemaphoreType.DMA((qblk,)),
        ],
        interpret=interpret,
    )(meta, frac, volume)


def pyramid_lookup_pallas(
    pyramid: List[jnp.ndarray],
    h2: int,
    w2: int,
    flow: jnp.ndarray,     # [B, H, W, 2]
    radius: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full pyramid lookup -> [B, H, W, L*(2r+1)^2], matching
    CorrPyramid.lookup numerics."""
    from ..core.corr import pyramid_level_dims

    b, h, w, _ = flow.shape
    n = b * h * w
    r = radius

    ys, xs = jnp.mgrid[0:h, 0:w]
    base_x = (xs.astype(jnp.float32)[None] + flow[..., 0]).reshape(n)
    base_y = (ys.astype(jnp.float32)[None] + flow[..., 1]).reshape(n)

    out = []
    for lvl, volume in enumerate(pyramid):
        lh, lw = pyramid_level_dims(h2, w2, lvl)
        cx = base_x / (2.0**lvl)
        cy = base_y / (2.0**lvl)
        fx0 = jnp.floor(cx)
        fy0 = jnp.floor(cy)
        sampled = lookup_level_pallas(
            volume,
            lh,
            lw,
            fy0.astype(jnp.int32) - r,
            fx0.astype(jnp.int32) - r,
            cx - fx0,
            cy - fy0,
            radius,
            interpret=interpret,
        )
        # Kernel emits y-major window order; the product lookups emit the
        # upstream x-major order (CorrPyramid.lookup docstring).
        s = 2 * r + 1
        sampled = sampled.reshape(n, s, s).swapaxes(1, 2)
        out.append(sampled.reshape(b, h, w, -1))
    return jnp.concatenate(out, axis=-1)
