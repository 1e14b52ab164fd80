"""FlashCorr v2: phase-packed fused correlation + radius lookup (Pallas).

Same job as kernels/flashcorr.py — recompute each query's correlation
row on the MXU from VMEM-resident target features and extract the
(2r+2)^2 patch in VMEM (reference semantics: the VideoFlow radius
lookup, videoflow_core.py:91-94) — with the v1 formulation's two FLOP
inflations removed (both measured on v5e, benchmarks/micro_corrvariants
.py: v1 runs at ~74% MXU utilization but carries 1.6x lane-padding and
2x select overhead; deep pyramid levels padded 1.6-6.4x):

1. ZERO lane padding at any level.  v1 stored one plane row per
   128-multiple lane group (lw=160 -> 256 lanes, 1.6x waste; level 3's
   lw=20 -> 128, 6.4x).  v2 packs g = lcm(lw,128)/lw physical rows into
   one gw = g*lw lane group — exactly 640 lanes for every VideoFlow
   level width (160x4, 80x8, 40x16, 20x32) — adopting the phase
   arithmetic of the XLA dense path (core/corr.py DenseCorrPyramid:
   lane = phase*lw + column).  The phase mask needs the per-(query,
   patch-row) phase along SUBLANES, which Mosaic cannot broadcast from
   a lane vector; a one-hot identity matmul transposes the prefetched
   phase lane-vector into a column ([QBS*SP, 1], 65 KFLOP per
   sub-block) and the mask becomes a plain 2D compare.

2. Every pyramid level through the same kernel — deep levels correlate
   against avg-POOLED features, which equals avg-pooling the volume
   EXACTLY (correlation is linear in the target features), up to float
   summation order; no DenseCorrPyramid sidecar, no volume build at
   all (the v1 hybrid spent ~40% of its lookup time in the deep-level
   dense path because dense band intermediates are level-size-
   independent).

Mosaic constraints inherited from v1 (probed, see flashcorr.py):
batched dots lower to per-batch tiny matmuls; dynamic_update_slice
unimplemented; narrow stores/minor-dim reshapes crash — so all selects
are 2D one-hot matmuls over query sub-blocks, index vectors arrive
lane-packed, stores are full-width static slices.  The [QBS, gr*gw] ->
[QBS*gr, gw] reshape splits lanes at a 128-multiple boundary (legal).

Blocking (env-tunable for device sweeps):
  QB    queries per grid block  (VMEM: bands scratch = nsub*QBS*SP*gw)
  QBS   queries per select sub-block (rt contraction = QBS*gr)
  GR    pseudo-rows per chunk   (cm = GR*gw lanes per corr dot)
Defaults fit the 16 MB VMEM budget at gw=640: QB=256, QBS=8, GR=8.
QBS=8 measured 11% faster than 16 at the bench tile (547.8 vs 617.1 ms
per 12-iter 2-dir lookup, v5e): select and epilogue FLOPs scale as
QBS^2 x gw while the kernel sits near the VPU-issue bound, so the
smaller sub-block wins; QBS=4 loses it back to per-op issue overhead
(639.6 ms).  A bf16-mask variant (all compares/masks in bf16 to halve
vreg counts, arithmetic relu(1-|d|) masks to dodge Mosaic's replicated
i1 relayout) measured SLOWER (628 ms) and was reverted.

Chunk gating (v2.1): each query's (2r+2) patch rows are CONSECUTIVE
physical rows, so a query block references a contiguous pseudo-row
range — with smooth flows that is a small subset of L0's chunks, and
an ungated kernel spends corr FLOPs, select ops and f2-chunk DMA on
chunks no query in the block touches.  A scalar-prefetched
[B, nqb, nm] fetch table (clamp(mi, lo, hi) of the block's chunk
range) remaps the f2 BlockSpec index so skipped steps re-reference the
previous block and Mosaic elides the DMA; relevance is simply
fetch[mi] == mi, gating the whole corr+select body with pl.when.
Exactness is preserved: a skipped chunk means no query in the block
selects from it, so its band contribution was all-zero by
construction.  Pad queries are edge-REPLICATED (not zeroed) so they
never widen a block's range.  Worst-case (chaotic flow crossing every
chunk) degrades to the ungated cost.
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

QB = int(os.environ.get("TPUFLOW_F2_QB", "256"))    # queries per grid block
QBS = int(os.environ.get("TPUFLOW_F2_QBS", "8"))    # queries per sub-block
GR = int(os.environ.get("TPUFLOW_F2_GR", "8"))      # pseudo-rows per chunk
# Mosaic scoped-VMEM budget for this kernel (MiB).  The 16 MiB default
# scoped limit is exactly what the default blocking fills; larger
# QB/QBS/GR sweeps need more (v5e has 128 MiB physical VMEM).
VMEM_MB = int(os.environ.get("TPUFLOW_F2_VMEM", "32"))
SP = 16     # patch side padded to a lane-friendly group (side <= 16)
LANE = 128

# nsub = QB // QBS must cover QB exactly, or the trailing queries of
# every block would silently get uninitialized VMEM as their patches.
assert QB % QBS == 0, f"TPUFLOW_F2_QB ({QB}) must be a multiple of QBS ({QBS})"
assert QBS > 0 and GR > 0

# Index vectors are stored 8-sublane-folded ([b, nqb*8, QB*SP//8]) so the
# per-block index tile has legal Mosaic blocking (second-to-last block dim
# divisible by 8) at 16 KB VMEM instead of the whole plane.  Each select
# sub-block's QBS*SP lanes must land inside one folded row:
_LIDX = QB * SP // 8
assert _LIDX % LANE == 0, f"QB ({QB}) must be a multiple of 64"
assert _LIDX % (QBS * SP) == 0, (
    f"TPUFLOW_F2_QB ({QB}) must be a multiple of 8*QBS ({8 * QBS})"
)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def level_pack_dims(lh: int, lw: int) -> Tuple[int, int, int, int]:
    """(g, gw, npr_pad, gr): physical rows per pseudo-row (zero lane
    waste when lw divides a 128 multiple; falls back to lane padding
    otherwise), lanes per pseudo-row, padded pseudo-row count, and the
    chunk size in pseudo-rows.

    gr is EQUALIZED rather than fixed at GR: nchunks = ceil(npr/GR),
    gr = ceil(npr/nchunks) — padding never exceeds one chunk's worth
    spread evenly (L0 at the bench tile: 35 vs 40 pseudo-rows, 2.9% vs
    17.6% wasted corr FLOPs; deep levels with npr < GR pad ZERO rows
    instead of up to 8x)."""
    g = 1
    while (g * lw) % LANE and g * lw <= 8 * LANE:
        g += 1
    if (g * lw) % LANE:  # irregular width: pad lanes instead
        g = 1
    gw = _round_up(g * lw, LANE)
    npr = -(-lh // g)
    nchunks = -(-npr // GR)
    gr = -(-npr // nchunks)
    return g, gw, gr * nchunks, gr


def pack_f2_level(f2l: jnp.ndarray) -> jnp.ndarray:
    """[B, lh, lw, C] (pooled) target features -> [B, npr_pad*gw, C]
    phase-major packed rows (lane = phase*lw + column), zero padding
    (padded positions correlate to exactly 0 and are never selected)."""
    b, lh, lw, c = f2l.shape
    g, gw, npr_pad, _ = level_pack_dims(lh, lw)
    if npr_pad * g != lh:
        f2l = jnp.pad(f2l, ((0, 0), (0, npr_pad * g - lh), (0, 0), (0, 0)))
    x = f2l.reshape(b, npr_pad, g * lw, c)
    if gw != g * lw:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, gw - g * lw), (0, 0)))
    return x.reshape(b, npr_pad * gw, c)


def _kernel(fetch_ref, hk_ref, pk_ref, cc_ref, q_ref, f2_ref, out_ref,
            bands_ref, *, gr: int, gw: int, lw: int, scale: float,
            out_dtype):
    bi = pl.program_id(0)
    qi = pl.program_id(1)
    mi = pl.program_id(2)
    nsub = QB // QBS

    @pl.when(mi == 0)
    def _():
        bands_ref[:] = jnp.zeros_like(bands_ref)

    # Chunk gating: fetch == mi iff some query in this block touches
    # chunk mi (fetch = clamp(mi, lo, hi)); a skipped chunk's band
    # contribution is all-zero by construction, so skipping is exact.
    @pl.when(fetch_ref[bi, qi, mi] == mi)
    def _():
        q = q_ref[0]                       # [QB, C]
        f2c = f2_ref[0]                    # [gr*gw, C]
        corr = jax.lax.dot_general(
            q, f2c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        corr = (corr * scale).astype(out_dtype)   # [QB, gr*gw]

        r0 = mi * gr
        for si in range(nsub):
            corr_sub = corr[si * QBS : (si + 1) * QBS].reshape(QBS * gr, gw)
            hr, hc = divmod(si * QBS * SP, _LIDX)  # static fold coords
            hk_row = hk_ref[0, hr, hc : hc + QBS * SP]
            u_q = jax.lax.broadcasted_iota(
                jnp.int32, (QBS * gr, QBS * SP), 1) // SP
            v_q = jax.lax.broadcasted_iota(
                jnp.int32, (QBS * gr, QBS * SP), 0) // gr
            v_g = jax.lax.broadcasted_iota(
                jnp.int32, (QBS * gr, QBS * SP), 0) % gr
            rt = ((u_q == v_q) & (v_g + r0 == hk_row[None, :])).astype(
                out_dtype)
            sel = jax.lax.dot_general(
                rt, corr_sub, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_dtype)            # [QBS*SP, gw]
            # One-hot rows: accumulation is exact (one nonzero per sum).
            bands_ref[si, :, :] += sel

    @pl.when(mi == pl.num_programs(2) - 1)
    def _():
        m = QBS * SP
        um = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0) // SP
        jm = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1) // SP
        blockdiag = (um == jm).astype(out_dtype)
        et = jax.lax.broadcasted_iota(jnp.int32, (m, SP), 0) % SP
        tt = jax.lax.broadcasted_iota(jnp.int32, (m, SP), 1)
        extract = (et == tt).astype(out_dtype)            # [m, SP]
        lane_phase = (
            jax.lax.broadcasted_iota(jnp.int32, (m, gw), 1) // lw
        ).astype(jnp.float32)
        ones_gw = jnp.ones((1, gw), jnp.float32)
        lane_col = jax.lax.broadcasted_iota(jnp.int32, (gw, m), 0) % lw
        for si in range(nsub):
            sl = slice(si * m, (si + 1) * m)
            hr, hc = divmod(si * m, _LIDX)  # static fold coords
            pk_row = pk_ref[0, hr, hc : hc + m].astype(jnp.float32)  # [m]
            # K=1 outer product transposes the phase lane vector across
            # sublanes ([1,m] x [1,gw] -> [m,gw]); Mosaic has no direct
            # lane->sublane broadcast.
            pk_mat = jax.lax.dot_general(
                pk_row[None, :], ones_gw, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # [m, gw]
            # Phase mask: keep only the lane group holding this patch
            # row's physical row (dense-path phase arithmetic).
            bands = bands_ref[si, :, :] * (lane_phase == pk_mat).astype(
                out_dtype
            )
            cc_row = cc_ref[0, hr, hc : hc + m]
            ct = (lane_col == cc_row[None, :]).astype(out_dtype)  # [gw, m]
            pf = jax.lax.dot_general(
                bands, ct, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_dtype)                            # [m, m]
            patch = jax.lax.dot_general(
                pf * blockdiag, extract, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # [m, SP]
            out_ref[0, sl, :] = patch.astype(out_ref.dtype)


def _lane_pack(idx: jnp.ndarray, nqb: int) -> jnp.ndarray:
    """[B, NqPad, side] int32 -> [B, nqb*8, QB*SP//8] (8-sublane folded,
    linear lane order preserved) with -1 in dead lanes."""
    b, nq, side = idx.shape
    pad = jnp.full((b, nq, SP - side), -1, jnp.int32)
    return jnp.concatenate([idx, pad], axis=2).reshape(b, nqb * 8, _LIDX)


@functools.partial(
    jax.jit,
    static_argnames=("lh", "lw", "side", "interpret"),
)
def flash2_patch_level(
    f1: jnp.ndarray,
    f2packed: jnp.ndarray,
    rr: jnp.ndarray,
    cc: jnp.ndarray,
    *,
    lh: int,
    lw: int,
    side: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Patch extraction for one pyramid level (phase-packed layout).

    f1:       [B, Nq, C] query features (1/sqrt(C) applied inside).
    f2packed: [B, npr_pad*gw, C] packed target features
              (pack_f2_level output).
    rr:       [B, Nq, side] int32 PHYSICAL patch-row indices in [0, lh).
    cc:       [B, Nq, side] int32 patch-col indices in [0, lw).

    Returns patch [B, Nq, side, side] in f1.dtype — exact correlation
    values (one-hot selects, f32 MXU accumulate * 1/sqrt(C), cast to the
    feature dtype), matching DenseCorrPyramid storage numerics at level
    0 and pooled-feature correlation at deeper levels.
    """
    assert side <= SP, f"side {side} exceeds kernel lane group {SP}"
    b, nq, c = f1.shape
    g, gw, npr_pad, gr = level_pack_dims(lh, lw)
    assert f2packed.shape[1] == npr_pad * gw, (
        f"f2packed {f2packed.shape} vs expected rows {npr_pad * gw} — "
        "pack with pack_f2_level"
    )
    nm = npr_pad // gr
    cm = gr * gw

    nq_pad = _round_up(nq, QB)
    nqb = nq_pad // QB
    if nq_pad != nq:
        f1 = jnp.pad(f1, ((0, 0), (0, nq_pad - nq), (0, 0)))
        # Edge-replicate index pads so they never widen a block's chunk
        # range (their one-hot rows select real rows; f1 pad rows are
        # zero so the selected values are zeros and discarded anyway).
        rr = jnp.concatenate(
            [rr, jnp.broadcast_to(rr[:, -1:], (b, nq_pad - nq, side))], axis=1
        )
        cc = jnp.concatenate(
            [cc, jnp.broadcast_to(cc[:, -1:], (b, nq_pad - nq, side))], axis=1
        )

    hk = rr // g
    # Fetch table: clamp(mi, lo, hi) of each block's touched chunk range;
    # fetch[mi] == mi marks a relevant chunk, and repeated indices on
    # skipped steps let the pipeline elide the f2-chunk DMA.
    hkb = hk.reshape(b, nqb, QB * side)
    lo = jnp.min(hkb, axis=2) // gr                       # [b, nqb]
    hi = jnp.max(hkb, axis=2) // gr
    mids = jnp.arange(nm, dtype=jnp.int32)[None, None, :]
    fetch = jnp.clip(mids, lo[:, :, None], hi[:, :, None]).astype(jnp.int32)

    hkl = _lane_pack(hk, nqb)
    pkl = _lane_pack(rr % g, nqb)
    ccl = _lane_pack(cc, nqb)
    dt = f1.dtype
    scale = 1.0 / float(np.sqrt(c))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nqb, nm),
        in_specs=[
            pl.BlockSpec((1, 8, _LIDX), lambda bi, qi, mi, fetch: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, _LIDX), lambda bi, qi, mi, fetch: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, _LIDX), lambda bi, qi, mi, fetch: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QB, c), lambda bi, qi, mi, fetch: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, cm, c),
                lambda bi, qi, mi, fetch: (bi, fetch[bi, qi, mi], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, QB * SP, SP), lambda bi, qi, mi, fetch: (bi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((QB // QBS, QBS * SP, gw), dt),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, gr=gr, gw=gw, lw=lw, scale=scale, out_dtype=dt
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nq_pad * SP, SP), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_MB * 1024 * 1024,
        ),
        interpret=interpret,
    )(fetch, hkl, pkl, ccl, f1, f2packed)

    patch = out.reshape(b, nq_pad, SP, SP)[:, :nq, :side, :side]
    return patch
