"""Fused dense-pyramid radius lookup (Pallas): patch extraction from the
MATERIALIZED grouped cost volumes entirely in VMEM.

Same job as DenseCorrPyramid.lookup's XLA formulation (core/corr.py) —
stream each level's grouped volume [N, nh, gw] once per refinement
iteration and extract every query's (2r+2)^2 patch with one-hot MXU
selects (reference semantics: the VideoFlow radius lookup,
/root/reference/processing/videoflow_core.py:91-94) — with the XLA
path's two measured overheads removed (v5e, benchmarks/micro_denselevels
.py: per-call L0 9.76 / L1 4.85 / L2 3.29 / L3 2.72 ms vs per-level HBM
rooflines 5.5 / 1.8 / 0.73 / 0.57 ms):

1. No bands/column-mask HBM round trips.  XLA materializes the [N,
   side, gw] band intermediate and the [N, side, gw] column one-hot
   between its two selection einsums (~2.5 GB of extra traffic per L0
   call); here the whole select chain runs on the VMEM-resident block,
   and only the [QB*SP, SP] patches leave the kernel.

2. Deep levels ride the same stream.  The XLA path's deep levels are
   4.5-5x off their rooflines on fixed per-query select costs; fusing
   the select into the volume stream makes each level cost ~its own
   bytes.

The extraction machinery is flashcorr2's proven select/epilogue
formulation (one-hot row-group dot -> phase mask -> column dot ->
block-diag extract; all Mosaic constraints inherited from there: selects
as 2D one-hot matmuls over query sub-blocks, index vectors lane-packed,
K=1 outer-product matmul to transpose lane vectors across sublanes)
MINUS the on-the-fly corr matmul and the chunk-fetch grid dimension:
the volume rows arrive materialized, so there is nothing to recompute
and nothing to gate.  Unlike FlashCorr2's smooth-flow chunk gating,
cost here is FLOW-INDEPENDENT — the kernel wins on chaotic flows too
(the random-init driver bench regime, docs/ROUND3_NOTES.md §7).

Numerics: patch entries are EXACT volume values (every one-hot product
is 1.0 * v with a single nonzero term per sum), identical to the XLA
path; tests assert bitwise equality in interpret mode.

Blocking: QB queries per grid block (VMEM = 2 x QB*nh*gw volume bytes
double-buffered; L0 at the 1280-tile: 2 x 11.8 MB at QB=256), QBS
queries per select sub-block (flashcorr2's measured-best 8).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flashcorr2 import _lane_pack, _round_up, _LIDX, QB, QBS, SP

VMEM_MB = int(os.environ.get("TPUFLOW_DL_VMEM", "48"))


def _lane_pack_f32(vals: jnp.ndarray, nqb: int) -> jnp.ndarray:
    """[B, NqPad, side] f32 -> [B, nqb*8, QB*SP//8] (same 8-sublane fold
    as flashcorr2._lane_pack, zero in dead lanes)."""
    b, nq, side = vals.shape
    pad = jnp.zeros((b, nq, SP - side), jnp.float32)
    return jnp.concatenate([vals.astype(jnp.float32), pad], axis=2).reshape(
        b, nqb * 8, _LIDX
    )


def _kernel(hk_ref, pk_ref, cc_ref, vol_ref, out_ref, *, nh: int, gw: int,
            lw: int, out_dtype):
    nsub = QB // QBS
    m = QBS * SP

    # Constant selection scaffolding (shared by every sub-block).
    um = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0) // SP
    jm = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1) // SP
    blockdiag = (um == jm).astype(out_dtype)
    et = jax.lax.broadcasted_iota(jnp.int32, (m, SP), 0) % SP
    tt = jax.lax.broadcasted_iota(jnp.int32, (m, SP), 1)
    extract = (et == tt).astype(out_dtype)                    # [m, SP]
    lane_phase = (
        jax.lax.broadcasted_iota(jnp.int32, (m, gw), 1) // lw
    ).astype(jnp.float32)
    ones_gw = jnp.ones((1, gw), jnp.float32)
    lane_col = jax.lax.broadcasted_iota(jnp.int32, (gw, m), 0) % lw
    # Row-select one-hot geometry: rt[k, mm] selects volume row
    # (k % nh) of query (k // nh) into patch-row lane mm when the
    # sub-block query indices agree (k // nh == mm // SP) and the
    # packed row index matches (k % nh == hk[mm]).
    k_q = jax.lax.broadcasted_iota(jnp.int32, (QBS * nh, m), 0) // nh
    k_r = jax.lax.broadcasted_iota(jnp.int32, (QBS * nh, m), 0) % nh
    m_q = jax.lax.broadcasted_iota(jnp.int32, (QBS * nh, m), 1) // SP

    for si in range(nsub):
        vol_sub = vol_ref[0, si * QBS : (si + 1) * QBS, :, :]  # [QBS, nh, gw]
        vol_rs = vol_sub.reshape(QBS * nh, gw)
        hr, hc = divmod(si * m, _LIDX)  # static fold coords
        hk_row = hk_ref[0, hr, hc : hc + m]
        rt = ((k_q == m_q) & (k_r == hk_row[None, :])).astype(out_dtype)
        bands = jax.lax.dot_general(
            rt, vol_rs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_dtype)                                    # [m, gw]

        # Phase mask (lane = phase*lw + column): transpose the packed
        # phase lane-vector across sublanes with a K=1 outer product
        # (Mosaic has no lane->sublane broadcast).
        pk_row = pk_ref[0, hr, hc : hc + m].astype(jnp.float32)
        pk_mat = jax.lax.dot_general(
            pk_row[None, :], ones_gw, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # [m, gw]
        bands = bands * (lane_phase == pk_mat).astype(out_dtype)

        cc_row = cc_ref[0, hr, hc : hc + m]
        ct = (lane_col == cc_row[None, :]).astype(out_dtype)   # [gw, m]
        pf = jax.lax.dot_general(
            bands, ct, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_dtype)                                    # [m, m]
        patch = jax.lax.dot_general(
            pf * blockdiag, extract, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # [m, SP]
        out_ref[0, si * m : (si + 1) * m, :] = patch.astype(out_ref.dtype)


def _pad_queries_to_subblock(vol4, idx_arrays, qbs=QBS):
    """Zero-pad the query dim of [B, Nq, nh, gw] (and replicate the
    matching index/weight arrays) to a multiple of the sub-block size.

    The kernels' per-sub-block one-hot dots contract over ALL QBS
    queries' volume rows at once: a sub-block straddling the valid-query
    boundary would mix out-of-bounds block reads — unspecified values,
    NaN in interpret mode — into valid queries' f32 accumulations as
    0 * garbage (0 * NaN = NaN).  Padding to the QBS quantum keeps every
    partially-valid sub-block fully in-bounds; sub-blocks past it
    consist entirely of discarded pad queries.  Product grids are
    8-multiples already, so this is a no-op on the bench path."""
    nq = vol4.shape[1]
    rem = nq % qbs
    if rem == 0:
        return (vol4, *idx_arrays)
    pad = qbs - rem
    vol4 = jnp.pad(vol4, ((0, 0), (0, pad), (0, 0), (0, 0)))
    padded = []
    for a in idx_arrays:
        tail = jnp.broadcast_to(a[:, -1:], (a.shape[0], pad) + a.shape[2:])
        padded.append(jnp.concatenate([a, tail], axis=1))
    return (vol4, *padded)


@functools.partial(
    jax.jit, static_argnames=("lh", "lw", "g", "side", "interpret")
)
def dense_patch_level(
    volume: jnp.ndarray,
    rr: jnp.ndarray,
    cc: jnp.ndarray,
    *,
    lh: int,
    lw: int,
    g: int,
    side: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Patch extraction for one pyramid level from its grouped volume.

    volume: [B*Nq, nh, gw] grouped level (DenseCorrPyramid storage:
            plane row r lives at [., r // g, (r % g)*lw + col], rows
            aligned to 8 sublanes / lanes to 128 with inert zeros).
    rr:     [B, Nq, side] int32 clamped plane-row indices in [0, lh).
    cc:     [B, Nq, side] int32 clamped column indices in [0, lw).

    Returns patch [B, Nq, side, side] in the volume dtype — exact
    volume entries (one-hot selects), matching DenseCorrPyramid.lookup's
    XLA formulation bitwise.
    """
    assert side <= SP, f"side {side} exceeds kernel lane group {SP}"
    b, nq, sde = rr.shape
    nh, gw = volume.shape[1], volume.shape[2]
    assert volume.shape[0] == b * nq, (volume.shape, b, nq)

    nq_out = nq
    vol4 = volume.reshape(b, nq, nh, gw)
    vol4, rr, cc = _pad_queries_to_subblock(vol4, (rr, cc))
    nq = vol4.shape[1]

    nq_pad = _round_up(nq, QB)
    nqb = nq_pad // QB
    if nq_pad != nq:
        # Replicated index pads select real rows; their outputs are
        # sliced off.  The volume itself is NOT padded beyond the QBS
        # quantum (_pad_queries_to_subblock) — tail blocks past it read
        # out of bounds, but every sub-block they poison consists
        # entirely of discarded pad queries.
        rr = jnp.concatenate(
            [rr, jnp.broadcast_to(rr[:, -1:], (b, nq_pad - nq, side))], axis=1
        )
        cc = jnp.concatenate(
            [cc, jnp.broadcast_to(cc[:, -1:], (b, nq_pad - nq, side))], axis=1
        )

    hkl = _lane_pack(rr // g, nqb)
    pkl = _lane_pack(rr % g, nqb)
    ccl = _lane_pack(cc, nqb)
    dt = volume.dtype

    grid_spec = pl.GridSpec(
        grid=(b, nqb),
        in_specs=[
            pl.BlockSpec((1, 8, _LIDX), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, _LIDX), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, _LIDX), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QB, nh, gw), lambda bi, qi: (bi, qi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, QB * SP, SP), lambda bi, qi: (bi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, nh=nh, gw=gw, lw=lw, out_dtype=dt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nq_pad * SP, SP), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_MB * 1024 * 1024,
        ),
        interpret=interpret,
    )(hkl, pkl, ccl, vol4)

    return out.reshape(b, nq_pad, SP, SP)[:, :nq_out, :side, :side]


def _pick_qbs(nh: int) -> int:
    """Queries per select sub-block.  MEASURED: 8 for every level.

    The round-5 trace showed deep pyramid levels (aligned nh ladder
    136/40/16/8 at the bench grid) running ~10-20x off their stream
    floors, which looked like per-sub-block op-ISSUE latency — so this
    hook widened the sub-block (qbs 16/32 at small nh) to cut the op
    count 2-4x.  On-device result: ref_j 1313 vs 1202 ms/call — WORSE,
    because every select dot computes a block-diagonal product whose
    FLOPs scale with qbs^2 * nh (cross-query terms are zeros that the
    MXU still multiplies): at qbs=32 the garbage FLOPs (~16x) exceed
    the issue latency saved.  The deep-level overhead is formulation-
    fundamental: every extraction formulation tried (XLA tiny matmuls,
    Pallas select, band DMA, wide sub-blocks) pays ~1x of its operand
    in one-hot work, and at deep levels the per-query patch count
    doesn't shrink with the volume (docs/ROUND5_NOTES.md)."""
    return QBS


def _fused_kernel(hk_ref, pk_ref, cc_ref, wx_ref, wy_ref, vol_ref, out_ref,
                  pt_ref, *, nh: int, gw: int, lw: int, side: int,
                  out_dtype, qbs: int = QBS):
    """Patch extract + border zeros + bilinear + x-major repack, fused.

    Patch values are EXACT volume entries (one-hot selects); border
    zeroing arrives via index SENTINELS (out-of-range rows/cols select
    nothing -> exact 0s); every data-movement matmul (shifts, extract,
    repack) is one-hot with a single nonzero term per f32 accumulation.
    The bilinear runs in F32 on those exact values (two-stage lerp) —
    strictly MORE accurate than the XLA epilogue's storage-dtype
    bilinear (and closer to the reference's f32 math for bf16 volumes),
    but not bit-identical to it: XLA's fma fusion of the elementwise
    epilogue is not reproducible across formulations anyway (f32
    volumes agree to ~1 ulp; bf16 volumes differ by the XLA path's own
    bf16 rounding — tests/test_denselookup.py tolerances).

    The patch is extracted TRANSPOSED ((q, col j) rows x row-i lanes) so
    the upstream x-major channel order falls out of the repack with no
    downstream transpose: out lane c = j*(side-1) + i for j, i < side-1,
    lanes >= (side-1)^2 are zero.

    Structure matters for speed: the per-sub-block loop runs ONLY the
    4 extraction matmuls of the proven patch kernel (the volume stream
    stays the cost), accumulating transposed patches into the pt_ref
    VMEM scratch.  The whole epilogue then runs ONCE per grid block on
    the [QB*SP, SP] scratch: bilinear shifts as sublane/lane rolls
    (valid rows j < ns never cross a query boundary, so no masking),
    and the x-major repack as ns [QB*SP, SP] x [SP, 128] matmuls + one
    reshape-sum collapse.  A first version ran the epilogue per
    sub-block with tiny one-hot matmuls and was ~5x slower than the
    patch kernel — ~21 extra MXU ops x 8k sub-blocks per call is
    issue-latency, not FLOPs (round-4 notes §7).
    """
    nsub = QB // qbs
    m = qbs * SP
    mb = QB * SP  # full block rows
    ns = side - 1  # sampled patch side (2r+1)

    um = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    jm = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    blockdiag = ((um // SP) == (jm // SP)).astype(out_dtype)
    et = jax.lax.broadcasted_iota(jnp.int32, (m, SP), 0) % SP
    tt = jax.lax.broadcasted_iota(jnp.int32, (m, SP), 1)
    extract = (et == tt).astype(out_dtype)                    # [m, SP]
    lane_phase = (
        jax.lax.broadcasted_iota(jnp.int32, (m, gw), 1) // lw
    ).astype(jnp.float32)
    ones_gw = jnp.ones((1, gw), jnp.float32)
    ones_sp = jnp.ones((1, SP), jnp.float32)
    lane_col = jax.lax.broadcasted_iota(jnp.int32, (gw, m), 0) % lw
    k_q = jax.lax.broadcasted_iota(jnp.int32, (qbs * nh, m), 0) // nh
    k_r = jax.lax.broadcasted_iota(jnp.int32, (qbs * nh, m), 0) % nh
    m_q = jax.lax.broadcasted_iota(jnp.int32, (qbs * nh, m), 1) // SP

    # --- per-sub-block: extraction only (the patch kernel's 4 dots) ---
    for si in range(nsub):
        vol_sub = vol_ref[0, si * qbs : (si + 1) * qbs, :, :]
        vol_rs = vol_sub.reshape(qbs * nh, gw)
        hr, hc = divmod(si * m, _LIDX)
        hk_row = hk_ref[0, hr, hc : hc + m]
        rt = ((k_q == m_q) & (k_r == hk_row[None, :])).astype(out_dtype)
        bands = jax.lax.dot_general(
            rt, vol_rs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_dtype)                                    # [m, gw]

        pk_row = pk_ref[0, hr, hc : hc + m].astype(jnp.float32)
        pk_mat = jax.lax.dot_general(
            pk_row[None, :], ones_gw, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        bands = bands * (lane_phase == pk_mat).astype(out_dtype)

        cc_row = cc_ref[0, hr, hc : hc + m]
        ct = (lane_col == cc_row[None, :]).astype(out_dtype)   # [gw, m]
        pf = jax.lax.dot_general(
            bands, ct, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_dtype)                                    # [m, m]
        # TRANSPOSED extract: rows (q, col j), lanes = patch row i.
        # F32 from here on: the values are exact volume entries (f32
        # holds them exactly), and the block-level f32 bilinear beats
        # the XLA epilogue's storage-dtype rounding.
        pt_ref[si * m : (si + 1) * m, :] = jax.lax.dot_general(
            pf * blockdiag, extract, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # [m, SP] f32

    # --- once per block: bilinear + x-major repack on the scratch ---
    pt = pt_ref[:, :]                                          # [mb, SP]
    # Per-query fractions broadcast across the block: one K=1 outer
    # product per packed sublane row (8 per weight), stacked in stream
    # order (row hr covers positions hr*_LIDX .. (hr+1)*_LIDX).
    wx = jnp.concatenate([
        jax.lax.dot_general(
            wx_ref[0, hr, :][None, :], ones_sp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for hr in range(mb // _LIDX)
    ], axis=0)                                                 # [mb, SP]
    wy = jnp.concatenate([
        jax.lax.dot_general(
            wy_ref[0, hr, :][None, :], ones_sp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for hr in range(mb // _LIDX)
    ], axis=0)

    # Shifts as rolls (exact moves): v01 = col+1 -> next row within the
    # query's SP group (valid rows j < ns stay inside it), v10 = row+1
    # -> next lane.  Wraparound rows/lanes are never read by the repack
    # (j, i < ns <= SP-1).  Two-stage lerp: the lane roll is a
    # permutation, so lerp-then-roll == roll-then-lerp EXACTLY and
    # (v10, v11) never materialize — 2 rolls + 2 lerps total.
    t = pt + wx * (jnp.roll(pt, -1, axis=0) - pt)              # col interp
    sampled = t + wy * (jnp.roll(t, -1, axis=1) - t)           # row interp

    # Dense x-major repack: out[q, j*ns + i] = sampled[(q, j), i].
    # Collapse FIRST (slice query-row j from the [QB, SP, SP] view),
    # THEN spread lanes with a tiny one-hot matmul — accumulating on
    # [QB, 128] (128 KB).  A prior version accumulated on [mb, 128]
    # (2 MB x 9 read+write = ~36 MB VMEM traffic per block) and cost a
    # flat ~2.5 ms/iter at EVERY level (round-4 notes §7).
    p_i = jax.lax.broadcasted_iota(jnp.int32, (SP, 128), 0)
    p_c = jax.lax.broadcasted_iota(jnp.int32, (SP, 128), 1)
    sampled3 = sampled.reshape(QB, SP, SP)
    acc = jnp.zeros((QB, 128), jnp.float32)
    for j in range(ns):
        psel = ((p_c == j * ns + p_i) & (p_i < ns)).astype(jnp.float32)
        acc = acc + jax.lax.dot_general(
            sampled3[:, j, :], psel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0, :, :] = acc


@functools.partial(
    jax.jit, static_argnames=("lh", "lw", "g", "side", "interpret")
)
def dense_feature_level(
    volume: jnp.ndarray,
    rr: jnp.ndarray,
    cc: jnp.ndarray,
    wx: jnp.ndarray,
    wy: jnp.ndarray,
    *,
    lh: int,
    lw: int,
    g: int,
    side: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused radius-lookup FEATURES for one pyramid level.

    volume: [B*Nq, nh, gw] grouped level (DenseCorrPyramid storage).
    rr:     [B, Nq, side] int32 patch-row indices with out-of-range rows
            as the SENTINEL nh*g (selects nothing -> exact border zero).
    cc:     [B, Nq, side] int32 col indices, sentinel lw for out-of-range.
    wx, wy: [B, Nq] f32 per-query bilinear fractions.

    Returns [B, Nq, 128] F32: lanes [0, (side-1)^2) hold the
    bilinear-sampled patch in upstream x-major channel order
    (c = j*(side-1) + i), remaining lanes zero.  Patch values are exact
    volume entries; the bilinear runs in f32 (more accurate than the
    XLA formulation's storage-dtype epilogue — see _fused_kernel;
    tolerance-tested in tests/test_denselookup.py).
    """
    assert side <= SP, f"side {side} exceeds kernel lane group {SP}"
    assert (side - 1) ** 2 <= 128
    b, nq, sde = rr.shape
    nh, gw = volume.shape[1], volume.shape[2]
    assert volume.shape[0] == b * nq, (volume.shape, b, nq)

    nq_out = nq
    qbs = _pick_qbs(nh)
    vol4 = volume.reshape(b, nq, nh, gw)
    vol4, rr, cc, wx, wy = _pad_queries_to_subblock(
        vol4, (rr, cc, wx, wy), qbs
    )
    nq = vol4.shape[1]

    nq_pad = _round_up(nq, QB)
    nqb = nq_pad // QB
    if nq_pad != nq:
        rr = jnp.concatenate(
            [rr, jnp.broadcast_to(rr[:, -1:], (b, nq_pad - nq, side))], axis=1
        )
        cc = jnp.concatenate(
            [cc, jnp.broadcast_to(cc[:, -1:], (b, nq_pad - nq, side))], axis=1
        )
        wx = jnp.concatenate(
            [wx, jnp.broadcast_to(wx[:, -1:], (b, nq_pad - nq))], axis=1
        )
        wy = jnp.concatenate(
            [wy, jnp.broadcast_to(wy[:, -1:], (b, nq_pad - nq))], axis=1
        )

    hkl = _lane_pack(rr // g, nqb)
    pkl = _lane_pack(rr % g, nqb)
    ccl = _lane_pack(cc, nqb)
    wxl = _lane_pack_f32(
        jnp.broadcast_to(wx[:, :, None], (b, nq_pad, side)), nqb
    )
    wyl = _lane_pack_f32(
        jnp.broadcast_to(wy[:, :, None], (b, nq_pad, side)), nqb
    )
    dt = volume.dtype

    idx_spec = pl.BlockSpec((1, 8, _LIDX), lambda bi, qi: (bi, qi, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(b, nqb),
        in_specs=[
            idx_spec, idx_spec, idx_spec, idx_spec, idx_spec,
            pl.BlockSpec((1, QB, nh, gw), lambda bi, qi: (bi, qi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, QB, 128), lambda bi, qi: (bi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((QB * SP, SP), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _fused_kernel, nh=nh, gw=gw, lw=lw, side=side, out_dtype=dt,
            qbs=qbs,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nq_pad, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_MB * 1024 * 1024,
        ),
        interpret=interpret,
    )(hkl, pkl, ccl, wxl, wyl, vol4)

    return out[:, :nq_out, :]
