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

    nq_pad = _round_up(nq, QB)
    nqb = nq_pad // QB
    if nq_pad != nq:
        # Replicated index pads select real rows; their outputs are
        # sliced off.  The volume itself is NOT padded — the tail block
        # reads out of bounds, which Pallas handles by edge-padding the
        # block; garbage only reaches pad queries' discarded patches.
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
    vol4 = volume.reshape(b, nq, nh, gw)

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

    return out.reshape(b, nq_pad, SP, SP)[:, :nq, :side, :side]
