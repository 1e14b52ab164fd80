#!/usr/bin/env python3
"""Mosaic primitive shootout for the per-query patch-select step of the
on-the-fly correlation kernel (kernels/flashcorr.py design probe).

The lookup needs, per query q: patch[sy, sx] = corr[q, row(q,sy), col(q,sx)]
from a per-query [CH, CW] local correlation window resident in VMEM.
Candidate lowerings (all numerics-equal):

  batched : jax.lax.dot_general with a batch dim (Mosaic support probe)
  blockdiag: 2D dots over block-diagonal stacked one-hots (QBS sub-blocks)
  masked  : VPU broadcast-mask + lane reduction

Run CPU (interpret, correctness) then TPU (compiled, timing):
  python benchmarks/micro_select.py          # TPU timing
  MODE=cpu python benchmarks/micro_select.py # interpret correctness only
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = os.environ.get("MODE") == "cpu"
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

QB = 64          # queries per grid block
SIDE = 10        # 2r+2 for r=4
CH = 16          # local window rows
CW = 512         # local window lanes (flattened rows*cols of corr window)
NQ = 128 if INTERPRET else 64800  # bench 1280-tile, 3 interior frames


def ref_select(win, rows, cols):
    """win [N, CH, CW], rows [N, SIDE] in [0, CH), cols [N, SIDE] in [0, CW).
    -> patch [N, SIDE, SIDE]."""
    n = win.shape[0]
    bidx = np.arange(n)[:, None, None]
    return win[bidx, rows[:, :, None], cols[:, None, :]]


def kernel_batched(win_ref, rows_ref, cols_ref, out_ref):
    win = win_ref[:]                       # [QB, CH, CW]
    rows = rows_ref[:]                     # [QB, SIDE] int32
    cols = cols_ref[:]
    riota = jax.lax.broadcasted_iota(jnp.int32, (QB, SIDE, CH), 2)
    R = (rows[:, :, None] == riota).astype(win.dtype)          # [QB, SIDE, CH]
    bands = jax.lax.dot_general(
        R, win, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                           # [QB, SIDE, CW]
    ciota = jax.lax.broadcasted_iota(jnp.int32, (QB, SIDE, CW), 2)
    C = (cols[:, :, None] == ciota).astype(win.dtype)           # [QB, SIDE, CW]
    patch = jax.lax.dot_general(
        bands.astype(win.dtype), C, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                           # [QB, SIDE, SIDE]
    out_ref[:] = patch


def kernel_blockdiag(win_ref, rows_ref, cols_ref, out_ref, *, qbs):
    win = win_ref[:]
    rows = rows_ref[:]
    cols = cols_ref[:]
    nsub = QB // qbs
    for s in range(nsub):
        w = win[s * qbs:(s + 1) * qbs]                          # [qbs, CH, CW]
        r = rows[s * qbs:(s + 1) * qbs]
        c = cols[s * qbs:(s + 1) * qbs]
        wf = w.reshape(qbs * CH, CW)
        # Block-diagonal row one-hot [qbs*SIDE, qbs*CH].
        u_q = jax.lax.broadcasted_iota(jnp.int32, (qbs * SIDE, qbs * CH), 0) // SIDE
        v_q = jax.lax.broadcasted_iota(jnp.int32, (qbs * SIDE, qbs * CH), 1) // CH
        v_h = jax.lax.broadcasted_iota(jnp.int32, (qbs * SIDE, qbs * CH), 1) % CH
        rtgt = r.reshape(qbs * SIDE)[:, None]
        R = ((u_q == v_q) & (v_h == rtgt)).astype(wf.dtype)
        bands = jax.lax.dot_general(
            R, wf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                       # [qbs*SIDE, CW]
        # Col one-hot shared per query across its SIDE rows: out2[u, j] with
        # j = q*SIDE + sx must only keep q == u//SIDE -> block-diag again.
        lane = jax.lax.broadcasted_iota(jnp.int32, (CW, qbs * SIDE), 0)
        # cols[q, sx] laid out as [qbs*SIDE] vector in (q, sx) order:
        cflat = c.reshape(qbs * SIDE)
        D = (lane == cflat[None, :]).astype(wf.dtype)            # [CW, qbs*SIDE]
        full = jax.lax.dot_general(
            bands.astype(wf.dtype), D, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                       # [qbs*SIDE, qbs*SIDE]
        uq = jax.lax.broadcasted_iota(jnp.int32, (qbs * SIDE, qbs * SIDE), 0) // SIDE
        jq = jax.lax.broadcasted_iota(jnp.int32, (qbs * SIDE, qbs * SIDE), 1) // SIDE
        keep = (uq == jq).astype(jnp.float32)
        kept = full * keep                                       # zeros off-diag
        # Reduce the q' axis: reshape [qbs*SIDE, qbs, SIDE] -> sum over qbs.
        patch = kept.reshape(qbs * SIDE, qbs, SIDE).sum(axis=1)
        out_ref[s * qbs:(s + 1) * qbs] = patch.reshape(qbs, SIDE, SIDE)


def kernel_masked(win_ref, rows_ref, cols_ref, out_ref):
    win = win_ref[:]
    rows = rows_ref[:]
    cols = cols_ref[:]
    riota = jax.lax.broadcasted_iota(jnp.int32, (QB, SIDE, CH), 2)
    R = (rows[:, :, None] == riota).astype(win.dtype)
    # bands via mask+reduce over CH (small): [QB, SIDE, CH] x [QB, CH, CW]
    bands = jnp.zeros((QB, SIDE, CW), jnp.float32)
    for h in range(CH):
        bands = bands + R[:, :, h][:, :, None].astype(jnp.float32) * win[:, h][:, None, :].astype(jnp.float32)
    out = jnp.zeros((QB, SIDE, SIDE), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (QB, 1, CW), 2)
    for sx in range(SIDE):
        m = (lane == cols[:, sx][:, None, None]).astype(jnp.float32)  # [QB,1,CW]
        val = jnp.sum(bands * m, axis=2)                              # [QB, SIDE]
        out = jax.lax.dynamic_update_slice(out, val[:, :, None], (0, 0, sx))
    out_ref[:] = out


def run(name, kern):
    rng = np.random.default_rng(0)
    win = rng.standard_normal((NQ, CH, CW)).astype(np.float32)
    rows = rng.integers(0, CH, (NQ, SIDE)).astype(np.int32)
    cols = rng.integers(0, CW, (NQ, SIDE)).astype(np.int32)
    want = ref_select(win, rows, cols)

    dt = jnp.bfloat16
    winj = jnp.asarray(win, dt)

    f = pl.pallas_call(
        kern,
        grid=(NQ // QB,),
        in_specs=[
            pl.BlockSpec((QB, CH, CW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((QB, SIDE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((QB, SIDE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((QB, SIDE, SIDE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NQ, SIDE, SIDE), jnp.float32),
        interpret=INTERPRET,
    )
    jf = jax.jit(lambda w, r, c: f(w, jnp.asarray(r), jnp.asarray(c)))
    if INTERPRET:
        got = np.asarray(jf(winj, rows, cols))
        err = np.abs(got - want).max() / max(1e-6, np.abs(want).max())
        print(f"{name}: interpret rel-err {err:.2e}", flush=True)
        return
    try:
        got = jf(winj, rows, cols)
        got.block_until_ready()
        sub = np.asarray(got[:256])
        err = np.abs(sub - want[:256]).max() / np.abs(want[:256]).max()
        t0 = time.perf_counter()
        for _ in range(8):
            got = jf(winj, rows, cols)
        got.block_until_ready()
        dtm = (time.perf_counter() - t0) / 8
        print(f"{name}: {dtm*1e3:.2f} ms/call  rel-err {err:.2e}", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)


def main():
    run("batched", kernel_batched)
    run("blockdiag8", functools.partial(kernel_blockdiag, qbs=8))
    run("masked", kernel_masked)


if __name__ == "__main__":
    main()
