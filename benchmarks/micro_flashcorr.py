#!/usr/bin/env python3
"""FlashCorr mini-kernel probe: on-the-fly correlation + radius-patch
extraction in one Pallas kernel, at the bench L0 shape (1080x1280 tile,
h8=135, w8=160).

Mosaic findings that shaped this formulation (micro_select.py + bisects):
  - BATCHED dot_general compiles but lowers to per-batch tiny matmuls
    (108 ms where ~2 ms is expected) — per-query batched selects are out.
  - dynamic_update_slice is UNIMPLEMENTED in Pallas TPU lowering.
  - minor-dim reshapes of small int blocks ([16,10] -> [160,1]) and
    narrow (10-lane) slice STORES crash the Mosaic compiler outright
    (INTERNAL error via the remote-compile harness).
So:
  - rr/cc index vectors arrive PRE-FLATTENED as lane vectors, one
    16-lane (SIDE padded to 16) group per query: [nQ, QB*16] int32.
    In-kernel access is an aligned 256-lane static slice per sub-block.
  - The row one-hot is built TRANSPOSED — Rt [QBS*GR, QBS*16] — from
    pure 2D iota + a [1, 256] lane-vector broadcast (no reshape at all),
    and applied with dot_general contracting dim 0 on both sides.
  - The column select runs once at the last chunk: Ct [LW_PAD, QBS*16]
    one-hot per sub-block, a static block-diagonal mask (VPU), and a
    static [QBS*16, 16] one-hot matmul extract the per-query patch.
  - All stores are full-width static slices.

Variants:
  floor : corr matmul only (no selects) — the MXU/DMA floor
  flash : corr + row select + col select (the kernel)

Run:
  MODE=cpu python benchmarks/micro_flashcorr.py   # interpret correctness
  python benchmarks/micro_flashcorr.py            # TPU timing
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

# L0 shapes at the 1080x1280 bench tile.
LH, LW = 135, 160
C = 256
R = 4
SIDE = 2 * R + 2          # 10
SP = 16                   # SIDE padded to a power-of-two lane group
LW_PAD = 256              # lw rounded to lanes
GR = 8                    # plane rows per chunk
CM = GR * LW_PAD          # 2048 chunk lanes
LH_PAD = 136              # rows rounded to GR multiple
NM = LH_PAD // GR         # 17 chunks
QB = 512                  # queries per block
QBS = 16                  # queries per select sub-block
NSUB = QB // QBS
NQ = 2 * QB if INTERPRET else 21504  # query count (QB multiple)
SCALE = 1.0 / float(np.sqrt(C))


def kernel(q_ref, f2_ref, rrl_ref, ccl_ref, out_ref, bands_ref, *, select, qbs=QBS):
    qi = pl.program_id(0)
    mi = pl.program_id(1)

    @pl.when(mi == 0)
    def _():
        bands_ref[:] = jnp.zeros_like(bands_ref)

    nsub = QB // qbs
    q = q_ref[:]                      # [QB, C] bf16
    f2c = f2_ref[:]                   # [CM, C] bf16
    corr = jax.lax.dot_general(
        q, f2c, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                  # [QB, CM] f32
    corr = (corr * SCALE).astype(jnp.bfloat16)

    if not select:
        bands_ref[0, :, :LW_PAD] += corr[: qbs * SP, :LW_PAD]
        @pl.when(mi == pl.num_programs(1) - 1)
        def _():
            probe = bands_ref[0, 0:1, 0:1].astype(out_ref.dtype)  # [1, 1]
            out_ref[:, :] = jnp.zeros((QB * SP, SP), out_ref.dtype) + probe
        return

    r0 = mi * GR
    for si in range(nsub):
        # corr rows for QBS queries regrouped to [QBS*GR, LW_PAD]
        # (2048 -> 8 x 256 lanes: tile-aligned minor unflatten).
        corr_sub = corr[si * qbs : (si + 1) * qbs].reshape(qbs * GR, LW_PAD)
        # Row one-hot, TRANSPOSED: Rt[v=(q2,g), u=(q,s)] = 1 iff q2 == q
        # and rr[q, s] == r0 + g.  rr arrives as a lane vector.
        rr_row = rrl_ref[qi, si * qbs * SP : (si + 1) * qbs * SP]  # [256] lanes
        u_q = jax.lax.broadcasted_iota(jnp.int32, (qbs * GR, qbs * SP), 1) // SP
        v_q = jax.lax.broadcasted_iota(jnp.int32, (qbs * GR, qbs * SP), 0) // GR
        v_g = jax.lax.broadcasted_iota(jnp.int32, (qbs * GR, qbs * SP), 0) % GR
        rt = (
            (u_q == v_q) & (v_g + r0 == rr_row[None, :])
        ).astype(jnp.bfloat16)         # [QBS*GR, QBS*SP]
        sel = jax.lax.dot_general(
            rt, corr_sub, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)         # [QBS*SP(u), LW_PAD]
        # One-hot rows: bf16 accumulation is exact (one nonzero per sum).
        bands_ref[si, :, :] += sel

    @pl.when(mi == pl.num_programs(1) - 1)
    def _():
        # Static extraction helpers (iota-only, no data movement).
        um = jax.lax.broadcasted_iota(jnp.int32, (qbs * SP, qbs * SP), 0) // SP
        jm = jax.lax.broadcasted_iota(jnp.int32, (qbs * SP, qbs * SP), 1) // SP
        blockdiag = (um == jm).astype(jnp.bfloat16)       # [256, 256]
        et = jax.lax.broadcasted_iota(jnp.int32, (qbs * SP, SP), 0) % SP
        tt = jax.lax.broadcasted_iota(jnp.int32, (qbs * SP, SP), 1)
        extract = (et == tt).astype(jnp.bfloat16)         # [256, 16]
        lanew = jax.lax.broadcasted_iota(
            jnp.int32, (LW_PAD, qbs * SP), 0
        )
        for si in range(nsub):
            cc_row = ccl_ref[qi, si * qbs * SP : (si + 1) * qbs * SP]  # [256]
            ct = (lanew == cc_row[None, :]).astype(jnp.bfloat16)  # [LW_PAD, QBS*SP(j)]
            bands = bands_ref[si, :, :]   # [QBS*SP(u), LW_PAD]
            pf = jax.lax.dot_general(
                bands, ct, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)        # [u=(q,s), j=(q2,t)]
            patch = jax.lax.dot_general(
                pf * blockdiag, extract, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                             # [QBS*SP(u), SP(t)]
            out_ref[si * qbs * SP : (si + 1) * qbs * SP, :] = patch.astype(
                out_ref.dtype
            )


def make_call(select, qbs=QBS):
    return pl.pallas_call(
        functools.partial(kernel, select=select, qbs=qbs),
        grid=(NQ // QB, NM),
        in_specs=[
            pl.BlockSpec((QB, C), lambda qi, mi: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CM, C), lambda qi, mi: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rr lanes: whole array
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cc lanes: whole array
        ],
        out_specs=pl.BlockSpec(
            (QB * SP, SP), lambda qi, mi: (qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((NQ * SP, SP), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((QB // qbs, qbs * SP, LW_PAD), jnp.bfloat16),
        ],
        interpret=INTERPRET,
    )


def ref_patch(f1, f2pad, rr, cc):
    """NumPy reference: corr = f1 @ f2^T * scale (bf16 at rest), patch
    gathered at (rr, cc)."""
    corr = (f1.astype(np.float32) @ f2pad.reshape(-1, C).astype(np.float32).T) * SCALE
    corr = corr.astype(jnp.bfloat16).astype(np.float32)  # bf16 at rest
    corr = corr.reshape(NQ, LH_PAD, LW_PAD)
    n = np.arange(NQ)[:, None, None]
    return corr[n, rr[:, :, None], cc[:, None, :]]


def lane_pack(idx):
    """[NQ, SIDE] -> [NQ//QB, QB*SP] with -1 padding in dead lanes."""
    full = np.full((NQ, SP), -1, np.int32)
    full[:, :SIDE] = idx
    return full.reshape(NQ // QB, QB * SP)


def main():
    rng = np.random.default_rng(0)
    f1 = rng.standard_normal((NQ, C)).astype(np.float32)
    f2 = rng.standard_normal((LH, LW, C)).astype(np.float32)
    f2pad = np.zeros((LH_PAD, LW_PAD, C), np.float32)
    f2pad[:LH, :LW] = f2
    rr = rng.integers(0, LH, (NQ, SIDE)).astype(np.int32)
    cc = rng.integers(0, LW, (NQ, SIDE)).astype(np.int32)

    q = jnp.asarray(f1, jnp.bfloat16)
    f2j = jnp.asarray(f2pad.reshape(LH_PAD * LW_PAD, C), jnp.bfloat16)
    rrl = jnp.asarray(lane_pack(rr))
    ccl = jnp.asarray(lane_pack(cc))

    def check(got):
        got = np.asarray(got, np.float32).reshape(NQ, SP, SP)[:256, :SIDE, :SIDE]
        want = ref_patch(
            np.asarray(q, np.float32),
            np.asarray(f2j, np.float32).reshape(LH_PAD, LW_PAD, C),
            rr, cc,
        )[:256]
        return np.abs(got - want).max() / np.abs(want).max()

    if INTERPRET:
        got = make_call(True)(q, f2j, rrl, ccl)
        print(f"flash: interpret rel-err {check(got):.2e}", flush=True)
        return

    # The axon relay caches (executable, inputs) executions, so repeated
    # dispatches measure 10-50x above peak FLOPs.  Chain ITERS distinct
    # executions inside one jit (input perturbed by the loop index) and
    # time the whole chain with fresh seeds.
    ITERS = 8

    for name, select, qbs in (
        ("floor", False, QBS),
        ("flash16", True, 16),
        ("flash32", True, 32),
    ):
        try:
            call = make_call(select, qbs)

            @jax.jit
            def chain(qv, s):
                def body(i, acc):
                    qi = (qv * (1.0 + s * (1.0 + i))).astype(jnp.bfloat16)
                    out = call(qi, f2j, rrl, ccl)
                    return acc + out[:8, :8].astype(jnp.float32).sum()

                return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

            chain(q, jnp.bfloat16(1e-8)).block_until_ready()
            t0 = time.perf_counter()
            chain(q, jnp.bfloat16(3e-8)).block_until_ready()
            dt = (time.perf_counter() - t0) / ITERS
            gf = NQ * LH_PAD * LW_PAD * C * 2 / 1e9
            print(f"{name}: {dt*1e3:.2f} ms/call ({gf/dt/1e3:.0f} TF/s corr-matmul)", flush=True)
            if select:
                got = jax.jit(call)(q, f2j, rrl, ccl)
                print(f"{name}: rel-err {check(got):.2e}", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:400]}", flush=True)


if __name__ == "__main__":
    main()
