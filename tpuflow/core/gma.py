"""GMA global motion aggregation (upstream-faithful, flax/NHWC).

VideoFlow's nets compute a content-only attention over the context
features once per window (`att = Attention(...)(inp)`, heads=1,
dim_head=128) and re-apply it to the motion features every refinement
iteration (`Aggregate`) — upstream VideoFlow core/Networks/MOFNetStack/gma.py
(GMA, ICCV 2021; consumed by the reference via videoflow_core.py:101).

TPU-first difference: upstream materializes the [HW, HW] attention
matrix (2.6 GB f32 per interior frame at 1280-tile shapes).  Here the
q/k projections are computed once, and each Aggregate application runs a
CHUNKED softmax(q kᵀ) v — flash-attention style over query blocks under
`lax.map` — so peak memory is one [chunk, HW] strip instead of [HW, HW].
Numerics are exact (full-row softmax per query, f32 accumulation); only
the schedule differs.

Checkpoint mapping (runtime/convert.py):
  att.to_qk.weight        -> att/to_qk/kernel        (1x1 conv, no bias)
  update_block.aggregator.to_v.weight -> .../aggregator/to_v/kernel
  update_block.aggregator.gamma       -> .../aggregator/gamma
  att.pos_emb.*           -> unused (position_only=False upstream config)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def flash_aggregate(q, k, v, *, block: int = 512, interpret: bool = False):
    """softmax(q kᵀ) v via the fused Pallas flash-attention kernel
    (jax.experimental.pallas.ops.tpu.flash_attention).

    q, k, v: [B, h, w, d] (q pre-scaled by d^-0.5, as Attention emits).
    Returns [B, h, w, d] f32-accumulated, cast to v.dtype.

    Why: materializing softmax(qkᵀ) costs b·hw·hw HBM and its per-iteration
    re-read measured ~23 ms at the 1280-tile (6x off bandwidth — XLA keeps
    relayouting the big matrix inside the scan); the chunked-XLA recompute
    costs ~23 ms/iteration too.  The flash kernel recomputes scores on the
    MXU in VMEM: no [hw, hw] bytes ever touch HBM, ~4 ms at the same shape,
    and the 2.8 GB probability buffer is freed for window batching.

    hw is padded to a multiple of `block` (21600 has no 128-multiple
    divisor); padding is masked exactly via segment ids (pad rows live in
    a different segment, so real queries never attend to them).
    """
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, h, w, d = q.shape
    hw = h * w
    blk = min(block, max(128, -(-hw // 128) * 128))
    pad = (-hw) % blk
    s = hw + pad

    def prep(x):
        xf = x.reshape(b, hw, d)
        if pad:
            xf = jnp.pad(xf, ((0, 0), (0, pad), (0, 0)))
        return xf[:, None]  # [B, 1, S, d]

    dt = v.dtype
    qf, kf, vf = prep(q.astype(dt)), prep(k.astype(dt)), prep(v)
    if pad:
        seg = (jnp.arange(s, dtype=jnp.int32) >= hw).astype(jnp.int32)
        seg = jnp.broadcast_to(seg[None], (b, s))
        segment_ids = fa.SegmentIds(q=seg, kv=seg)
    else:
        segment_ids = None
    sizes = fa.BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1
    )
    ctx = None
    if interpret:
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()
        ctx.__enter__()
    try:
        out = fa.flash_attention(
            qf, kf, vf, segment_ids=segment_ids, sm_scale=1.0, block_sizes=sizes
        )
    finally:
        if ctx is not None:
            ctx.__exit__(None, None, None)
    return out[:, 0, :hw].reshape(b, h, w, d).astype(dt)


def _pick_chunk(hw: int, max_chunk: int = 2048) -> int:
    """Largest divisor of hw that is <= max_chunk (static shapes only)."""
    c = min(hw, max_chunk)
    while hw % c:
        c -= 1
    return c


def _row_chunk(b: int, hw: int, budget: int = 3 * 10**8) -> int:
    """Query-row chunk for [b, chunk, hw] f32 attention strips: bounded
    by `budget` bytes (full-frame 2160p grids would otherwise build
    multi-GB strips and fault the worker)."""
    return _pick_chunk(hw, max(1, min(2048, budget // max(1, b * hw * 4))))


class Attention(nn.Module):
    """Content-only GMA attention: returns the (q, k) pair instead of the
    materialized [HW, HW] matrix (see module docstring).  heads=1 per the
    upstream VideoFlow config."""

    dim: int = 128
    dim_head: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fmap):
        # fmap: [B, h, w, dim] context features.
        qk = nn.Conv(
            2 * self.dim_head, (1, 1), use_bias=False, dtype=self.dtype, name="to_qk"
        )(fmap)
        q, k = jnp.split(qk, 2, axis=-1)
        q = q * (self.dim_head ** -0.5)
        return q, k


def materialize_attention(q, k, out_dtype=jnp.bfloat16):
    """softmax(q kᵀ) materialized ONCE per window: [B, h, w, d] x2 ->
    [B, hw, hw] in `out_dtype`.

    q/k are loop-invariant across the refinement iterations (upstream
    computes `att(context)` once, MOFNetStack network.py), so paying
    HBM for the probabilities converts every Aggregate application from
    two thin matmuls + softmax into ONE deep-K matmul — measured ~3x on
    the iteration loop.  Softmax runs over f32 row chunks (exact); bf16
    storage of probabilities in [0,1] adds noise below the volume's own
    bf16 storage (corr.py).  Use only when b*hw*hw fits the HBM budget
    (MOFNet.attn_hw_threshold gates it; the chunked path in Aggregate
    remains for full-frame grids)."""
    b, h, w, d = q.shape
    hw = h * w
    qf = q.reshape(b, hw, d)
    kf = k.reshape(b, hw, d)
    chunk = _row_chunk(b, hw)

    def one_chunk(qc):  # [b, chunk, d]
        sim = jnp.einsum("bid,bjd->bij", qc, kf, preferred_element_type=jnp.float32)
        return jax.nn.softmax(sim, axis=-1).astype(out_dtype)

    qcs = jnp.moveaxis(qf.reshape(b, hw // chunk, chunk, d), 1, 0)
    attn = jax.lax.map(one_chunk, qcs)  # [nchunk, b, chunk, hw]
    return jnp.moveaxis(attn, 0, 1).reshape(b, hw, hw)


class Aggregate(nn.Module):
    """Apply the (q, k) attention to motion features:
    out = fmap + gamma * softmax(q kᵀ) v,  v = to_v(fmap).

    With `attn` (precomputed by materialize_attention): one deep-K matmul.
    Without: chunked exact softmax recompute, O(chunk * HW) transient —
    the path for grids whose [hw, hw] probabilities would blow HBM."""

    dim: int = 128
    dim_head: int = 128
    dtype: Dtype = jnp.float32
    impl: str = "auto"  # 'auto' | 'flash' | 'xla' — how to apply the
                        # attention when no materialized `attn` is given:
                        # 'flash' = fused Pallas kernel (TPU), 'xla' =
                        # chunked exact softmax recompute; 'auto' picks
                        # flash on TPU backends.

    @nn.compact
    def __call__(self, q, k, fmap, attn=None):
        b, h, w, c = fmap.shape
        hw = h * w
        d = q.shape[-1]  # attention head dim (context_dim upstream: 128)
        v = nn.Conv(d, (1, 1), use_bias=False, dtype=self.dtype, name="to_v")(fmap)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)

        vf = v.reshape(b, hw, d)

        use_flash = self.impl == "flash" or (
            self.impl == "auto" and jax.default_backend() == "tpu"
        )
        if attn is None and use_flash:
            out = flash_aggregate(q, k, v).reshape(b, hw, d)
        elif attn is not None:
            out = jnp.einsum(
                "bij,bjd->bid", attn, vf.astype(attn.dtype),
                preferred_element_type=jnp.float32,
            )
        else:
            qf = q.reshape(b, hw, d)
            kf = k.reshape(b, hw, d)
            chunk = _row_chunk(b, hw)
            nchunk = hw // chunk

            def one_chunk(qc):
                # qc: [b, chunk, d] — all batch elements per step.
                sim = jnp.einsum(
                    "bid,bjd->bij", qc, kf, preferred_element_type=jnp.float32
                )
                probs = jax.nn.softmax(sim, axis=-1)
                return jnp.einsum(
                    "bij,bjd->bid",
                    probs.astype(vf.dtype),
                    vf,
                    preferred_element_type=jnp.float32,
                )

            qcs = jnp.moveaxis(qf.reshape(b, nchunk, chunk, d), 1, 0)
            out = jax.lax.map(one_chunk, qcs)  # [nchunk, b, chunk, d]
            out = jnp.moveaxis(out, 0, 1).reshape(b, hw, d)
        out = out.reshape(b, h, w, d).astype(fmap.dtype)
        if d != c:
            # Upstream adds a 1x1 projection when dim != inner_dim.
            out = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name="project")(out)
        return fmap + gamma.astype(fmap.dtype) * out
