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


def _pick_chunk(hw: int, max_chunk: int = 2048) -> int:
    """Largest divisor of hw that is <= max_chunk (static shapes only)."""
    c = min(hw, max_chunk)
    while hw % c:
        c -= 1
    return c


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


class Aggregate(nn.Module):
    """Apply the (q, k) attention to motion features:
    out = fmap + gamma * softmax(q kᵀ) v,  v = to_v(fmap).

    Chunked over query rows: exact softmax, O(chunk * HW) transient."""

    dim: int = 128
    dim_head: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, fmap):
        b, h, w, c = fmap.shape
        hw = h * w
        d = q.shape[-1]  # attention head dim (context_dim upstream: 128)
        v = nn.Conv(d, (1, 1), use_bias=False, dtype=self.dtype, name="to_v")(fmap)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)

        qf = q.reshape(b, hw, d)
        kf = k.reshape(b, hw, d)
        vf = v.reshape(b, hw, d)

        chunk = _pick_chunk(hw)
        nchunk = hw // chunk

        def one_batch(args):
            qb, kb, vb = args  # [hw, d], [hw, d], [hw, d]

            def one_chunk(qc):
                # qc: [chunk, d] -> attn row-block [chunk, hw] (f32) -> out.
                sim = jnp.einsum(
                    "id,jd->ij", qc, kb, preferred_element_type=jnp.float32
                )
                attn = jax.nn.softmax(sim, axis=-1)
                return jnp.einsum(
                    "ij,jd->id",
                    attn.astype(vb.dtype),
                    vb,
                    preferred_element_type=jnp.float32,
                )

            qcs = qb.reshape(nchunk, chunk, d)
            return jax.lax.map(one_chunk, qcs).reshape(hw, d)

        out = jax.lax.map(one_batch, (qf, kf, vf))  # [b, hw, d]
        out = out.reshape(b, h, w, d).astype(fmap.dtype)
        if d != c:
            # Upstream adds a 1x1 projection when dim != inner_dim.
            out = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name="project")(out)
        return fmap + gamma.astype(fmap.dtype) * out
