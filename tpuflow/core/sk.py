"""SKFlow building blocks (upstream-faithful, flax/NHWC).

The reference's VideoFlow checkpoints (MOF_*.pth / BOF_*.pth, loaded at
/root/reference/processing/videoflow_core.py:101-110) contain the SKFlow
update stack: `PCBlock4_Deep_nopool_res` super-kernel conv blocks wired
into `SKMotionEncoder6_Deep_nopool_res` and
`SKUpdateBlock6_Deep_nopoolres_AllDecoder2` (upstream VideoFlow
core/Networks/MOFNetStack; SKFlow NeurIPS 2022 — PAPERS.md).  These flax
modules reproduce that architecture leaf-for-leaf so the `.pth` state
dict maps mechanically (runtime/convert.py name tables):

  torch                                  flax (this file)
  ----------------------------------     ----------------------------
  x.conv_list.{i}.weight                 x/conv_list_{i}/kernel
  x.ffn1.0.weight  (1x1 conv)            x/ffn1_0/kernel
  x.ffn1.2.weight                        x/ffn1_2/kernel
  x.pw.weight                            x/pw/kernel
  x.ffn2.0.weight / x.ffn2.2.weight      x/ffn2_0|ffn2_2/kernel

TPU notes: the large-kernel (15x15) depthwise convs are VPU work that XLA
fuses well in bf16; everything here is elementwise/conv — no gathers.
All convs carry bias like the torch originals.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def _gelu(x):
    """GELU matching torch F.gelu (exact erf) in float32 — the parity/test
    dtype — and tanh-approx in bf16 compute, where the approximation error
    (<1e-3, arXiv:1606.08415 §2) sits below bf16 rounding noise and erf's
    transcendental cost is measurable (~12% of the update stack on v5e)."""
    return nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


class PCBlock4(nn.Module):
    """`PCBlock4_Deep_nopool_res`: residual 1.5x-FFN -> residual depthwise
    super-kernels (k in k_conv, square, groups=C_in) -> residual pointwise
    -> output FFN.  GELU after every residual add, like upstream."""

    c_out: int
    k_conv: Sequence[int] = (1, 15)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        mid = int(1.5 * c_in)
        y = nn.Conv(mid, (1, 1), dtype=self.dtype, name="ffn1_0")(x)
        y = _gelu(y)
        y = nn.Conv(c_in, (1, 1), dtype=self.dtype, name="ffn1_2")(y)
        x = _gelu(x + y)

        for i, k in enumerate(self.k_conv):
            y = nn.Conv(
                c_in,
                (k, k),
                feature_group_count=c_in,
                dtype=self.dtype,
                name=f"conv_list_{i}",
            )(x)
            x = _gelu(x + y)

        y = nn.Conv(c_in, (1, 1), dtype=self.dtype, name="pw")(x)
        x = _gelu(x + y)

        y = nn.Conv(mid, (1, 1), dtype=self.dtype, name="ffn2_0")(x)
        y = _gelu(y)
        return nn.Conv(self.c_out, (1, 1), dtype=self.dtype, name="ffn2_2")(y)


class SKMotionEncoderMOF(nn.Module):
    """`SKMotionEncoder6_Deep_nopool_res` (MOF variant): fuses the
    bidirectional correlation lookup + 4-channel flow + the temporally
    shifted 48-channel motion hidden states into a 128-dim motion feature.

    Inputs (NHWC):
      flow:   [B*N, h, w, 4]   (forward ++ backward)
      corr:   [B*N, h, w, cor_planes]  (both directions concatenated)
      motion_hidden_state: [B, N, h, w, 48] or None (learned init)
    Returns (motion_features [B*N, h, w, 128],
             motion_hidden_state [B, N, h, w, 48]).

    The hidden-state shifting (each interior frame sees its neighbors'
    previous-iteration hidden states, zero-padded at window edges) is the
    cross-frame motion propagation that makes MOF multi-frame.
    """

    corr_levels: int = 4
    corr_radius: int = 4
    k_conv: Sequence[int] = (1, 15)
    hidden_ch: int = 48
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, flow, motion_hidden_state, corr, bs: int):
        bn, h, w, _ = flow.shape
        n = bn // bs
        hc = self.hidden_ch

        init_hidden = self.param(
            "init_hidden_state",
            nn.initializers.normal(1.0),
            (1, 1, 1, 1, hc),
            jnp.float32,
        )
        if motion_hidden_state is None:
            motion_hidden_state = jnp.broadcast_to(
                init_hidden.astype(self.dtype), (bs, n, h, w, hc)
            )
        mhs = motion_hidden_state.astype(self.dtype)

        # Neighbor shifts along the interior-frame axis (zero pad at edges).
        zeros = jnp.zeros((bs, 1, h, w, hc), self.dtype)
        fwd_mhs = jnp.concatenate([mhs[:, 1:], zeros], axis=1).reshape(bn, h, w, hc)
        bwd_mhs = jnp.concatenate([zeros, mhs[:, :-1]], axis=1).reshape(bn, h, w, hc)
        cur_mhs = mhs.reshape(bn, h, w, hc)

        cor = _gelu(
            PCBlock4(256, self.k_conv, self.dtype, name="convc1")(corr)
        )
        cor = PCBlock4(192, self.k_conv, self.dtype, name="convc2")(cor)
        flo = nn.Conv(128, (1, 1), dtype=self.dtype, name="convf1_")(
            flow.astype(self.dtype)
        )
        flo = PCBlock4(64, self.k_conv, self.dtype, name="convf2")(flo)

        cat = jnp.concatenate([cor, flo, fwd_mhs, bwd_mhs, cur_mhs], axis=-1)
        out = PCBlock4(128 - 4 + hc, self.k_conv, self.dtype, name="conv")(cat)
        motion_feat, new_mhs = out[..., : 128 - 4], out[..., 128 - 4 :]
        motion_feat = jnp.concatenate([motion_feat, flow.astype(self.dtype)], axis=-1)
        return motion_feat, new_mhs.reshape(bs, n, h, w, hc)


class SKMotionEncoderMem(nn.Module):
    """Two-frame SK motion encoder (MemFlow / SKFlow lineage): fuses the
    single-direction correlation lookup + 2-channel flow + the memory
    readout into a 128-dim motion feature.  Structure follows
    `SKMotionEncoder6_Deep_nopool_res` with the AllDecoder2-style 1x1
    flow stem (convf1_); the memory readout concatenation is MemFlow's
    addition (arXiv:2404.04808 §3.2)."""

    k_conv: Sequence[int] = (1, 15)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, flow, corr, mem_read):
        cor = _gelu(
            PCBlock4(256, self.k_conv, self.dtype, name="convc1")(corr)
        )
        cor = PCBlock4(192, self.k_conv, self.dtype, name="convc2")(cor)
        flo = nn.Conv(128, (1, 1), dtype=self.dtype, name="convf1_")(
            flow.astype(self.dtype)
        )
        flo = PCBlock4(64, self.k_conv, self.dtype, name="convf2")(flo)
        cat = jnp.concatenate([cor, flo, mem_read], axis=-1)
        out = PCBlock4(128 - 2, self.k_conv, self.dtype, name="conv")(cat)
        return jnp.concatenate([out, flow.astype(self.dtype)], axis=-1)


class SKUpdateBlockMem(nn.Module):
    """MemFlow's update block (`SKUpdateBlock6_Deep_nopoolres_AllDecoder2`
    lineage, 2-frame): motion encoder consuming the once-per-frame memory
    readout, GMA aggregation, PCBlock "gru", 2-channel flow head,
    64*9-channel upsample mask."""

    hidden_dim: int = 128
    k_conv: Sequence[int] = (1, 15)
    pc_updater_conv: Sequence[int] = (1, 7)
    dtype: Dtype = jnp.float32
    gma_impl: str = "auto"

    @nn.compact
    def __call__(self, net, inp, corr, flow, q, k, mem_read, attn=None):
        from .gma import Aggregate

        motion = SKMotionEncoderMem(self.k_conv, dtype=self.dtype, name="encoder")(
            flow, corr, mem_read
        )
        motion_global = Aggregate(
            dtype=self.dtype, impl=self.gma_impl, name="aggregator"
        )(q, k, motion, attn)

        x = jnp.concatenate([net, inp, motion, motion_global], axis=-1)
        net = PCBlock4(self.hidden_dim, self.pc_updater_conv, self.dtype, name="gru")(x)
        delta = PCBlock4(2, self.k_conv, self.dtype, name="flow_head")(net)

        m = nn.relu(nn.Conv(256, (3, 3), dtype=self.dtype, name="mask_0")(net))
        mask = 0.25 * nn.Conv(64 * 9, (1, 1), dtype=self.dtype, name="mask_2")(m)
        return net, motion, mask, delta


class SKUpdateBlockMOF(nn.Module):
    """`SKUpdateBlock6_Deep_nopoolres_AllDecoder2`: one joint bidirectional
    refinement step.

    net' = PCBlock([net, inp, motion, motion_global])      ("gru")
    delta = PCBlock(net') -> 4 channels                    ("flow_head")
    mask  = .25 * Conv stack(net') -> 2 * 64*9 channels    ("mask")

    `q, k` are the GMA attention projections computed once per window
    (gma.Attention on the context features); the aggregator re-applies
    them to the motion features every iteration.
    """

    hidden_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    k_conv: Sequence[int] = (1, 15)
    pc_updater_conv: Sequence[int] = (1, 7)
    dtype: Dtype = jnp.float32
    gma_impl: str = "auto"

    @nn.compact
    def __call__(
        self, net, motion_hidden_state, inp, corr, flow, q, k, bs: int, attn=None
    ):
        from .gma import Aggregate

        encoder = SKMotionEncoderMOF(
            self.corr_levels,
            self.corr_radius,
            self.k_conv,
            dtype=self.dtype,
            name="encoder",
        )
        motion_features, motion_hidden_state = encoder(
            flow, motion_hidden_state, corr, bs
        )
        motion_global = Aggregate(
            dtype=self.dtype, impl=self.gma_impl, name="aggregator"
        )(q, k, motion_features, attn)

        x = jnp.concatenate([net, inp, motion_features, motion_global], axis=-1)
        net = PCBlock4(self.hidden_dim, self.pc_updater_conv, self.dtype, name="gru")(x)
        delta_flow = PCBlock4(4, self.k_conv, self.dtype, name="flow_head")(net)

        m = nn.relu(nn.Conv(256, (3, 3), dtype=self.dtype, name="mask_0")(net))
        mask = 0.25 * nn.Conv(64 * 9 * 2, (1, 1), dtype=self.dtype, name="mask_2")(m)
        return net, motion_hidden_state, mask, delta_flow
