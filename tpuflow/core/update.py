"""Iterative update blocks: motion encoder, SKFlow large-kernel GRU,
flow/mask heads, convex upsampling.

The reference's nets run a recurrent update `decoder_depth` times
(12 default, 6 fast — videoflow_core.py:91-94), each iteration consuming
correlation lookups + current flow and emitting a flow delta; the final
flow is convex-upsampled 8x (SURVEY §2.2; RAFT §3.3; SKFlow uses
large-kernel depthwise "super kernels" instead of plain convs).

All NHWC / bf16-friendly.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class MotionEncoder(nn.Module):
    """Fuse correlation lookup features + current flow into a motion
    feature (RAFT BasicMotionEncoder shape)."""

    out_dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, corr_feat, flow):
        flow = flow.astype(self.dtype)
        c = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype, name="convc1")(corr_feat))
        c = nn.relu(nn.Conv(192, (3, 3), dtype=self.dtype, name="convc2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), dtype=self.dtype, name="convf1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), dtype=self.dtype, name="convf2")(f))
        x = jnp.concatenate([c, f], axis=-1)
        x = nn.relu(nn.Conv(self.out_dim - 2, (3, 3), dtype=self.dtype, name="conv")(x))
        return jnp.concatenate([x, flow], axis=-1)


class SuperKernelBlock(nn.Module):
    """SKFlow-style large-kernel mixing: depthwise large kernel + pointwise
    convs with a residual.  Large depthwise convs are cheap on the VPU and
    widen the receptive field without extra GRU iterations."""

    dim: int
    kernel: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.dim,
            (self.kernel, self.kernel),
            feature_group_count=self.dim,
            dtype=self.dtype,
            name="dw",
        )(x)
        y = nn.Conv(self.dim * 2, (1, 1), dtype=self.dtype, name="pw1")(y)
        y = nn.gelu(y)
        y = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="pw2")(y)
        return x + y


class SepConvGRU(nn.Module):
    """Separable-conv GRU (RAFT): a 1x5 pass then a 5x1 pass."""

    hidden_dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        for axis, name in ((1, "h"), (0, "v")):
            k = (1, 5) if name == "h" else (5, 1)
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(nn.Conv(self.hidden_dim, k, dtype=self.dtype, name=f"convz_{name}")(hx))
            r = nn.sigmoid(nn.Conv(self.hidden_dim, k, dtype=self.dtype, name=f"convr_{name}")(hx))
            q = jnp.tanh(
                nn.Conv(self.hidden_dim, k, dtype=self.dtype, name=f"convq_{name}")(
                    jnp.concatenate([r * h, x], axis=-1)
                )
            )
            h = (1 - z) * h + z * q
        return h


class FlowHead(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        x = nn.relu(nn.Conv(256, (3, 3), dtype=self.dtype, name="conv1")(h))
        return nn.Conv(2, (3, 3), dtype=self.dtype, name="conv2")(x)


class MaskHead(nn.Module):
    """Predicts the 9 x 8 x 8 convex-combination weights for upsampling."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        x = nn.relu(nn.Conv(256, (3, 3), dtype=self.dtype, name="conv1")(h))
        # 0.25 scaling stabilizes the softmax logits (RAFT convention).
        return 0.25 * nn.Conv(64 * 9, (1, 1), dtype=self.dtype, name="conv2")(x)


class UpdateBlock(nn.Module):
    """One GRU refinement step.

    Inputs: hidden state h, context inp, correlation lookup, current flow,
    and (optionally) an extra motion feature from temporal fusion
    (VideoFlow) or memory read (MemFlow), concatenated before the GRU.
    Returns (new_hidden, motion_feature, delta_flow).  The convex-upsample
    mask is a separate head (MaskHead) applied once to the final hidden
    state — intermediate iterations never upsample, so computing the mask
    per-iteration (as a fused block would) is pure waste."""

    hidden_dim: int = 128
    use_sk: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, inp, corr_feat, flow, extra_motion=None):
        motion = MotionEncoder(128, dtype=self.dtype, name="motion_encoder")(corr_feat, flow)
        if self.use_sk:
            motion = SuperKernelBlock(128, 7, dtype=self.dtype, name="sk_motion")(motion)

        feats = [inp, motion]
        if extra_motion is not None:
            feats.append(extra_motion)
        x = jnp.concatenate(feats, axis=-1)

        h = SepConvGRU(self.hidden_dim, dtype=self.dtype, name="gru")(h, x)
        delta = FlowHead(dtype=self.dtype, name="flow_head")(h)
        return h, motion, delta


def upsample_flow_convex(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Convex upsampling 8x (RAFT §3.3).

    flow: [B, h, w, 2] at 1/8 resolution (values in 1/8-res pixels).
    mask: [B, h, w, 576] = 9 weights per upsampled position (8x8 block).
    Returns [B, 8h, 8w, 2] with vectors scaled x8.
    """
    b, h, w, _ = flow.shape
    mask = mask.reshape(b, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)

    # 3x3 neighborhood of the coarse flow, scaled to full-res units.
    flow8 = 8.0 * flow
    patches = []
    padded = jnp.pad(flow8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    for dy in range(3):
        for dx in range(3):
            patches.append(padded[:, dy : dy + h, dx : dx + w, :])
    nbhd = jnp.stack(patches, axis=3)  # [B, h, w, 9, 2]

    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", mask, nbhd)  # [B, h, w, 8, 8, 2]
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * 8, w * 8, 2)
    return up


def upsample_flow_bilinear(flow: jnp.ndarray, factor: int = 8) -> jnp.ndarray:
    """Plain bilinear 8x upsample (used for intermediate iterations /
    fallback)."""
    b, h, w, c = flow.shape
    out = jax.image.resize(flow, (b, h * factor, w * factor, c), method="bilinear")
    return out * factor
