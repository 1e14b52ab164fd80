"""Feature / context encoders for the flow networks (flax.linen, NHWC).

Two families, mirroring the reference's upstream nets (SURVEY §2.2):

- `BasicEncoder`: the RAFT-style residual CNN producing 1/8-resolution
  features (arXiv:2003.12039 §3.1).  Used as the context encoder and the
  default feature encoder.
- `TwinsSVT`: a Twins-SVT-style transformer encoder (locally-grouped +
  global sub-sampled attention), the backbone VideoFlow uses for its
  feature/context nets (the reference pins timm==0.4.12 for it,
  requirements.txt:13).  First three stages -> 1/8 resolution.

All modules are NHWC and bfloat16-friendly: matmuls/convs carry
`param_dtype=float32` with compute dtype configurable, keeping the MXU fed
with bf16 while accumulating in f32.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class ResidualBlock(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "instance"
    dtype: Dtype = jnp.float32

    def _norm(self, name):
        if self.norm == "instance":
            # Instance norm = GroupNorm with one group per channel.
            return nn.GroupNorm(num_groups=None, group_size=1, name=name, dtype=self.dtype)
        if self.norm == "group":
            return nn.GroupNorm(num_groups=8, name=name, dtype=self.dtype)
        if self.norm == "batch":
            # Inference-only framework: use GroupNorm as a frozen-BN stand-in
            # with a single group (scale/offset still convertible from BN).
            return nn.GroupNorm(num_groups=1, name=name, dtype=self.dtype)
        return lambda x: x

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, dtype=self.dtype, name="conv1")(x)
        y = self._norm("norm1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), dtype=self.dtype, name="conv2")(y)
        y = self._norm("norm2")(y)
        y = nn.relu(y)

        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(
                self.planes, (1, 1), strides=self.stride, dtype=self.dtype, name="downsample"
            )(x)
            x = self._norm("norm3")(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """RAFT-style residual encoder: 1/2 -> 1/4 -> 1/8 resolution."""

    output_dim: int = 256
    norm: str = "instance"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, 3] in [0, 1] -> scaled to [-1, 1] by caller or here.
        x = nn.Conv(64, (7, 7), strides=2, dtype=self.dtype, name="conv1")(x)
        if self.norm == "instance":
            x = nn.GroupNorm(num_groups=None, group_size=1, name="norm1", dtype=self.dtype)(x)
        x = nn.relu(x)

        x = ResidualBlock(64, 1, self.norm, self.dtype, name="layer1_0")(x)
        x = ResidualBlock(64, 1, self.norm, self.dtype, name="layer1_1")(x)
        x = ResidualBlock(96, 2, self.norm, self.dtype, name="layer2_0")(x)
        x = ResidualBlock(96, 1, self.norm, self.dtype, name="layer2_1")(x)
        x = ResidualBlock(128, 2, self.norm, self.dtype, name="layer3_0")(x)
        x = ResidualBlock(128, 1, self.norm, self.dtype, name="layer3_1")(x)

        x = nn.Conv(self.output_dim, (1, 1), dtype=self.dtype, name="conv2")(x)
        return x


# =============================================================================
# Twins-SVT (locally-grouped self attention + global sub-sampled attention)
# =============================================================================
class PatchEmbed(nn.Module):
    embed_dim: int
    patch_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=self.patch_size,
            dtype=self.dtype,
            name="proj",
        )(x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return x


class LocalAttention(nn.Module):
    """Locally-grouped self-attention (LSA): windowed MHSA."""

    dim: int
    num_heads: int
    window: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws = self.window
        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w

        # [B, nh, ws, nw, ws, C] -> [B*nh*nw, ws*ws, C]
        x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)

        x = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn"
        )(x, x)

        x = x.reshape(b, hp // ws, wp // ws, ws, ws, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        return x[:, :h, :w]


class GlobalAttention(nn.Module):
    """Global sub-sampled attention (GSA): queries at full res, keys/values
    from a strided subsample."""

    dim: int
    num_heads: int
    sr_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        q = x.reshape(b, h * w, c)
        if self.sr_ratio > 1:
            kv = nn.Conv(
                c,
                (self.sr_ratio, self.sr_ratio),
                strides=self.sr_ratio,
                dtype=self.dtype,
                name="sr",
            )(x)
            kv = nn.LayerNorm(dtype=self.dtype, name="sr_norm")(kv)
            kv = kv.reshape(b, -1, c)
        else:
            kv = q
        out = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn"
        )(q, kv)
        return out.reshape(b, h, w, c)


class Mlp(nn.Module):
    dim: int
    ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim * self.ratio, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        return x


class TwinsBlock(nn.Module):
    dim: int
    num_heads: int
    use_global: bool
    window: int = 7
    sr_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        if self.use_global:
            y = GlobalAttention(self.dim, self.num_heads, self.sr_ratio, self.dtype, name="gsa")(y)
        else:
            y = LocalAttention(self.dim, self.num_heads, self.window, self.dtype, name="lsa")(y)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = Mlp(self.dim, 4, self.dtype, name="mlp")(y)
        return x + y


class TwinsSVT(nn.Module):
    """Twins-SVT-style encoder, stages to 1/8 resolution.

    Stage dims follow Twins-SVT-Large's first three stages
    (128/256/512) projected to `output_dim`."""

    output_dim: int = 256
    dims: Sequence[int] = (128, 256)
    depths: Sequence[int] = (2, 2)
    heads: Sequence[int] = (4, 8)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # Stage 0 embeds at stride 4 (1/4 res), stage 1 at stride 2 (1/8).
        for stage, (dim, depth, nh) in enumerate(zip(self.dims, self.depths, self.heads)):
            x = PatchEmbed(dim, 4 if stage == 0 else 2, self.dtype, name=f"patch{stage}")(x)
            for i in range(depth):
                x = TwinsBlock(
                    dim,
                    nh,
                    use_global=(i % 2 == 1),
                    dtype=self.dtype,
                    name=f"stage{stage}_block{i}",
                )(x)
        x = nn.Conv(self.output_dim, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x


def make_encoder(kind: str, output_dim: int, norm: str = "instance", dtype=jnp.float32) -> nn.Module:
    if kind == "twins":
        return TwinsSVT(output_dim=output_dim, dtype=dtype)
    return BasicEncoder(output_dim=output_dim, norm=norm, dtype=dtype)
