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


def _gelu(x):
    """GELU matching torch F.gelu (exact erf) in float32 — the parity/test
    dtype — and tanh-approx in bf16 compute (error below bf16 rounding;
    see core/sk.py:_gelu)."""
    return nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


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
# Twins-SVT (upstream-faithful: timm twins_svt_large truncated to 2 stages)
# =============================================================================
# VideoFlow/MemFlow wrap `timm.create_model('twins_svt_large')` (the
# reference pins timm==0.4.12, requirements.txt:13) and run only the
# first TWO stages (forward(..., layer=2)) to get 256-dim features at 1/8
# resolution.  These modules reproduce that structure leaf-for-leaf so a
# real checkpoint's `fnet.svt.*` / `cnet.svt.*` tensors map mechanically
# (runtime/convert.py):
#
#   svt.patch_embeds.{i}.proj|norm     -> patch_embeds_{i}/proj|norm
#   svt.pos_block.{i}.proj.0           -> pos_block_{i}/proj_0
#   svt.blocks.{i}.{j}.norm1|norm2     -> blocks_{i}_{j}/norm1|norm2
#   svt.blocks.{i}.{j}.attn.{qkv,q,kv,proj,sr,norm}
#                                      -> blocks_{i}_{j}/attn/...
#   svt.blocks.{i}.{j}.mlp.fc1|fc2     -> blocks_{i}_{j}/mlp/fc1|fc2
#
# twins_svt_large stage hyperparams (timm): embed_dims (128, 256),
# depths (2, 2), heads (4, 8), sr_ratios (8, 4), window 7, mlp ratio 4.
# Blocks alternate LSA (even j, ws=7) / GSA (odd j); the conditional
# positional encoding (PosConv) applies after block 0 of each stage.


class LocallyGroupedAttn(nn.Module):
    """LSA: windowed MHSA with a FUSED qkv projection (torch layout)."""

    dim: int
    num_heads: int
    ws: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws = self.ws
        hd = c // self.num_heads
        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        nh, nw = hp // ws, wp // ws

        xw = x.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(b * nh * nw, ws * ws, c)

        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(xw)
        qkv = qkv.reshape(-1, ws * ws, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [g, n, h, d]
        attn = jnp.einsum(
            "gnhd,gmhd->ghnm", q, k, preferred_element_type=jnp.float32
        ) * (hd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("ghnm,gmhd->gnhd", attn, v).reshape(-1, ws * ws, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)

        out = out.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(b, hp, wp, c)
        return out[:, :h, :w]


class GlobalSubSampleAttn(nn.Module):
    """GSA: full-res queries, keys/values from an sr-strided subsample."""

    dim: int
    num_heads: int
    sr_ratio: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hd = c // self.num_heads
        q = nn.Dense(c, dtype=self.dtype, name="q")(x.reshape(b, h * w, c))
        q = q.reshape(b, h * w, self.num_heads, hd)

        kv_in = x
        if self.sr_ratio > 1:
            kv_in = nn.Conv(
                c,
                (self.sr_ratio, self.sr_ratio),
                strides=self.sr_ratio,
                dtype=self.dtype,
                name="sr",
            )(x)
            kv_in = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(kv_in)
        m = kv_in.shape[1] * kv_in.shape[2]
        kv = nn.Dense(2 * c, dtype=self.dtype, name="kv")(kv_in.reshape(b, m, c))
        kv = kv.reshape(b, m, 2, self.num_heads, hd)
        k, v = kv[:, :, 0], kv[:, :, 1]

        attn = jnp.einsum(
            "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * (hd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, h * w, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        return out.reshape(b, h, w, c)


class TwinsMlp(nn.Module):
    dim: int
    ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim * self.ratio, dtype=self.dtype, name="fc1")(x)
        x = _gelu(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class TwinsBlock(nn.Module):
    dim: int
    num_heads: int
    use_global: bool
    ws: int = 7
    sr_ratio: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if self.use_global:
            y = GlobalSubSampleAttn(
                self.dim, self.num_heads, self.sr_ratio, self.dtype, name="attn"
            )(y)
        else:
            y = LocallyGroupedAttn(
                self.dim, self.num_heads, self.ws, self.dtype, name="attn"
            )(y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = TwinsMlp(self.dim, 4, self.dtype, name="mlp")(y)
        return x + y


class TwinsPatchEmbed(nn.Module):
    """Strided-conv patch embedding + LayerNorm (timm PatchEmbed)."""

    dim: int
    patch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.dim,
            (self.patch, self.patch),
            strides=self.patch,
            dtype=self.dtype,
            name="proj",
        )(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class PosConv(nn.Module):
    """Conditional positional encoding: residual depthwise 3x3
    (timm PosConv with stride 1)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.dim,
            (3, 3),
            feature_group_count=self.dim,
            dtype=self.dtype,
            name="proj_0",
        )(x)
        return x + y


class TwinsSVT(nn.Module):
    """twins_svt_large truncated to its first two stages: [B, H, W, 3] ->
    [B, H/8, W/8, 256] (the 1/8-res 256-dim features VideoFlow's fnet and
    cnet consume; checkpoint stages 2-3 are unused/ignored)."""

    dims: Sequence[int] = (128, 256)
    depths: Sequence[int] = (2, 2)
    heads: Sequence[int] = (4, 8)
    sr_ratios: Sequence[int] = (8, 4)
    ws: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, (dim, depth, nh, sr) in enumerate(
            zip(self.dims, self.depths, self.heads, self.sr_ratios)
        ):
            patch = 4 if i == 0 else 2
            x = TwinsPatchEmbed(dim, patch, self.dtype, name=f"patch_embeds_{i}")(x)
            for j in range(depth):
                x = TwinsBlock(
                    dim,
                    nh,
                    use_global=(j % 2 == 1),
                    ws=self.ws,
                    sr_ratio=sr,
                    dtype=self.dtype,
                    name=f"blocks_{i}_{j}",
                )(x)
                if j == 0:
                    x = PosConv(dim, self.dtype, name=f"pos_block_{i}")(x)
        return x


def make_encoder(
    kind: str,
    output_dim: int,
    norm: str = "instance",
    dtype=jnp.float32,
    name: Optional[str] = None,
) -> nn.Module:
    if kind == "twins":
        # output_dim is fixed at 256 by the architecture (stage-2 width).
        assert output_dim == 256, "twins_svt_large 2-stage output is 256-dim"
        return TwinsSVT(dtype=dtype, name=name)
    return BasicEncoder(output_dim=output_dim, norm=norm, dtype=dtype, name=name)
