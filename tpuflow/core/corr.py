"""All-pairs correlation volumes + radius lookup (RAFT-family core op).

The reference's models build 4D cost volumes between the center frame's
features and each neighbor, average-pool them into a `corr_levels` pyramid,
and bilinearly sample a (2r+1)^2 window around the current flow estimate at
each level (SURVEY §2.2; RAFT arXiv:2003.12039 §3.2).

TPU-first design notes:
- The volume build is one big batched matmul (MXU-bound):
  [B, HW, C] x [B, C, HW] with C contracted — ideal MXU shape when C=256.
- The pyramid is built by average-pooling the *target* spatial dims.
- Lookup is a gather; implemented as vectorized bilinear interpolation over
  the flattened volume.  XLA lowers this to dynamic-gather; for very large
  volumes the Pallas blockwise kernel (tpuflow.kernels) computes correlation
  on-the-fly during lookup instead of materializing the volume
  (the memory-efficient-sampling idea of arXiv:2505.16942).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def all_pairs_correlation(fmap1: jnp.ndarray, fmap2: jnp.ndarray) -> jnp.ndarray:
    """Full cost volume between two feature maps.

    Args:
      fmap1: [B, H, W, C] features of the source frame.
      fmap2: [B, H, W, C] features of the target frame.

    Returns:
      corr: [B, H, W, H, W] normalized by sqrt(C).
    """
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c)
    f2 = fmap2.reshape(b, h * w, c)
    corr = jnp.einsum(
        "bnc,bmc->bnm", f1, f2, preferred_element_type=jnp.float32
    )
    corr = corr / jnp.sqrt(jnp.asarray(c, dtype=corr.dtype))
    # Store the volume in the feature dtype: f32 accumulation on the MXU,
    # bf16 at rest halves the dominant HBM cost (SURVEY §7.3 item 2).
    return corr.astype(fmap1.dtype).reshape(b, h, w, h, w)


def build_corr_pyramid(corr: jnp.ndarray, num_levels: int = 4) -> List[jnp.ndarray]:
    """Average-pool the target dims into a pyramid.

    corr: [B, H, W, H2, W2] -> list of [B*H*W, H2/2^l, W2/2^l, 1]."""
    b, h, w, h2, w2 = corr.shape
    x = corr.reshape(b * h * w, h2, w2, 1)
    pyramid = [x]
    for _ in range(num_levels - 1):
        x = jax.lax.reduce_window(
            x,
            0.0,
            jax.lax.add,
            window_dimensions=(1, 2, 2, 1),
            window_strides=(1, 2, 2, 1),
            padding="VALID",
        ) / 4.0
        pyramid.append(x)
    return pyramid


def _bilinear_gather(volume: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample volume [N, H, W, 1] at float coords [N, P, 2] (x, y).
    Out-of-range samples clamp to the border (zero-padding semantics of the
    original RAFT sampler differ only outside the image; RAFT uses
    align_corners=True grid_sample with zero padding — we use border clamp
    whose gradient/values differ only for coords beyond the edge, where the
    cost values are uninformative anyway).

    Returns [N, P] sampled correlations."""
    n, h, w, _ = volume.shape
    x = coords[..., 0]
    y = coords[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)

    vol = volume[..., 0]  # [N, H, W] — gathered in storage dtype; only the
    # sampled corner values upcast to f32 for the lerp.
    batch_idx = jnp.arange(n)[:, None]

    v00 = vol[batch_idx, y0i, x0i].astype(jnp.float32)
    v01 = vol[batch_idx, y0i, x1i].astype(jnp.float32)
    v10 = vol[batch_idx, y1i, x0i].astype(jnp.float32)
    v11 = vol[batch_idx, y1i, x1i].astype(jnp.float32)

    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


class CorrPyramid:
    """Materialized correlation pyramid with radius lookup.

    Usage:
      pyr = CorrPyramid.build(fmap1, fmap2, num_levels)
      feats = pyr.lookup(flow, radius)   # [B, H, W, num_levels*(2r+1)^2]
    """

    def __init__(self, pyramid: List[jnp.ndarray], shape: Tuple[int, int, int]):
        self.pyramid = pyramid
        self.b, self.h, self.w = shape

    @classmethod
    def build(cls, fmap1: jnp.ndarray, fmap2: jnp.ndarray, num_levels: int = 4):
        b, h, w, _ = fmap1.shape
        corr = all_pairs_correlation(fmap1, fmap2)
        return cls(build_corr_pyramid(corr, num_levels), (b, h, w))

    def lookup(self, flow: jnp.ndarray, radius: int = 4) -> jnp.ndarray:
        """Sample (2r+1)^2 windows around flow-displaced positions at every
        pyramid level.

        flow: [B, H, W, 2] at feature resolution.
        Returns [B, H, W, L*(2r+1)^2] float32."""
        b, h, w, _ = flow.shape
        r = radius
        dx = jnp.arange(-r, r + 1, dtype=jnp.float32)
        dy = jnp.arange(-r, r + 1, dtype=jnp.float32)
        delta = jnp.stack(jnp.meshgrid(dx, dy, indexing="xy"), axis=-1)  # [2r+1, 2r+1, 2]
        delta = delta.reshape(-1, 2)  # [(2r+1)^2, 2]

        ys, xs = jnp.mgrid[0:h, 0:w]
        base = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)  # [H, W, 2]

        out = []
        for lvl, volume in enumerate(self.pyramid):
            # target coords at this level: (x + fx) / 2^lvl + delta
            centroid = (base[None] + flow) / (2.0**lvl)  # [B, H, W, 2]
            coords = centroid[..., None, :] + delta[None, None, None]  # [B,H,W,P,2]
            coords = coords.reshape(b * h * w, -1, 2)
            sampled = _bilinear_gather(volume, coords)
            out.append(sampled.reshape(b, h, w, -1))
        return jnp.concatenate(out, axis=-1)


def corr_feature_dim(num_levels: int, radius: int) -> int:
    return num_levels * (2 * radius + 1) ** 2


def _bilinear_gather_features(fmap: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample feature map [N, H, W, C] at float coords [N, P, 2] (x, y),
    border-clamped.  Returns [N, P, C]."""
    n, h, w, c = fmap.shape
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)

    batch_idx = jnp.arange(n)[:, None]
    v00 = fmap[batch_idx, y0i, x0i]
    v01 = fmap[batch_idx, y0i, x1i]
    v10 = fmap[batch_idx, y1i, x0i]
    v11 = fmap[batch_idx, y1i, x1i]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def _avg_pool_features(fmap: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pool of [B, H, W, C] (VALID, matching the corr-pyramid
    pooling)."""
    return jax.lax.reduce_window(
        fmap,
        0.0,
        jax.lax.add,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    ) / 4.0


class OnTheFlyCorr:
    """Correlation lookup WITHOUT materializing the O((HW)^2) cost volume.

    Identity used: average-pooling the cost volume over its *target* dims
    equals correlating against average-pooled target features, because
    correlation is linear in fmap2:
        avgpool_t(f1 . f2)[q, p] = f1[q] . avgpool(f2)[p]
    (exact, up to float reassociation).  So each pyramid level stores only
    the pooled f2 (tiny), and lookup gathers (2r+1)^2 pooled-feature
    samples around the displaced position and contracts with f1 — the
    memory-efficient sampling of arXiv:2505.16942 (PAPERS.md).

    vs CorrPyramid at feature size HW with P = levels*(2r+1)^2 samples and
    K iterations:
      materialized: build cost = HW*HW*C MACs + storage HW^2 floats
      on-the-fly:   K*HW*P*C MACs, storage HW*P transient
    For 1080p (HW=32400 at 1/8) with P=324, K=12: on-the-fly is ~8x fewer
    MACs and avoids ~4 GB of HBM per volume — it is the 1080p-capable path
    (SURVEY §7.3 item 2).
    """

    def __init__(self, fmap1: jnp.ndarray, pyramid: List[jnp.ndarray]):
        self.fmap1 = fmap1  # [B, H, W, C]
        self.pyramid = pyramid  # pooled f2 per level: [B, H/2^l, W/2^l, C]
        self.scale = 1.0 / jnp.sqrt(jnp.asarray(fmap1.shape[-1], jnp.float32))

    @classmethod
    def build(cls, fmap1: jnp.ndarray, fmap2: jnp.ndarray, num_levels: int = 4):
        pyr = [fmap2]
        for _ in range(num_levels - 1):
            pyr.append(_avg_pool_features(pyr[-1]))
        return cls(fmap1, pyr)

    def lookup(self, flow: jnp.ndarray, radius: int = 4) -> jnp.ndarray:
        """[B, H, W, 2] flow -> [B, H, W, L*(2r+1)^2] correlation features,
        numerically matching CorrPyramid.lookup."""
        b, h, w, _ = flow.shape
        r = radius
        d = jnp.arange(-r, r + 1, dtype=jnp.float32)
        delta = jnp.stack(jnp.meshgrid(d, d, indexing="xy"), axis=-1).reshape(-1, 2)
        p = delta.shape[0]

        ys, xs = jnp.mgrid[0:h, 0:w]
        base = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)

        f1 = self.fmap1.reshape(b, h * w, -1)
        out = []
        for lvl, f2l in enumerate(self.pyramid):
            lh, lw = f2l.shape[1], f2l.shape[2]
            centroid = (base[None] + flow) / (2.0**lvl)
            coords = (centroid[..., None, :] + delta[None, None, None]).reshape(
                b, h * w, p, 2
            )
            x = coords[..., 0]
            y = coords[..., 1]
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            wx = x - x0
            wy = y - y0
            x0i = jnp.clip(x0.astype(jnp.int32), 0, lw - 1)
            x1i = jnp.clip(x0i + 1, 0, lw - 1)
            y0i = jnp.clip(y0.astype(jnp.int32), 0, lh - 1)
            y1i = jnp.clip(y0i + 1, 0, lh - 1)

            # Bilinear interpolation commutes with the feature contraction,
            # so dot each corner separately: peak transient memory is one
            # [B, HW, P, C] gather instead of four.
            bidx = jnp.arange(b)[:, None, None]
            corr = jnp.zeros((b, h * w, p), jnp.float32)
            for yi, xi, wgt in (
                (y0i, x0i, (1 - wx) * (1 - wy)),
                (y0i, x1i, wx * (1 - wy)),
                (y1i, x0i, (1 - wx) * wy),
                (y1i, x1i, wx * wy),
            ):
                v = f2l[bidx, yi, xi]  # [B, HW, P, C]
                # bf16 inputs, f32 accumulation: native MXU shape.
                d = jnp.einsum(
                    "bnc,bnpc->bnp", f1, v, preferred_element_type=jnp.float32
                )
                corr = corr + wgt * d
            out.append((corr * self.scale).reshape(b, h, w, p))
        return jnp.concatenate(out, axis=-1)


def make_corr(
    fmap1: jnp.ndarray,
    fmap2: jnp.ndarray,
    num_levels: int = 4,
    impl: str = "auto",
    materialize_threshold: int = 168 * 168,
):
    """Pick the correlation implementation.

    'auto' materializes the volume wherever it fits (build is one
    MXU-friendly matmul and lookups read scalars — the fast path; covers
    1280x1280 tiles, hw=160x160) and goes on-the-fly only for larger
    feature grids where the full volume would blow HBM (full-frame 4K;
    static decision — shapes are known at trace time).  The on-the-fly
    path trades gather bandwidth for memory; its Pallas fusion is the
    planned fix (SURVEY §7.2 step 4)."""
    if impl == "materialized":
        return CorrPyramid.build(fmap1, fmap2, num_levels)
    if impl == "direct":
        return OnTheFlyCorr.build(fmap1, fmap2, num_levels)
    hw = fmap1.shape[1] * fmap1.shape[2]
    if hw > materialize_threshold:
        return OnTheFlyCorr.build(fmap1, fmap2, num_levels)
    return CorrPyramid.build(fmap1, fmap2, num_levels)
