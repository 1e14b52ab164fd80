"""Flow upsampling (RAFT-family convex 8x + bilinear fallback).

The iterative update blocks themselves live in core/sk.py
(SKFlow/VideoFlow lineage — the architecture the reference's checkpoints
actually contain); this module keeps the upsampling math both model
families share (RAFT §3.3; consumed at videoflow_core.py:193-195 /
memflow via its InferenceCore).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample_flow_convex(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Convex upsampling 8x (RAFT §3.3).

    flow: [B, h, w, 2] at 1/8 resolution (values in 1/8-res pixels).
    mask: [B, h, w, 576] = 9 weights per upsampled position (8x8 block),
          channel c = k*64 + u*8 + v (upstream F.unfold/view order — the
          converter relies on this for the mask head's weights).
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
