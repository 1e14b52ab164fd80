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
    # Softmax over k and the convex combination run in the conv-native
    # [B, h, w, 576] channel layout via 9 static 64-wide channel slices:
    # materializing [.., 9, 8, 8] / [.., 8, 8, 2] shapes instead gives
    # XLA minor dims of 8 and 2, which tile at 14.2x / 16x padding
    # (~3 GB of HLO temps at the 1080x1280 bench tile, measured in the
    # WB=2 OOM dump).  All intermediates here keep minor dims >= 64.
    ks = [mask[..., k * 64 : (k + 1) * 64] for k in range(9)]
    mx = ks[0]
    for x in ks[1:]:
        mx = jnp.maximum(mx, x)
    es = [jnp.exp(x - mx) for x in ks]
    inv = 1.0 / sum(es)

    flow8 = 8.0 * flow
    padded = jnp.pad(flow8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ux = jnp.zeros((b, h, w, 64), flow.dtype)
    uy = jnp.zeros((b, h, w, 64), flow.dtype)
    for k in range(9):
        dy, dx = divmod(k, 3)
        wk = es[k] * inv                                  # [B, h, w, 64]
        nb = padded[:, dy : dy + h, dx : dx + w, :]
        ux = ux + wk * nb[..., 0:1]
        uy = uy + wk * nb[..., 1:2]

    # Pixel shuffle [B, h, w, u*8+v] -> [B, 8h, 8w]: transpose with both
    # tiled dims >= 64 first ([.., w, 64] -> [.., 64, w]), then the
    # (v, w) interleave as a free non-minor reshape + one last
    # transpose whose minor dim is w (>= 64).
    def shuffle(x):
        x = x.transpose(0, 1, 3, 2)                       # [B, h, 64, w]
        x = x.reshape(b, h, 8, 8, w)                      # [B, h, u, v, w]
        x = x.transpose(0, 1, 2, 4, 3)                    # [B, h, u, w, v]
        return x.reshape(b, h * 8, w * 8)

    return jnp.stack([shuffle(ux), shuffle(uy)], axis=-1)


def upsample_flow_bilinear(flow: jnp.ndarray, factor: int = 8) -> jnp.ndarray:
    """Plain bilinear 8x upsample (used for intermediate iterations /
    fallback)."""
    b, h, w, c = flow.shape
    out = jax.image.resize(flow, (b, h * factor, w * factor, c), method="bilinear")
    return out * factor
