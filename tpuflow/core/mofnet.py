"""MOFNet / BOFNet — multi-frame optical flow (VideoFlow family) in flax.

Reimplemented TPU-first from the papers (VideoFlow ICCV 2023 via PAPERS.md;
RAFT arXiv:2003.12039), not translated: the reference loads these nets from
a pinned submodule (videoflow_core.py:28,101) and consumes the contract
  model([B, T, 3, H, W] in [0,1]) -> flow predictions, indexed
  [0, mid] -> center-frame forward flow [2, H, W]   (videoflow_core.py:188-195)

Design (per SURVEY §2.2):
- Feature encoder over all T frames (one batched pass: frames fold into the
  batch axis — MXU-friendly, no Python loop over T).
- For each of the N = T-2 interior frames, all-pairs correlation pyramids
  against both neighbors (forward + backward), built as batched einsums.
- `decoder_depth` iterations of a shared SKFlow/GRU update block jointly
  refining forward+backward flows of all interior frames; each iteration
  fuses each frame's motion feature with its temporal neighbors' (the
  multi-frame cue that distinguishes VideoFlow from RAFT).
- Convex 8x upsampling of the final flows.

Shapes are NHWC; interior frames ride the batch axis except in the
temporal-fusion step.  BOFNet is MOFNet with T=3 (one interior frame,
bi-directional output).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .corr import CorrPyramid, DenseCorrPyramid, OnTheFlyCorr, make_corr
from .encoders import make_encoder
from .update import MaskHead, UpdateBlock, upsample_flow_convex

Dtype = Any


class TemporalFusion(nn.Module):
    """Fuse each interior frame's motion feature with its temporal
    neighbors' (zero-padded at the window edges): the multi-frame motion
    propagation of VideoFlow, implemented as a shift+concat+conv along the
    interior-frame axis — one fused conv instead of cross-frame loops."""

    dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, motion_fwd, motion_bwd):
        # motion_*: [B, N, h, w, C]
        prev_f = jnp.pad(motion_fwd, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :-1]
        next_f = jnp.pad(motion_fwd, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))[:, 1:]
        prev_b = jnp.pad(motion_bwd, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :-1]
        next_b = jnp.pad(motion_bwd, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))[:, 1:]
        x = jnp.concatenate([motion_fwd, motion_bwd, prev_f, next_f, prev_b, next_b], axis=-1)
        b, n, h, w, c = x.shape
        x = x.reshape(b * n, h, w, c)
        x = nn.relu(nn.Conv(self.dim * 2, (1, 1), dtype=self.dtype, name="fuse1")(x))
        x = nn.Conv(self.dim, (3, 3), dtype=self.dtype, name="fuse2")(x)
        return x.reshape(b, n, h, w, self.dim)


class _MOFCarry(NamedTuple):
    """lax.scan carry for the refinement loop.  Only the per-iteration
    state lives here — the correlation pyramids and context are broadcast
    (loop-invariant) inputs; putting them in the carry would make XLA
    double-buffer gigabytes of cost volume."""

    flow_fwd: jnp.ndarray
    flow_bwd: jnp.ndarray
    h_fwd: jnp.ndarray
    h_bwd: jnp.ndarray
    motion_fwd: jnp.ndarray
    motion_bwd: jnp.ndarray


def _corr_state(corr) -> Tuple:
    """Flatten a correlation object into an arrays-only pytree (static
    shape info is reconstructed from the query grid — ints in a scan
    input would get traced)."""
    if isinstance(corr, OnTheFlyCorr):
        return (corr.fmap1, tuple(corr.pyramid))
    return (None, tuple(corr.pyramid))


def _corr_from_state(state: Tuple, impl: str, grid: Tuple[int, int, int]):
    """grid: (N_queries, h, w) of the query feature grid (== target grid
    for the self-shaped volumes used here)."""
    if impl == "OnTheFlyCorr":
        return OnTheFlyCorr(state[0], list(state[1]))
    n, h, w = grid
    if impl == "DenseCorrPyramid":
        return DenseCorrPyramid(list(state[1]), (n, h, w), (h, w))
    return CorrPyramid(list(state[1]), (n, h, w), (h, w))


class _MOFIteration(nn.Module):
    """One refinement iteration (scanned body): temporal fusion + shared
    bidirectional SKFlow/GRU update."""

    hidden_dim: int
    corr_radius: int
    corr_impl: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry: "_MOFCarry", consts):
        inp, corr_fwd_state, corr_bwd_state = consts
        b, n, h8, w8, _c = carry.motion_fwd.shape
        grid = (b * n, h8, w8)
        corr_fwd = _corr_from_state(corr_fwd_state, self.corr_impl, grid)
        corr_bwd = _corr_from_state(corr_bwd_state, self.corr_impl, grid)

        fusion = TemporalFusion(128, dtype=self.dtype, name="temporal_fusion")
        update = UpdateBlock(self.hidden_dim, use_sk=True, dtype=self.dtype, name="update")
        # Direction embedding lets the shared update block distinguish
        # forward from backward passes.
        dir_embed = self.param(
            "dir_embed", nn.initializers.normal(0.02), (2, 128), jnp.float32
        )

        fused = fusion(carry.motion_fwd, carry.motion_bwd).reshape(b * n, h8, w8, 128)

        cf = corr_fwd.lookup(carry.flow_fwd, self.corr_radius).astype(self.dtype)
        h_fwd, m_f, d_f = update(
            carry.h_fwd, inp, cf, carry.flow_fwd,
            fused + dir_embed[0].astype(self.dtype),
        )
        flow_fwd = carry.flow_fwd + d_f.astype(jnp.float32)

        cb = corr_bwd.lookup(carry.flow_bwd, self.corr_radius).astype(self.dtype)
        h_bwd, m_b, d_b = update(
            carry.h_bwd, inp, cb, carry.flow_bwd,
            fused + dir_embed[1].astype(self.dtype),
        )
        flow_bwd = carry.flow_bwd + d_b.astype(jnp.float32)

        new_carry = carry._replace(
            flow_fwd=flow_fwd,
            flow_bwd=flow_bwd,
            h_fwd=h_fwd,
            h_bwd=h_bwd,
            motion_fwd=m_f.reshape(b, n, h8, w8, -1),
            motion_bwd=m_b.reshape(b, n, h8, w8, -1),
        )
        return new_carry, None


class MOFNet(nn.Module):
    """Multi-frame optical flow network.

    Call with frames [B, T, H, W, 3] (RGB in [0, 1], T >= 3).
    Returns (flows_fwd, flows_bwd): each [B, T-2, H, W, 2] full-res flows
    of the interior frames.
    """

    corr_levels: int = 4
    corr_radius: int = 4
    decoder_depth: int = 12
    feature_dim: int = 256
    hidden_dim: int = 128
    context_dim: int = 128
    encoder: str = "cnn"             # 'cnn' | 'twins'
    corr_dtype: Any = jnp.bfloat16   # cost-volume storage dtype (HBM saver)
    corr_impl: str = "auto"          # 'auto' | 'materialized' | 'direct'
    scan_iters: bool = True          # lax.scan the refinement loop
                                     # (False = Python unroll: needed for
                                     # reverse-mode AD through the
                                     # broadcast correlation constants)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, frames: jnp.ndarray):
        b, t, h, w, _ = frames.shape
        n = t - 2
        assert t >= 3, "MOFNet needs at least 3 frames"
        h8, w8 = h // 8, w // 8

        x = 2.0 * frames - 1.0

        # ---- encoders (all frames / interior frames fold into batch) ----
        fnet = make_encoder(self.encoder, self.feature_dim, "instance", self.dtype)
        feats = fnet(x.reshape(b * t, h, w, 3))
        feats = feats.reshape(b, t, h8, w8, self.feature_dim)

        cnet = make_encoder(self.encoder, self.hidden_dim + self.context_dim, "batch", self.dtype)
        ctx = cnet(x[:, 1 : t - 1].reshape(b * n, h, w, 3))
        hidden = jnp.tanh(ctx[..., : self.hidden_dim])
        inp = nn.relu(ctx[..., self.hidden_dim :])

        # ---- correlation pyramids: interior frame vs both neighbors ----
        center = feats[:, 1 : t - 1].reshape(b * n, h8, w8, -1)
        fwd_tgt = feats[:, 2:t].reshape(b * n, h8, w8, -1)
        bwd_tgt = feats[:, 0 : t - 2].reshape(b * n, h8, w8, -1)

        corr_fwd = make_corr(
            center.astype(self.corr_dtype), fwd_tgt.astype(self.corr_dtype),
            self.corr_levels, self.corr_impl,
        )
        corr_bwd = make_corr(
            center.astype(self.corr_dtype), bwd_tgt.astype(self.corr_dtype),
            self.corr_levels, self.corr_impl,
        )

        # ---- iterative refinement (lax.scan over iterations: shared
        # weights, one compiled iteration body, buffers reused) ----
        iter_kwargs = dict(
            hidden_dim=self.hidden_dim,
            corr_radius=self.corr_radius,
            corr_impl=type(corr_fwd).__name__,
            dtype=self.dtype,
            name="iteration",
        )
        if self.scan_iters:
            step = nn.scan(
                _MOFIteration,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=nn.broadcast,  # loop-invariant: corr pyramids + context
                length=self.decoder_depth,
            )(**iter_kwargs)
        else:
            step = _MOFIteration(**iter_kwargs)

        carry = _MOFCarry(
            flow_fwd=jnp.zeros((b * n, h8, w8, 2), jnp.float32),
            flow_bwd=jnp.zeros((b * n, h8, w8, 2), jnp.float32),
            h_fwd=hidden,
            h_bwd=hidden,
            motion_fwd=jnp.zeros((b, n, h8, w8, 128), self.dtype),
            motion_bwd=jnp.zeros((b, n, h8, w8, 128), self.dtype),
        )
        consts = (inp, _corr_state(corr_fwd), _corr_state(corr_bwd))
        if self.scan_iters:
            carry, _ = step(carry, consts)
        else:
            for _ in range(self.decoder_depth):
                carry, _ = step(carry, consts)
        flow_fwd, flow_bwd = carry.flow_fwd, carry.flow_bwd

        mask_head = MaskHead(dtype=self.dtype, name="mask_head")
        mask_fwd = mask_head(carry.h_fwd)
        mask_bwd = mask_head(carry.h_bwd)

        up_fwd = upsample_flow_convex(flow_fwd, mask_fwd.astype(jnp.float32))
        up_bwd = upsample_flow_convex(flow_bwd, mask_bwd.astype(jnp.float32))
        return (
            up_fwd.reshape(b, n, h, w, 2),
            up_bwd.reshape(b, n, h, w, 2),
        )


class BOFNet(MOFNet):
    """Bi-directional 3-frame variant (CLI `--vf-architecture bof`,
    flow_processor.py:1329-1330): identical machinery, T is fixed at 3 by
    the caller so there is exactly one interior frame whose forward and
    backward flows are returned."""
