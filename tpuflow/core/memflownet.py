"""MemFlowNet — streaming optical flow with a motion-memory buffer, in flax.

Reimplemented TPU-first from the MemFlow paper (arXiv:2404.04808 via
PAPERS.md).  The reference drives the upstream net through an isolated
subprocess that rebuilds the model and discards memory every frame
(memflow_inference_isolated.py:92-126) — the single biggest anti-pattern
SURVEY §3.3 calls out.  Here the memory buffer is an explicit fixed-capacity
pytree designed to be a `lax.scan` carry, so streaming video runs as one
compiled scan with O(1) state:

- Two-frame SKFlow-style backbone (features + context + correlation
  pyramid + GRU refinement).
- At each iteration, the current motion feature cross-attends (per spatial
  position, over the time axis of the buffer) to the memory of past motion
  features; the aggregated readout joins the GRU input.
- After the final iteration the frame's (key, value) motion summary is
  written into the ring buffer.

Static shapes throughout: the buffer has fixed capacity with a validity
mask, so `scan` compiles once regardless of video length.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple  # noqa: F401

import flax.linen as nn
import jax
import jax.numpy as jnp

from .corr import CorrPyramid, DenseCorrPyramid, OnTheFlyCorr, make_corr
from .encoders import make_encoder
from .update import MaskHead, UpdateBlock, upsample_flow_convex

Dtype = Any


class MemoryState(NamedTuple):
    """Ring buffer of per-position motion keys/values for past frames.

    keys:   [B, cap, h*w, dk]
    values: [B, cap, h*w, dv]
    valid:  [B, cap]  (1.0 where the slot holds a real frame)
    ptr:    [B]       (next write slot)
    """

    keys: jnp.ndarray
    values: jnp.ndarray
    valid: jnp.ndarray
    ptr: jnp.ndarray


def init_memory(
    batch: int, capacity: int, hw: int, key_dim: int, value_dim: int, dtype=jnp.float32
) -> MemoryState:
    return MemoryState(
        keys=jnp.zeros((batch, capacity, hw, key_dim), dtype),
        values=jnp.zeros((batch, capacity, hw, value_dim), dtype),
        valid=jnp.zeros((batch, capacity), dtype),
        ptr=jnp.zeros((batch,), jnp.int32),
    )


def memory_write(mem: MemoryState, key: jnp.ndarray, value: jnp.ndarray) -> MemoryState:
    """Ring-buffer write at `ptr` (per batch element), static-shaped."""
    b, cap = mem.valid.shape
    slot = mem.ptr % cap  # [B]
    onehot = jax.nn.one_hot(slot, cap, dtype=mem.keys.dtype)  # [B, cap]
    keys = mem.keys * (1 - onehot)[..., None, None] + onehot[..., None, None] * key[:, None]
    values = (
        mem.values * (1 - onehot)[..., None, None] + onehot[..., None, None] * value[:, None]
    )
    valid = jnp.maximum(mem.valid, onehot.astype(mem.valid.dtype))
    return MemoryState(keys=keys, values=values, valid=valid, ptr=mem.ptr + 1)


class MemoryReader(nn.Module):
    """Per-position cross-attention over the memory's time axis.

    query from the current motion feature: [B, hw, dk]
    keys/values: [B, cap, hw, dk/dv]; softmax over cap with validity mask.
    An empty memory returns zeros (first frame)."""

    key_dim: int = 64
    value_dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, motion: jnp.ndarray, mem: MemoryState):
        # motion: [B, h, w, C]
        b, h, w, c = motion.shape
        q = nn.Dense(self.key_dim, dtype=self.dtype, name="q_proj")(motion)
        q = q.reshape(b, h * w, self.key_dim)

        # scores over time: [B, cap, hw]
        scale = 1.0 / jnp.sqrt(jnp.asarray(self.key_dim, jnp.float32))
        scores = jnp.einsum(
            "bnd,bknd->bkn", q.astype(jnp.float32), mem.keys.astype(jnp.float32)
        ) * scale
        neg = jnp.asarray(-1e9, jnp.float32)
        scores = jnp.where(mem.valid[:, :, None] > 0, scores, neg)
        attn = jax.nn.softmax(scores, axis=1)
        # Zero out readout entirely when no slot is valid.
        any_valid = (jnp.sum(mem.valid, axis=1, keepdims=True) > 0)[..., None]
        attn = jnp.where(any_valid, attn, 0.0)

        read = jnp.einsum("bkn,bknd->bnd", attn, mem.values.astype(jnp.float32))
        read = read.reshape(b, h, w, self.value_dim).astype(self.dtype)
        return nn.Conv(128, (1, 1), dtype=self.dtype, name="out_proj")(read)


class _MemCarry(NamedTuple):
    """Scan carry for the MemFlow refinement loop — per-iteration state
    only; correlation pyramids / context / memory are broadcast
    (loop-invariant) inputs so XLA never double-buffers them."""

    flow: jnp.ndarray
    h: jnp.ndarray
    motion: jnp.ndarray


def _corr_state(corr) -> Tuple:
    """Arrays-only pytree (shape info reconstructed from the query grid)."""
    if isinstance(corr, OnTheFlyCorr):
        return (corr.fmap1, tuple(corr.pyramid))
    return (None, tuple(corr.pyramid))


def _corr_from_state(state: Tuple, impl: str, grid: Tuple[int, int, int]):
    if impl == "OnTheFlyCorr":
        return OnTheFlyCorr(state[0], list(state[1]))
    if impl == "DenseCorrPyramid":
        n, h, w = grid
        return DenseCorrPyramid(list(state[1]), (n, h, w), (h, w))
    n, h, w = grid
    return CorrPyramid(list(state[1]), (n, h, w), (h, w))


class _MemIteration(nn.Module):
    """One scanned refinement iteration: memory read + GRU update."""

    hidden_dim: int
    corr_radius: int
    corr_impl: str
    key_dim: int
    value_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry: "_MemCarry", consts):
        inp, corr_state, memory = consts
        b, h8, w8 = carry.motion.shape[:3]
        corr = _corr_from_state(corr_state, self.corr_impl, (b, h8, w8))
        reader = MemoryReader(
            self.key_dim, self.value_dim, dtype=self.dtype, name="memory_reader"
        )
        update = UpdateBlock(self.hidden_dim, use_sk=True, dtype=self.dtype, name="update")

        mem_read = reader(carry.motion, memory)
        cf = corr.lookup(carry.flow, self.corr_radius).astype(self.dtype)
        h, motion, delta = update(carry.h, inp, cf, carry.flow, mem_read)
        flow = carry.flow + delta.astype(jnp.float32)
        return carry._replace(flow=flow, h=h, motion=motion), None


class MemFlowNet(nn.Module):
    """Streaming two-frame flow with motion memory.

    `__call__(frame_pair, memory, flow_init=None)` where
      frame_pair: [B, 2, H, W, 3] RGB in [0, 1]
      memory: MemoryState (use `init_memory` for frame 0)
    returns (flow [B, H, W, 2], new_memory).
    """

    corr_levels: int = 4
    corr_radius: int = 4
    decoder_depth: int = 12
    feature_dim: int = 256
    hidden_dim: int = 128
    context_dim: int = 128
    key_dim: int = 64
    value_dim: int = 128
    memory_capacity: int = 8
    encoder: str = "cnn"
    corr_dtype: Any = jnp.bfloat16
    corr_impl: str = "auto"
    scan_iters: bool = True   # False = Python unroll (needed for AD)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        frame_pair: jnp.ndarray,
        memory: MemoryState,
        flow_init: Optional[jnp.ndarray] = None,
    ):
        b, two, h, w, _ = frame_pair.shape
        h8, w8 = h // 8, w // 8

        # Reference normalizes MemFlow inputs to [-1, 1]
        # (memflow_inference_isolated.py:80-85).
        x = 2.0 * frame_pair - 1.0

        fnet = make_encoder(self.encoder, self.feature_dim, "instance", self.dtype)
        feats = fnet(x.reshape(b * 2, h, w, 3)).reshape(b, 2, h8, w8, -1)

        cnet = make_encoder(self.encoder, self.hidden_dim + self.context_dim, "batch", self.dtype)
        ctx = cnet(x[:, 0])
        hidden = jnp.tanh(ctx[..., : self.hidden_dim])
        inp = nn.relu(ctx[..., self.hidden_dim :])

        corr = make_corr(
            feats[:, 0].astype(self.corr_dtype),
            feats[:, 1].astype(self.corr_dtype),
            self.corr_levels,
            self.corr_impl,
        )

        k_proj = nn.Dense(self.key_dim, dtype=self.dtype, name="k_proj")
        v_proj = nn.Dense(self.value_dim, dtype=self.dtype, name="v_proj")

        flow = (
            jnp.zeros((b, h8, w8, 2), jnp.float32)
            if flow_init is None
            else flow_init.astype(jnp.float32)
        )

        iter_kwargs = dict(
            hidden_dim=self.hidden_dim,
            corr_radius=self.corr_radius,
            corr_impl=type(corr).__name__,
            key_dim=self.key_dim,
            value_dim=self.value_dim,
            dtype=self.dtype,
            name="iteration",
        )
        if self.scan_iters:
            step = nn.scan(
                _MemIteration,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=nn.broadcast,
                length=self.decoder_depth,
            )(**iter_kwargs)
        else:
            step = _MemIteration(**iter_kwargs)
        carry = _MemCarry(
            flow=flow,
            h=hidden,
            motion=jnp.zeros((b, h8, w8, 128), self.dtype),
        )
        consts = (inp, _corr_state(corr), memory)
        if self.scan_iters:
            carry, _ = step(carry, consts)
        else:
            for _ in range(self.decoder_depth):
                carry, _ = step(carry, consts)
        flow, hcur, motion = carry.flow, carry.h, carry.motion
        mask = MaskHead(dtype=self.dtype, name="mask_head")(hcur)

        # Memory write: per-position key/value summaries of the final motion.
        key = k_proj(motion).reshape(b, h8 * w8, self.key_dim)
        value = v_proj(motion).reshape(b, h8 * w8, self.value_dim)
        new_memory = memory_write(
            memory, key.astype(memory.keys.dtype), value.astype(memory.values.dtype)
        )

        flow_up = upsample_flow_convex(flow, mask.astype(jnp.float32))
        return flow_up, new_memory, flow  # full-res flow, memory, 1/8-res flow

    def empty_memory(self, batch: int, h: int, w: int) -> MemoryState:
        return init_memory(
            batch,
            self.memory_capacity,
            (h // 8) * (w // 8),
            self.key_dim,
            self.value_dim,
        )
