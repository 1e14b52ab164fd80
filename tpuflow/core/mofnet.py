"""MOFNet / BOFNet — multi-frame optical flow (VideoFlow family) in flax.

Upstream-faithful reimplementation (VideoFlow ICCV 2023, SKFlow NeurIPS
2022, GMA ICCV 2021 — PAPERS.md): the reference loads these nets from a
pinned submodule (videoflow_core.py:28,101) and consumes the contract
  model([B, T, 3, H, W] in [0,1]) -> flow predictions, indexed
  [0, mid] -> center-frame forward flow [2, H, W]   (videoflow_core.py:188-195)

Architecture (matches the MOF_*.pth checkpoint layout leaf-for-leaf so
runtime/convert.py can map real weights):
- fnet / cnet: twins_svt_large truncated to 2 stages (encoders.TwinsSVT)
  or the RAFT BasicEncoder (cfg.cnet/fnet 'basicencoder').
- att: GMA attention over the context features, computed once per window.
- update_block: SKUpdateBlock6_Deep_nopoolres_AllDecoder2 (sk.py) — one
  JOINT bidirectional refinement step: shared hidden state, 4-channel
  delta flow, 48-channel motion hidden state shifted across interior
  frames each iteration (the multi-frame motion propagation), GMA
  aggregation of motion features.
- convex 8x upsample with the update block's own 2x(64*9)-channel mask.

TPU-first execution:
- all T frames fold into the batch axis for the encoders,
- correlation pyramids are batched MXU einsums with a gather-free
  one-hot-matmul radius lookup (core/corr.py),
- GMA attention probabilities are loop-invariant and materialized once
  per window when they fit HBM (gma.materialize_attention); bigger grids
  use the chunked recompute path,
- the refinement loop is a lax.scan whose correlation/context constants
  are broadcast (not carried — carrying would double-buffer GBs),
- the forward SPLITS into `encode` (encoders + volumes + attention) and
  `refine` (the iteration loop): the runtime engine jits the two halves
  separately so the multi-GB volumes cross the boundary as jit ARGUMENTS.
  XLA assigns argument buffers a compact layout the lookup einsums read
  directly; the same volumes as jit-internal temps get a padded tiled
  layout whose per-use relayout copies measured ~8x on the whole loop
  (benchmarks/lookup_variants.py).

Shapes are NHWC.  BOFNet is MOFNet with T=3 (one interior frame).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .corr import (
    BandCorrPyramid,
    CorrPyramid,
    DenseCorrPyramid,
    FlashCorr,
    FlashCorr2,
    OnTheFlyCorr,
    make_corr,
)
from .encoders import make_encoder
from .gma import Attention, materialize_attention
from .sk import SKUpdateBlockMOF
from .update import upsample_flow_convex

Dtype = Any


class _MOFCarry(NamedTuple):
    """lax.scan carry for the refinement loop.  Only the per-iteration
    state lives here — the correlation pyramids, context and attention
    q/k are broadcast (loop-invariant) inputs; putting them in the carry
    would make XLA double-buffer gigabytes of cost volume."""

    flow: jnp.ndarray                 # [B*N, h, w, 4] fwd ++ bwd (f32)
    net: jnp.ndarray                  # [B*N, h, w, 128] shared hidden
    motion_hidden_state: jnp.ndarray  # [B, N, h, w, 48]
    mask: jnp.ndarray                 # [B*N, h, w, 2*64*9] (last iter's)


class MOFEncoded(NamedTuple):
    """Arrays-only output of MOFNet.encode — the jit-boundary pytree the
    engine feeds to MOFNet.refine (see module docstring on why the split
    exists).  Static shape info is reconstructed from the array shapes."""

    inp: jnp.ndarray                   # [B*N, h, w, 128] context
    net: jnp.ndarray                   # [B*N, h, w, 128] initial hidden
    q: jnp.ndarray                     # [B*N, h, w, 128]
    k: jnp.ndarray                     # [B*N, h, w, 128]
    attn: Optional[jnp.ndarray]        # [B*N, hw, hw] or None
    corr_fwd: Tuple                    # (fmap1 | None, pyramid tuple)
    corr_bwd: Tuple
    batch: jnp.ndarray                 # [B] dummy carrying the window count


def _corr_state(corr) -> Tuple:
    """Flatten a correlation object into an arrays-only pytree."""
    if isinstance(corr, FlashCorr):
        dense = tuple(corr.dense.pyramid) if corr.dense is not None else ()
        return (corr.fmap1, tuple(corr.flash_pyr), dense)
    if isinstance(corr, FlashCorr2):
        return (corr.fmap1, tuple(corr.packed_pyr))
    if isinstance(corr, OnTheFlyCorr):
        return (corr.fmap1, tuple(corr.pyramid))
    return (None, tuple(corr.pyramid))


def _is_pair_states(state: Tuple) -> bool:
    """True when `state` is a tuple of PER-PAIR corr states (one per
    interior frame) rather than a single batched state.  Batched states
    start with an array or None (fmap1 slot); per-pair states are tuples
    of such tuples."""
    return bool(state) and all(isinstance(s, tuple) for s in state)


def _corr_from_state(state: Tuple, grid: Tuple[int, int, int]):
    """Rebuild the correlation object from its arrays-only state.  The
    implementation is inferred structurally: FlashCorr is a 3-tuple;
    OnTheFly carries fmap1; DenseCorrPyramid levels are grouped 3D
    [N, nh, gw]; CorrPyramid levels are flat 2D [N, lh*lw]."""
    n, h, w = grid
    if len(state) == 3:
        fmap1, flash_pyr, dense_pyr = state
        dense = None
        if dense_pyr:
            dense = DenseCorrPyramid(
                list(dense_pyr), (n, h, w), (h, w), level_offset=len(flash_pyr)
            )
        return FlashCorr(fmap1, list(flash_pyr), dense)
    fmap1, pyramid = state
    if fmap1 is not None:
        # Pooled 4D target features -> OnTheFly; packed 3D -> FlashCorr2.
        if pyramid[0].ndim == 4:
            return OnTheFlyCorr(fmap1, list(pyramid))
        return FlashCorr2(fmap1, list(pyramid))
    if pyramid[0].ndim == 4:
        return BandCorrPyramid(list(pyramid), (n, h, w), (h, w))
    if pyramid[0].ndim == 3:
        return DenseCorrPyramid(list(pyramid), (n, h, w), (h, w))
    return CorrPyramid(list(pyramid), (n, h, w), (h, w))


class _MOFIteration(nn.Module):
    """One refinement iteration (scanned body): bidirectional correlation
    lookup + one joint SK update."""

    hidden_dim: int
    corr_levels: int
    corr_radius: int
    dtype: Any = jnp.float32
    gma_impl: str = "auto"
    dense_lookup: str = "auto"   # DenseCorrPyramid formulation policy
                                 # (corr.DenseCorrPyramid.lookup)
    lookup_mesh: Any = None      # jax.sharding.Mesh: shard_map the Pallas
                                 # lookup kernel per-shard under DP (the
                                 # Mosaic custom call is never GSPMD-
                                 # partitioned; corr._lookup_kernel)

    def _lookup(self, corr, flow):
        if isinstance(corr, DenseCorrPyramid):
            return corr.lookup(
                flow, self.corr_radius, impl=self.dense_lookup,
                mesh=self.lookup_mesh,
            )
        return corr.lookup(flow, self.corr_radius)

    @nn.compact
    def __call__(self, carry: "_MOFCarry", consts):
        inp, q, k, attn, corr_fwd_state, corr_bwd_state = consts
        bn, h8, w8, _ = carry.net.shape

        if _is_pair_states(corr_fwd_state):
            # Per-pair cached volumes (engine stride-1 path): each
            # interior frame j carries its own (center_j, target) corr
            # state, built ONCE per frame pair and reused by every
            # window the pair appears in (VERDICT r3 weak #2).  The
            # lookup cost is linear in the query count, so N per-pair
            # lookups cost what one batched lookup does; outputs
            # re-interleave to the (window, interior) batch order.
            npair = len(corr_fwd_state)
            m = bn // npair
            grid = (m, h8, w8)
            f4 = carry.flow.reshape(m, npair, h8, w8, 4)

            def pair_lookup(states, chan):
                outs = [
                    self._lookup(
                        _corr_from_state(s, grid),
                        f4[:, j, :, :, chan : chan + 2],
                    ).astype(self.dtype)
                    for j, s in enumerate(states)
                ]
                return jnp.stack(outs, axis=1).reshape(bn, h8, w8, -1)

            cf = pair_lookup(corr_fwd_state, 0)
            cb = pair_lookup(corr_bwd_state, 2)
        else:
            grid = (bn, h8, w8)
            corr_fwd = _corr_from_state(corr_fwd_state, grid)
            corr_bwd = _corr_from_state(corr_bwd_state, grid)
            cf = self._lookup(corr_fwd, carry.flow[..., 0:2]).astype(self.dtype)
            cb = self._lookup(corr_bwd, carry.flow[..., 2:4]).astype(self.dtype)
        corr = jnp.concatenate([cf, cb], axis=-1)

        update = SKUpdateBlockMOF(
            hidden_dim=self.hidden_dim,
            corr_levels=self.corr_levels,
            corr_radius=self.corr_radius,
            dtype=self.dtype,
            gma_impl=self.gma_impl,
            name="update_block",
        )
        net, mhs, mask, delta = update(
            carry.net, carry.motion_hidden_state, inp, corr, carry.flow, q, k,
            carry.motion_hidden_state.shape[0], attn,
        )
        flow = carry.flow + delta.astype(jnp.float32)
        return _MOFCarry(flow=flow, net=net, motion_hidden_state=mhs, mask=mask), None


class MOFNet(nn.Module):
    """Multi-frame optical flow network.

    Call with frames [B, T, H, W, 3] (RGB in [0, 1], T >= 3).
    Returns (flows_fwd, flows_bwd): each [B, T-2, H, W, 2] full-res flows
    of the interior frames.

    `encode` / `refine` expose the two halves for the engine's split-jit
    execution (see module docstring); `__call__` chains them.
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
    dense_lookup: str = "auto"       # dense radius-lookup formulation:
                                     # 'auto' (fused Pallas kernel on
                                     # TPU, XLA elsewhere) | 'xla' |
                                     # 'pallas' | 'patch'
    lookup_mesh: Any = None          # jax.sharding.Mesh under DP: kernel
                                     # calls run inside shard_map so the
                                     # Mosaic custom call sees per-shard
                                     # batches (GSPMD cannot partition a
                                     # custom call; VERDICT r4 #5)
    gma_impl: str = "auto"           # GMA apply: 'auto' (flash on TPU,
                                     # materialize/chunk elsewhere) |
                                     # 'flash' | 'xla' (see gma.Aggregate)
    scan_iters: bool = True          # lax.scan the refinement loop
                                     # (False = Python unroll: needed for
                                     # reverse-mode AD through the
                                     # broadcast correlation constants)
    attn_mem_budget: int = 3 * 10**9  # materialize softmax(qk^T) only when
                                     # the [BN, hw, hw] bf16 matrix fits
                                     # this many bytes.  HBM is shared
                                     # with the cost volumes: past ~13 GB
                                     # total, XLA's remat-with-compression
                                     # re-layouts the volumes every
                                     # iteration (~8x on the loop), so a
                                     # too-generous budget is a net loss.
    dtype: Dtype = jnp.float32

    def setup(self):
        # Attribute names become the param scopes the checkpoint name
        # tables target (runtime/convert.py): fnet / cnet / att /
        # iteration.update_block.
        self.fnet = make_encoder(
            self.encoder, self.feature_dim, "instance", self.dtype
        )
        self.cnet = make_encoder(
            self.encoder, self.hidden_dim + self.context_dim, "batch", self.dtype
        )
        self.att = Attention(
            dim=self.context_dim, dim_head=self.context_dim, dtype=self.dtype
        )
        iter_kwargs = dict(
            hidden_dim=self.hidden_dim,
            corr_levels=self.corr_levels,
            corr_radius=self.corr_radius,
            dtype=self.dtype,
            gma_impl=self.gma_impl,
            dense_lookup=self.dense_lookup,
            lookup_mesh=self.lookup_mesh,
        )
        if self.scan_iters:
            self.iteration = nn.scan(
                _MOFIteration,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=nn.broadcast,  # loop-invariant: corr pyramids + context
                length=self.decoder_depth,
            )(**iter_kwargs)
        else:
            self.iteration = _MOFIteration(**iter_kwargs)

    def frame_features(self, frames: jnp.ndarray):
        """Per-frame encoder features: [M, H, W, 3] in [0, 1] ->
        (fnet feats [M, h8, w8, Cf], cnet ctx [M, h8, w8, 256]).

        Both encoders are strictly per-frame, so at stride-1 consecutive
        windows share T-1 of T frames and the engine caches these outputs
        per frame instead of recomputing them per window
        (engine.compute_flows_tiled_stride1)."""
        m, h, w, _ = frames.shape
        h8, w8 = h // 8, w // 8
        x = 2.0 * frames - 1.0

        # Big grids run the encoders one frame at a time: the f32
        # normalization intermediates of a frame-batched encoder at
        # full-frame 2160p are ~2.5 GB each and OOM the chip.
        def run_enc(enc, xs):
            if h8 * w8 <= 168 * 168:
                return enc(xs)
            return jnp.concatenate(
                [enc(xs[i : i + 1]) for i in range(xs.shape[0])], axis=0
            )

        return run_enc(self.fnet, x), run_enc(self.cnet, x)

    def prepare_context(self, ctx_f: jnp.ndarray):
        """Per-frame window-independent context state: one frame's cnet
        output [M, h8, w8, 256] -> (net, inp, q, k), each [M, h8, w8, .].

        tanh/relu split and the GMA q/k projections are strictly
        per-pixel (1x1 convs), so at stride-1 the engine computes them
        once per frame and reuses them in every window the frame
        interiors (the reference recomputes att(inp) per window,
        VideoFlow MOFNetStack forward; VERDICT r3 weak #2)."""
        net = jnp.tanh(ctx_f[..., : self.hidden_dim])
        inp = nn.relu(ctx_f[..., self.hidden_dim :])
        q, k = self.att(inp)
        return net, inp, q, k

    def pair_corr_state(self, center: jnp.ndarray, target: jnp.ndarray) -> Tuple:
        """Correlation pyramid for ONE (center, target) frame pair:
        [M, h8, w8, C] each -> arrays-only corr state.  The volume
        depends only on the frame pair, not the window — the engine's
        stride-1 loop builds each pair once and shares it across the
        (T-1) windows that contain it (the reference rebuilds all T-2
        neighbor volumes per window, videoflow_processor.py:189-229)."""
        corr = make_corr(
            center.astype(self.corr_dtype),
            target.astype(self.corr_dtype),
            self.corr_levels,
            self.corr_impl,
        )
        return _corr_state(corr)

    def refine_pairs(self, prepared: Tuple, corr_fwd: Tuple, corr_bwd: Tuple):
        """Refine from per-frame prepared context + per-pair corr states.

        prepared: tuple over the N interior frames of (net, inp, q, k)
          as returned by prepare_context, each [M, h8, w8, .].
        corr_fwd/corr_bwd: tuples over N of pair_corr_state outputs.

        Numerics identical to encode+refine (the batched build computes
        the same per-pair einsums; stacking only reorders batch rows).
        The stacks here are small loop-invariant [M*N, h8, w8, 128]
        copies; the multi-GB volumes pass through UNTOUCHED as the
        cached per-pair buffers (no relayout: aligned shapes have a
        single layout)."""
        n = len(prepared)
        m = prepared[0][0].shape[0]

        def stack(i):
            # [M, N, ...] -> [M*N, ...]: (window, interior) batch order,
            # matching encode_from_features' reshape.
            return jnp.stack([p[i] for p in prepared], axis=1).reshape(
                (m * n,) + prepared[0][i].shape[1:]
            )

        encoded = MOFEncoded(
            inp=stack(1),
            net=stack(0),
            q=stack(2),
            k=stack(3),
            attn=None,
            corr_fwd=corr_fwd,
            corr_bwd=corr_bwd,
            batch=jnp.zeros((m,), jnp.int8),
        )
        return self.refine(encoded)

    def encode_from_features(self, feats: jnp.ndarray, ctx: jnp.ndarray) -> MOFEncoded:
        """Window assembly from per-frame features: feats [B, T, h8, w8,
        Cf], ctx [B, T, h8, w8, 256] (only interiors 1..T-2 of ctx are
        consumed) -> the refine-ready encoded state."""
        b, t = feats.shape[:2]
        n = t - 2
        h8, w8 = feats.shape[2], feats.shape[3]

        ctx_i = ctx[:, 1 : t - 1].reshape(b * n, h8, w8, -1)
        net = jnp.tanh(ctx_i[..., : self.hidden_dim])
        inp = nn.relu(ctx_i[..., self.hidden_dim :])

        # GMA attention q/k: once per window (upstream computes `att(inp)`
        # outside the loop too); probabilities materialized when they fit.
        q, k = self.att(inp)

        # Correlation pyramids: interior frame vs both neighbors.
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

        return MOFEncoded(
            inp=inp,
            net=net,
            q=q,
            k=k,
            attn=None,  # materialized in refine (same jit as its consumer)
            corr_fwd=_corr_state(corr_fwd),
            corr_bwd=_corr_state(corr_bwd),
            batch=jnp.zeros((b,), jnp.int8),
        )

    def encode(self, frames: jnp.ndarray) -> MOFEncoded:
        """Encoders + correlation volumes: everything the refinement loop
        consumes read-only.  frames [B, T, H, W, 3] in [0, 1].

        One-shot path: cnet runs on interior frames only (the cached
        stride-1 path computes per-frame features once and assembles
        windows via encode_from_features instead)."""
        b, t, h, w, _ = frames.shape
        n = t - 2
        assert t >= 3, "MOFNet needs at least 3 frames"
        h8, w8 = h // 8, w // 8
        x = 2.0 * frames - 1.0

        def run_enc(enc, xs):
            if h8 * w8 <= 168 * 168:
                return enc(xs)
            return jnp.concatenate(
                [enc(xs[i : i + 1]) for i in range(xs.shape[0])], axis=0
            )

        feats = run_enc(self.fnet, x.reshape(b * t, h, w, 3))
        feats = feats.reshape(b, t, h8, w8, self.feature_dim)
        ctx_i = run_enc(self.cnet, x[:, 1 : t - 1].reshape(b * n, h, w, 3))
        # Pad ctx to per-frame layout (edge frames unused downstream).
        pad = jnp.zeros((b, 1, h8, w8, ctx_i.shape[-1]), ctx_i.dtype)
        ctx = jnp.concatenate(
            [pad, ctx_i.reshape(b, n, h8, w8, -1), pad], axis=1
        )
        return self.encode_from_features(feats, ctx)

    def refine(self, encoded: MOFEncoded):
        """Iterative refinement + convex upsample from the encoded state."""
        bn, h8, w8, _ = encoded.net.shape
        b = encoded.batch.shape[0]
        n = bn // b

        # Loop-invariant GMA probabilities, materialized here — in the
        # SAME jit as the iteration loop — when they fit the budget;
        # bigger grids keep the chunked recompute inside Aggregate.
        attn = encoded.attn
        hw = h8 * w8
        # With the flash kernel the probabilities are recomputed in VMEM
        # each application — materializing them would only burn HBM.
        use_flash = self.gma_impl == "flash" or (
            self.gma_impl == "auto" and jax.default_backend() == "tpu"
        )
        if (
            attn is None
            and not use_flash
            and bn * hw * hw * 2 <= self.attn_mem_budget
        ):
            attn = materialize_attention(encoded.q, encoded.k, out_dtype=self.dtype)

        carry = _MOFCarry(
            flow=jnp.zeros((bn, h8, w8, 4), jnp.float32),
            net=encoded.net,
            motion_hidden_state=jnp.zeros((b, n, h8, w8, 48), self.dtype),
            mask=jnp.zeros((bn, h8, w8, 2 * 64 * 9), self.dtype),
        )
        consts = (
            encoded.inp, encoded.q, encoded.k, attn,
            encoded.corr_fwd, encoded.corr_bwd,
        )
        if self.scan_iters:
            carry, _ = self.iteration(carry, consts)
        else:
            for _ in range(self.decoder_depth):
                carry, _ = self.iteration(carry, consts)

        mask = carry.mask.astype(jnp.float32)
        up_fwd = upsample_flow_convex(carry.flow[..., 0:2], mask[..., : 64 * 9])
        up_bwd = upsample_flow_convex(carry.flow[..., 2:4], mask[..., 64 * 9 :])
        h, w = 8 * h8, 8 * w8
        return (
            up_fwd.reshape(b, n, h, w, 2),
            up_bwd.reshape(b, n, h, w, 2),
        )

    def __call__(self, frames: jnp.ndarray):
        return self.refine(self.encode(frames))


class BOFNet(MOFNet):
    """Bi-directional 3-frame variant (CLI `--vf-architecture bof`,
    flow_processor.py:1329-1330): identical machinery, T is fixed at 3 by
    the caller so there is exactly one interior frame whose forward and
    backward flows are returned.  (Upstream BOFNetStack shares this
    update-block family; its checkpoints map via the same name tables.)"""
