"""FlowEngine: the jit-compiled inference engine.

Replaces the reference's L1-L3 stack (VideoFlowCore/Processor/Inference,
MemFlowCore/... — SURVEY §1) with one engine that:

- compiles window->flow once per (shape, batch) bucket and caches the
  executable (the reference re-enters eager torch per frame; MemFlow even
  re-builds the model per frame via subprocess,
  memflow_inference_isolated.py:45-126),
- pads to multiple-of-8 *inside* jit (InputPadder semantics,
  videoflow_core.py:182-191) so host code never touches the tensors,
- batches windows over frames and tiles over a batch axis (the reference
  loops tiles in Python, videoflow_processor.py:258),
- streams MemFlow with carried memory as a lax.scan
  (the reference resets memory every frame — SURVEY §3.3),
- optionally shards the window batch across a device mesh (DP over
  frames/tiles; SURVEY §2.4).

Reference-parity contracts kept:
- centered window + edge replication, middle-frame forward flow
  (videoflow_processor.py:122-147, videoflow_core.py:193-195)
- trailing window for MemFlow (memflow_processor.py:97-139)
- [-1,1] input normalization for MemFlow vs [0,1] for VideoFlow
  (memflow_inference_isolated.py:80-85) — handled inside the models
- tile grid 1280x1280 row-major hard paste (videoflow_processor.py:73-110)
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, TILE_SIZE
from ..core.memflownet import MemFlowNet, MemoryState, init_memory
from ..core.mofnet import BOFNet, MOFNet
from ..core.padding import pad_dims
from .tiles import (
    calculate_tile_grid,
    extract_tile_batch,
    extract_tile_group,
    group_tiles_by_shape,
    paste_tile_flows,
    resolve_tile_layout,
)
from .windows import all_window_indices, centered_window_indices, trailing_window_indices

# Sentinel checkpoint path: explicit opt-in to random weights (benchmarks,
# throughput tests — weight-independent workloads).
RANDOM_INIT = "__random_init__"


def default_compute_dtype():
    """bf16 on accelerators (MXU-native), f32 on CPU (tests/parity)."""
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "cpu"
    return jnp.float32 if backend == "cpu" else jnp.bfloat16


def build_model(cfg: ModelConfig, encoder: Optional[str] = None, dtype=None,
                dense_lookup: str = "auto", mesh=None):
    """`encoder=None` follows cfg.encoder (default 'twins' — the upstream
    checkpoint-parity backbone, videoflow_core.py:101-110).
    `dense_lookup`: DenseCorrPyramid formulation policy ('auto' = fused
    Pallas kernel on TPU).  `mesh`: an active jax.sharding.Mesh — the
    kernel then runs inside shard_map per shard, because GSPMD cannot
    partition the Mosaic custom call (corr._lookup_kernel docstring)."""
    encoder = encoder or cfg.encoder
    kw = dict(
        corr_levels=cfg.corr_levels,
        corr_radius=cfg.corr_radius,
        decoder_depth=cfg.decoder_depth,
        feature_dim=cfg.feature_dim,
        hidden_dim=cfg.hidden_dim,
        context_dim=cfg.context_dim,
        encoder=encoder,
        corr_impl=cfg.corr_impl,
        dense_lookup=dense_lookup,
        lookup_mesh=mesh,
        dtype=dtype or default_compute_dtype(),
    )
    if cfg.model == "memflow":
        return MemFlowNet(
            memory_capacity=cfg.memory_capacity, use_rope=cfg.use_rope, **kw
        )
    if cfg.architecture == "bof":
        return BOFNet(**kw)
    return MOFNet(**kw)


class FlowEngine:
    """Compiled optical-flow engine for both model families."""

    def __init__(
        self,
        config: ModelConfig,
        encoder: Optional[str] = None,
        params=None,
        seed: int = 0,
        device: Optional[jax.Device] = None,
        mesh=None,
        dtype=None,
    ):
        """`mesh`: optional jax.sharding.Mesh with a 'data' axis — window
        batches are sharded over it (DP over frames/tiles, SURVEY §2.4);
        params replicate.  None = single-device.  `dtype`: compute dtype
        (default bf16 on accelerators, f32 on CPU)."""
        self.config = config
        # Under a mesh the dense lookup keeps the fused Pallas kernel:
        # kernel calls are shard_map'd over the mesh's data axis (per-
        # shard batches; no GSPMD partitioning of the custom call) —
        # VERDICT r4 #5, validated in tests/test_sharding.py (8-dev CPU
        # interpret) + benchmarks/check_denselookup_tpu.py --mesh.
        self.model = build_model(config, encoder, dtype, mesh=mesh)
        self.params = params
        self.seed = seed
        self.device = device
        self.mesh = mesh
        self._loaded = False
        self._fwd_cache: Dict = {}
        self._stream_cache: Dict = {}

    # ------------------------------------------------------------------
    # model loading
    # ------------------------------------------------------------------
    def load_model(
        self,
        checkpoint_path: Optional[str] = None,
        allow_random_init: bool = False,
    ) -> str:
        """Initialize parameters from a converted torch checkpoint
        (checkpoint naming contract: videoflow_core.py:79-85,
        flow_processor.py:66-67).

        A missing checkpoint raises FileNotFoundError like the reference
        (videoflow_core.py:97-98) unless `allow_random_init=True` (or the
        RANDOM_INIT sentinel path) explicitly opts into deterministic
        random weights — silent random init would let garbage flows be
        written into (and later reused from) the per-frame cache."""
        if self.params is not None:
            self._loaded = True
            return "preloaded"
        if checkpoint_path in (RANDOM_INIT, "__bench_random_init__"):
            checkpoint_path, allow_random_init = None, True
        path = checkpoint_path or self.config.checkpoint_path
        import os

        if path and os.path.exists(path):
            from .checkpoint import is_native_checkpoint, load_params

            if is_native_checkpoint(path):
                # Native format: the torch conversion ran once and was
                # saved via runtime/checkpoint.save_params; reload
                # without torch, validated against the init tree.
                self.params = load_params(path, self.init_params())
                self._loaded = True
                return path

            from .convert import load_torch_checkpoint_as_params

            # Raises on low checkpoint->param match rate rather than
            # silently running converted-in-name-only weights.
            self.params = load_torch_checkpoint_as_params(path, self)
            self._loaded = True
            return path

        if not allow_random_init:
            raise FileNotFoundError(
                f"Model file not found: {path}. Download the checkpoint or "
                "pass allow_random_init=True to run with random weights "
                "(outputs will be meaningless; they are still cached)."
            )
        # Random init on tiny shapes (params are shape-independent for
        # conv/attention nets).
        self.params = self.init_params()
        self._loaded = True
        return f"random-init (checkpoint not found: {path})"

    def init_params(self, h: int = 64, w: int = 64):
        """Random init at tiny spatial dims (conv/attention params are
        shape-independent); jitted so the init is one compiled program
        instead of hundreds of eager dispatches."""
        rng = jax.random.PRNGKey(self.seed)
        if self.config.model == "memflow":
            pair = jnp.zeros((1, 2, h, w, 3), jnp.float32)
            mem = self.model.empty_memory(1, h, w)
            return jax.jit(self.model.init)(rng, pair, mem)
        t = max(3, self.config.sequence_length)
        frames = jnp.zeros((1, t, h, w, 3), jnp.float32)
        return jax.jit(self.model.init)(rng, frames)

    def is_model_loaded(self) -> bool:
        return self._loaded

    # ------------------------------------------------------------------
    # compiled forwards
    # ------------------------------------------------------------------
    def _videoflow_forward(self, h: int, w: int):
        """[B, T, h, w, 3] u8/f32 -> [B, h, w, 2] middle-frame forward
        flow (reference stride-1 semantics, videoflow_core.py:193-195)."""
        key = ("vf", h, w)
        if key in self._fwd_cache:
            return self._fwd_cache[key]

        fwd_all = self._videoflow_forward_all(h, w)
        mid = jax.jit(lambda flows: flows[:, flows.shape[1] // 2])

        def fwd(params, windows):
            return mid(fwd_all(params, windows))

        self._fwd_cache[key] = fwd
        return fwd

    def _videoflow_forward_all(self, h: int, w: int):
        """[B, T, h, w, 3] -> [B, T-2, h, w, 2]: forward flows of ALL
        interior frames.  The reference throws away all but the middle
        one (videoflow_core.py:193-195); keeping them gives a T-2 x
        throughput stride mode.

        Single-device: compiled as TWO chained jits — encode (encoders +
        cost volumes + attention) and refine (iteration loop) — so the
        multi-GB volumes cross the boundary as jit arguments.  XLA gives
        argument buffers a compact layout the lookup reads directly; the
        same volumes as jit-internal temps get padded tiled layouts whose
        per-iteration relayout copies measured ~8x on the refinement loop
        (core/mofnet.py docstring, benchmarks/lookup_variants.py).  The
        encoded state is donated to the refine jit.  Mesh (DP) runs keep
        the one-jit path: sharding propagation stays explicit there and
        multi-chip runs shard the batch, shrinking per-device volumes
        below the regime where the relayout pathology bites."""
        key = ("vf_all", h, w)
        if key in self._fwd_cache:
            return self._fwd_cache[key]

        pt, pb, pl, pr = pad_dims(h, w, 8)
        model = self.model

        def prep(windows):
            x = windows.astype(jnp.float32)
            if windows.dtype == jnp.uint8:  # static at trace time
                x = x / 255.0
            return jnp.pad(
                x, ((0, 0), (0, 0), (pt, pb), (pl, pr), (0, 0)), mode="edge"
            )

        if self.mesh is not None:
            from .sharding import batch_sharding, replicated

            def fwd_mesh(params, windows):
                fwd_flows, _ = model.apply(params, prep(windows))
                return fwd_flows[:, :, pt : pt + h, pl : pl + w]

            fwd = jax.jit(
                fwd_mesh,
                in_shardings=(replicated(self.mesh), batch_sharding(self.mesh, 5)),
                out_shardings=batch_sharding(self.mesh, 5),
            )
        else:
            # Two chained jits with DEFAULT layouts everywhere.  This is
            # safe because the cost-volume levels are stored tile-ALIGNED
            # (corr.py): an aligned shape has a single possible layout,
            # so the boundary moves the multi-GB pyramids with zero
            # relayout copies — volumes as jit-internal temps of a single
            # big jit instead get padded tiled copies that XLA's
            # remat-compression re-expands EVERY scan iteration (~8x on
            # the loop + OOM at 1080p; see MOFNet docstring).  Small 4D
            # leaves (context etc.) may relayout once inside refine —
            # tens of MB, outside the loop.
            enc = jax.jit(
                lambda params, windows: model.apply(
                    params, prep(windows), method="encode"
                )
            )
            ref = jax.jit(
                lambda params, encoded: model.apply(
                    params, encoded, method="refine"
                )[0][:, :, pt : pt + h, pl : pl + w],
            )

            def fwd(params, windows):
                return ref(params, enc(params, windows))

            fwd.enc, fwd.ref = enc, ref  # exposed for profiling

        self._fwd_cache[key] = fwd
        return fwd

    def compute_flows_strided(
        self, frames: Sequence[np.ndarray], window_batch: int = 2
    ) -> np.ndarray:
        """Flows for EVERY frame at interior stride: windows advance by
        T-2 frames and every interior flow is kept — (T-2)x fewer forward
        passes than the reference's stride-1 middle-frame loop, same
        model, same per-frame window membership up to alignment."""
        if not self._loaded:
            raise RuntimeError("Model not loaded. Call load_model() first.")
        arr = np.asarray(frames)
        n, h, w = arr.shape[:3]
        t = self.config.sequence_length
        stride = t - 2

        # Every dispatched batch is padded up to window_batch, so keeping
        # window_batch itself a multiple of the mesh's data axis keeps the
        # shard split even (same policy as compute_flow_batch).
        if self.mesh is not None:
            d = self.mesh.shape.get("data", 1)
            window_batch += (-window_batch) % d

        starts = list(range(-1, n - 1, stride))
        fwd = self._videoflow_forward_all(h, w)
        flows = np.empty((n, h, w, 2), np.float32)

        for b0 in range(0, len(starts), window_batch):
            chunk = starts[b0 : b0 + window_batch]
            pad_n = window_batch - len(chunk)
            idx = np.stack(
                [np.clip(np.arange(a, a + t), 0, n - 1) for a in chunk]
                + [np.zeros(t, np.int64)] * pad_n
            )
            out = np.asarray(fwd(self.params, jnp.asarray(arr[idx])))
            for j, a in enumerate(chunk):
                for k in range(stride):
                    frame = a + 1 + k
                    if 0 <= frame < n:
                        flows[frame] = out[j, k]
        return flows

    def _memflow_step(self, h: int, w: int):
        """Jitted single step: (params, pair [B,2,h,w,3], memory) ->
        (flow [B,h,w,2], memory')."""
        key = ("mf", h, w)
        if key in self._fwd_cache:
            return self._fwd_cache[key]

        pt, pb, pl, pr = pad_dims(h, w, 8)
        model = self.model

        @jax.jit
        def step(params, pair, memory):
            x = pair.astype(jnp.float32)
            if pair.dtype == jnp.uint8:
                x = x / 255.0
            x = jnp.pad(x, ((0, 0), (0, 0), (pt, pb), (pl, pr), (0, 0)), mode="edge")
            flow, memory, flow_low = model.apply(params, x, memory)
            return flow[:, pt : pt + h, pl : pl + w], memory, flow_low

        self._fwd_cache[key] = step
        return step

    def _memflow_scan(self, n: int, h: int, w: int, warm_start: bool):
        """Jitted scan over n frames: frames [n,h,w,3] -> flows [n,h,w,2]
        with memory carried across the whole clip (the reference's missed
        opportunity — SURVEY §3.3)."""
        key = ("mfscan", n, h, w, warm_start)
        if key in self._stream_cache:
            return self._stream_cache[key]

        pt, pb, pl, pr = pad_dims(h, w, 8)
        ph, pw = h + pt + pb, w + pl + pr
        model = self.model

        @jax.jit
        def scan_fn(params, frames):
            x = frames.astype(jnp.float32)
            x = x / 255.0 if frames.dtype == jnp.uint8 else x
            x = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)), mode="edge")

            mem0 = init_memory(
                1,
                model.memory_capacity,
                (ph // 8) * (pw // 8),
                model.key_dim,
                model.value_dim,
            )
            flow0 = jnp.zeros((1, ph // 8, pw // 8, 2), jnp.float32)

            # Pair for frame i is (i-1, i); frame 0 pairs with itself
            # (trailing-window front replication,
            # memflow_processor.py:97-139).  Frames are indexed inside the
            # scan instead of materializing a [n, 2, ...] pair tensor
            # (which would double the clip's device footprint).
            def step(carry, i):
                mem, prev_low = carry
                prev = jax.lax.dynamic_index_in_dim(
                    x, jnp.maximum(i - 1, 0), 0, keepdims=False
                )
                cur = jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False)
                pair = jnp.stack([prev, cur])[None]  # [1, 2, ph, pw, 3]
                init = prev_low if warm_start else None
                flow, mem, flow_low = model.apply(params, pair, mem, init)
                # Carried-state guard (see memflownet.CARRY_CLAMP): the
                # warm-start flow rides the carry like the memory tokens.
                from ..core.memflownet import CARRY_CLAMP

                flow_low = jnp.clip(flow_low, -CARRY_CLAMP, CARRY_CLAMP)
                return (mem, flow_low), flow[0]

            _, flows = jax.lax.scan(
                step, (mem0, flow0), jnp.arange(n, dtype=jnp.int32)
            )
            return flows[:, pt : pt + h, pl : pl + w]

        self._stream_cache[key] = scan_fn
        return scan_fn

    # ------------------------------------------------------------------
    # public API (numpy in / numpy out)
    # ------------------------------------------------------------------
    def compute_flow(self, frames: Sequence[np.ndarray], frame_idx: int) -> np.ndarray:
        """Reference-parity single-frame flow [H, W, 2]
        (flow_inference.py:24 / memflow_inference.py:20 contract)."""
        return self.compute_flow_batch(frames, [frame_idx])[0]

    def compute_flow_batch(
        self, frames: Sequence[np.ndarray], frame_indices: Sequence[int]
    ) -> np.ndarray:
        """Batch of per-frame flows: windows ride the batch axis."""
        if not self._loaded:
            raise RuntimeError("Model not loaded. Call load_model() first.")
        n = len(frames)
        h, w = frames[0].shape[:2]
        arr = np.asarray(frames)

        if self.config.model == "memflow":
            # Reference parity: fresh memory + last-2-frames step per call
            # (memflow_inference_isolated.py:92-107).  Streaming with real
            # memory is `stream_flows`.
            step = self._memflow_step(h, w)
            pt, pb, pl, pr = pad_dims(h, w, 8)
            length = max(2, self.config.sequence_length)
            out = []
            for idx in frame_indices:
                win = trailing_window_indices(n, idx, length)
                pair = arr[win[-2:]][None]  # [1, 2, h, w, 3]
                mem = self.model.empty_memory(1, h + pt + pb, w + pl + pr)
                flow, _, _ = step(self.params, jnp.asarray(pair), mem)
                out.append(np.asarray(flow[0]))
            return np.stack(out)

        t = self.config.sequence_length
        wins = np.stack(
            [centered_window_indices(n, i, t) for i in frame_indices]
        )  # [B, T]
        windows = arr[wins]  # [B, T, h, w, 3]

        # Pad the batch to a multiple of the mesh's data axis so the shard
        # split is even; padded windows replicate the last one.
        pad_n = 0
        if self.mesh is not None:
            d = self.mesh.shape.get("data", 1)
            pad_n = (-len(windows)) % d
            if pad_n:
                windows = np.concatenate([windows, np.repeat(windows[-1:], pad_n, 0)])

        fwd = self._videoflow_forward(h, w)
        flows = np.asarray(fwd(self.params, jnp.asarray(windows)))
        return flows[: len(flows) - pad_n] if pad_n else flows

    def compute_flow_tiled(
        self,
        frames: Sequence[np.ndarray],
        frame_idx: int,
        tile_size: int = TILE_SIZE,
        overlap: int = 0,
        tile_batch: int = 4,
    ) -> np.ndarray:
        """Tile-mode flow: tiles batched through the compiled forward
        instead of a Python loop (videoflow_processor.py:231-283 ->
        SURVEY §7.4), grouped by their ACTUAL shape so shrunken edge tiles
        are computed at their own size like the reference does
        (videoflow_processor.py:112-120) — at 1080p this is ~1.6x fewer
        FLOPs than padding every tile to the 1280 square.  overlap=0
        reproduces the hard paste."""
        if not self._loaded:
            raise RuntimeError("Model not loaded. Call load_model() first.")
        if self.config.model == "memflow":
            # MemFlow's "tiled" path is full-frame for interface parity
            # (memflow_processor.py:183-245: fake single-tile grid).
            return self.compute_flow(frames, frame_idx)
        h, w = frames[0].shape[:2]
        if h <= tile_size and w <= tile_size:
            return self.compute_flow(frames, frame_idx)

        if self.mesh is not None:
            d = self.mesh.shape.get("data", 1)
            tile_batch += (-tile_batch) % d

        _, _, _, _, tiles_info = calculate_tile_grid(
            w, h, tile_size, layout=resolve_tile_layout()
        )
        t = self.config.sequence_length
        n = len(frames)
        win = centered_window_indices(n, frame_idx, t)
        window_frames = np.asarray(frames)[win]  # [T, H, W, 3]

        tile_flows: List = [None] * len(tiles_info)
        for (th, tw), idxs in group_tiles_by_shape(tiles_info).items():
            tiles = extract_tile_group(window_frames, tiles_info, idxs, overlap)
            fwd = self._videoflow_forward(th + 2 * overlap, tw + 2 * overlap)
            d = self.mesh.shape.get("data", 1) if self.mesh is not None else 1
            for i in range(0, len(tiles), tile_batch):
                chunk = tiles[i : i + tile_batch]
                kept = len(chunk)
                # Pad only to the mesh's data axis (not to tile_batch: that
                # would multiply the work of small shape groups).  Remainder
                # batches cost at most one extra compile per group shape.
                pad_n = (-kept) % d
                if pad_n:
                    chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad_n, 0)])
                flows = np.asarray(fwd(self.params, jnp.asarray(chunk)))
                for j in range(kept):
                    tile_flows[idxs[i + j]] = flows[j]
        return paste_tile_flows(tile_flows, tiles_info, w, h, tile_size, overlap)

    def _videoflow_stride1_fns(self, th: int, tw: int):
        """Jit trio for the feature-cached stride-1 path: per-frame
        features, window assembly from features, and the refine+mid-slice
        (see compute_flows_tiled_stride1)."""
        key = ("vf_s1", th, tw)
        if key in self._fwd_cache:
            return self._fwd_cache[key]
        pt, pb, pl, pr = pad_dims(th, tw, 8)
        model = self.model
        t = self.config.sequence_length
        mid = (t - 2) // 2

        def prep(x):  # [G, th, tw, 3]
            xf = x.astype(jnp.float32)
            if x.dtype == jnp.uint8:
                xf = xf / 255.0
            return jnp.pad(xf, ((0, 0), (pt, pb), (pl, pr), (0, 0)), mode="edge")

        feat_j = jax.jit(
            lambda p, x: model.apply(p, prep(x), method="frame_features")
        )

        def assemble(x):
            """Window assembly INSIDE the jit: x is either the stacked
            [wb*G, T, h, w, C] array (back-compat) or a tuple of wb*T
            per-frame [G, h, w, C] arrays (window-major).  The tuple
            form moves the per-window stack/concat from eager ops into
            the encode program — each eager jnp op in the product loop
            is its own compiled-program dispatch, and the host-side
            launch overhead measured ~8% of the steady-state window
            (bench 1528 vs jit-sum 1409 ms; docs/ROUND5_NOTES.md)."""
            if isinstance(x, (tuple, list)):
                wb = len(x) // t
                return jnp.concatenate(
                    [jnp.stack(x[k * t : (k + 1) * t], axis=1) for k in range(wb)]
                )
            return x

        enc_j = jax.jit(
            lambda p, f, c: model.apply(
                p, assemble(f), assemble(c), method="encode_from_features"
            )
        )
        ref_j = jax.jit(
            lambda p, e: model.apply(p, e, method="refine")[0][
                :, mid, pt : pt + th, pl : pl + tw
            ]
        )
        self._fwd_cache[key] = (feat_j, enc_j, ref_j)
        return self._fwd_cache[key]

    def _videoflow_pair_fns(self, th: int, tw: int):
        """Jit quartet for the PAIR-CACHED stride-1 path: per-frame
        encoder features, per-frame context prep (net/inp/q/k), per-pair
        correlation build, and refine-from-pairs + mid-slice.

        vs the _videoflow_stride1_fns trio this additionally caches the
        window-independent halves of the window assembly: the corr
        volumes depend only on the frame PAIR (interior j's fwd volume
        targets j+1, bwd targets j-1) and net/inp/q/k only on the frame
        — at stride-1 each interior appears in up to T-2 windows, so the
        trio rebuilt them up to 3x each (VERDICT r3 weak #2)."""
        key = ("vf_pair", th, tw)
        if key in self._fwd_cache:
            return self._fwd_cache[key]
        pt, pb, pl, pr = pad_dims(th, tw, 8)
        model = self.model
        t = self.config.sequence_length
        mid = (t - 2) // 2

        def prep(x):  # [M, th, tw, 3]
            xf = x.astype(jnp.float32)
            if x.dtype == jnp.uint8:
                xf = xf / 255.0
            return jnp.pad(xf, ((0, 0), (pt, pb), (pl, pr), (0, 0)), mode="edge")

        feat_j = jax.jit(
            lambda p, x: model.apply(p, prep(x), method="frame_features")
        )
        prep_j = jax.jit(
            lambda p, ctx: model.apply(p, ctx, method="prepare_context")
        )
        pair_j = jax.jit(
            lambda p, a, b: model.apply(p, a, b, method="pair_corr_state")
        )
        ref_j = jax.jit(
            lambda p, prepared, cf, cb: model.apply(
                p, prepared, cf, cb, method="refine_pairs"
            )[0][:, mid, pt : pt + th, pl : pl + tw]
        )
        self._fwd_cache[key] = (feat_j, prep_j, pair_j, ref_j)
        return self._fwd_cache[key]

    def _clamp_window_batch(self, wb: int, t: int, groups) -> int:
        """Clamp the stride-1 window batch so the materialized dense
        correlation volumes of one dispatch fit HBM.

        wb > 1 with dense volumes is a CAPACITY question, not a fusion
        one: at the 1080p bench tile one window's volumes are ~7.5 GB
        (2 directions x T-2 interiors), so a WB=2 refine presents
        16.46 GB of volume ARGUMENTS to a 15.75 GB chip and XLA
        rightly refuses (measured breakdown: docs/ROUND4_NOTES.md §9).
        Rather than hard-fail, clamp to what fits and warn; paths that
        keep no volumes (flash2, and 'auto' above the materialize
        threshold) are not clamped."""
        if wb <= 1:
            return wb
        from ..core.corr import dense_volume_bytes

        impl = self.config.corr_impl
        budget = float(os.environ.get("TPUFLOW_WB_HBM_BUDGET", 11e9))
        per_dev = max(
            1, self.mesh.shape.get("data", 1) if self.mesh is not None else 1
        )
        worst = 0
        for (th, tw), idxs in groups.items():
            h8, w8 = -(-th // 8), -(-tw // 8)
            materializes = impl in ("dense", "materialized", "band") or (
                impl == "auto" and h8 * w8 <= 168 * 168
            )
            if not materializes:
                continue
            per_win = 2 * (t - 2) * len(idxs) * dense_volume_bytes(h8, w8)
            if impl == "band":
                per_win = int(per_win * 1.7)  # band layout padding factor
            worst = max(worst, per_win)
        if worst == 0:
            return wb
        fit = max(1, int(budget // worst) * per_dev)
        if self.mesh is not None:  # keep divisibility by the data axis
            fit = max(per_dev, fit - fit % per_dev)
        if fit < wb:
            print(
                f"[tpuflow] window_batch {wb} -> {fit}: dense correlation "
                f"volumes are ~{worst / 1e9:.1f} GB per window and must fit "
                f"HBM (budget {budget / 1e9:.0f} GB; override via "
                f"TPUFLOW_WB_HBM_BUDGET or corr_impl='flash2')."
            )
            return fit
        return wb

    def compute_flows_tiled_stride1(
        self,
        frames: Sequence[np.ndarray],
        tile_size: int = TILE_SIZE,
        overlap: int = 0,
        progress_cb=None,
        window_batch: int = 1,
    ) -> np.ndarray:
        """Stride-1 tile-mode flows for EVERY frame with per-frame feature
        reuse.

        Reference semantics (one centered window per output frame,
        middle-frame flow — videoflow_core.py:193-195), same outputs as
        calling compute_flow_tiled per frame; but fnet/cnet are strictly
        per-frame, and at stride-1 consecutive windows share T-1 of T
        frames — so each frame's per-tile encoder features are computed
        ONCE and kept in a rolling device-side cache, and windows
        assemble from cached features (MOFNet.encode_from_features).
        Saves ~(T-1)/T of all encoder work across a clip."""
        if not self._loaded:
            raise RuntimeError("Model not loaded. Call load_model() first.")
        arr = np.asarray(frames)
        n, h, w = arr.shape[:3]
        t = self.config.sequence_length
        if self.config.model == "memflow" or (
            h <= tile_size and w <= tile_size
        ):
            return np.stack(
                [
                    self.compute_flow_tiled(frames, i, tile_size, overlap)
                    for i in range(n)
                ]
            )

        wb = max(1, window_batch)
        if self.mesh is not None:
            # Mesh-aware stride-1 (VERDICT r3 weak #3): keep the
            # per-frame feature cache and shard the WINDOW batch over
            # 'data' — windows stack window-major along the tile-group
            # batch dim, so dim 0 (= wb * ntiles) splits evenly when wb
            # is a multiple of the data axis.  Features are computed
            # once per frame on the default device (encoder is ~7% of a
            # window; the sharded refine is the 83%) and scattered as
            # part of the enc_j dispatch.  Pair-volume reuse stays a
            # single-device feature: sharing one pair across windows of
            # a batch would mean replicating volumes device-wise.
            d = self.mesh.shape.get("data", 1)
            wb = max(wb, d) + (-max(wb, d)) % d
        elif wb == 1 and os.environ.get("TPUFLOW_STRIDE1", "trio") == "pairs":
            # Pair-cached loop (VERDICT r3 weak #2) — MEASURED SLOWER on
            # the bench workload (0.41 vs 0.64 f/s, docs/ROUND4_NOTES.md):
            # the per-pair batch-1 lookups inside refine_pairs cost more
            # than the volume-rebuild they save (trio's batched enc_j
            # builds all 6 volumes in ~160 ms/window total).  Kept gated
            # for the numerics tests and as the substrate for future
            # cross-window reuse work; not the product default.
            return self._stride1_pairs_loop(
                arr, tile_size, overlap, progress_cb
            )
        _, _, _, _, tiles_info = calculate_tile_grid(
            w, h, tile_size, layout=resolve_tile_layout()
        )
        groups = group_tiles_by_shape(tiles_info)
        wb = self._clamp_window_batch(wb, t, groups)
        make_fns = self._videoflow_stride1_fns
        caches: Dict = {shape: {} for shape in groups}
        flows_out = np.empty((n, h, w, 2), np.float32)

        def finalize(outs, dev_group_flows):
            # D2H fetch + paste + progress for one window batch — runs
            # AFTER the next batch has been dispatched (see `pending`).
            tile_flows: List[List] = [
                [None] * len(tiles_info) for _ in outs
            ]
            for idxs, group_dev in dev_group_flows:
                group_flows = np.asarray(group_dev)
                ntile = len(idxs)
                for k in range(len(outs)):
                    for j, ti in enumerate(idxs):
                        tile_flows[k][ti] = group_flows[k * ntile + j]
            for k, i in enumerate(outs):
                flows_out[i] = paste_tile_flows(
                    tile_flows[k], tiles_info, w, h, tile_size, overlap
                )
                if progress_cb is not None:
                    progress_cb(i, flows_out[i])

        pending = None
        for i0 in range(0, n, wb):
            outs = list(range(i0, min(n, i0 + wb)))
            wins = [centered_window_indices(n, i, t) for i in outs]
            if self.mesh is not None and len(wins) < wb:
                # Pad the tail batch so the sharded dim splits evenly;
                # padded windows replicate the last one and are dropped.
                wins = wins + [wins[-1]] * (wb - len(wins))
            dev_group_flows = []
            for shape, idxs in groups.items():
                feat_j, enc_j, ref_j = make_fns(*shape)
                cache = caches[shape]
                needed = dict.fromkeys(f for win in wins for f in win)
                for f in needed:  # unique, ordered
                    if f not in cache:
                        tiles = extract_tile_group(
                            arr[f : f + 1], tiles_info, idxs, overlap
                        )[:, 0]
                        cache[f] = feat_j(self.params, jnp.asarray(tiles))
                # Evict frames that can no longer appear in a window.
                low = max(0, i0 - t)
                for f in [f for f in cache if f < low]:
                    del cache[f]
                # Windows of this batch stack along the tile-group batch
                # dim (window-major) — one encode+refine dispatch covers
                # wb windows; HBM headroom set by the corr impl (flash2
                # keeps no volumes, so wb>1 fits where dense would not).
                # Single-device: pass the per-frame cached features as a
                # TUPLE and let enc_j stack them inside the jit (no
                # eager stack/concat dispatches per window).  Mesh: the
                # stacked array must exist eagerly to device_put with
                # the batch sharding.
                if self.mesh is not None:
                    from .sharding import batch_sharding

                    bs = batch_sharding(self.mesh, 5)
                    feats_w = jax.device_put(
                        jnp.concatenate(
                            [
                                jnp.stack([cache[f][0] for f in win], axis=1)
                                for win in wins
                            ]
                        ),
                        bs,
                    )
                    ctx_w = jax.device_put(
                        jnp.concatenate(
                            [
                                jnp.stack([cache[f][1] for f in win], axis=1)
                                for win in wins
                            ]
                        ),
                        bs,
                    )
                else:
                    feats_w = tuple(cache[f][0] for win in wins for f in win)
                    ctx_w = tuple(cache[f][1] for win in wins for f in win)
                dev_group_flows.append(
                    (idxs, ref_j(self.params, enc_j(self.params, feats_w, ctx_w)))
                )
            # Dispatch is PIPELINED one batch deep (VERDICT r3 weak #4):
            # batch i0's refine is in flight before batch i0-wb's flows
            # are fetched/pasted, so the device never idles on the
            # host's D2H + paste + cache write.
            if pending is not None:
                finalize(*pending)
            pending = (outs, dev_group_flows)
        if pending is not None:
            finalize(*pending)
        return flows_out

    def _stride1_pairs_loop(
        self,
        arr: np.ndarray,
        tile_size: int,
        overlap: int,
        progress_cb=None,
    ) -> np.ndarray:
        """The pair-cached stride-1 product loop (window_batch=1 path of
        compute_flows_tiled_stride1; outputs identical to the trio loop
        and to per-frame compute_flow_tiled).

        Steady state per output frame and tile group: ONE feat_j+prep_j
        (the window's new frame), TWO pair_j builds (the new interior's
        fwd/bwd volumes — the other 4 pairs are cache hits), one ref_j.
        The trio path rebuilt all 6 volumes + q/k per window.

        Dispatch is PIPELINED one window deep: window i's refine is
        dispatched before window i-1's flows are fetched/pasted, so the
        device never idles on the host's D2H + paste + cache write
        (VERDICT r3 weak #4: the old loop's per-group np.asarray
        serialized fetch into the dispatch path)."""
        n, h, w = arr.shape[:3]
        t = self.config.sequence_length
        _, _, _, _, tiles_info = calculate_tile_grid(
            w, h, tile_size, layout=resolve_tile_layout()
        )
        groups = group_tiles_by_shape(tiles_info)
        fcaches: Dict = {shape: {} for shape in groups}  # f -> (feats, prepared)
        pcaches: Dict = {shape: {} for shape in groups}  # (a,b) -> corr state
        flows_out = np.empty((n, h, w, 2), np.float32)

        def finalize(i, dev_tile_flows):
            tile_flows: List = [None] * len(tiles_info)
            for idxs, group_flows in dev_tile_flows:
                group_np = np.asarray(group_flows)
                for j, ti in enumerate(idxs):
                    tile_flows[ti] = group_np[j]
            flows_out[i] = paste_tile_flows(
                tile_flows, tiles_info, w, h, tile_size, overlap
            )
            if progress_cb is not None:
                progress_cb(i, flows_out[i])

        pending = None
        for i in range(n):
            win = centered_window_indices(n, i, t)
            # Interior p's fwd volume targets the next window frame, bwd
            # the previous (encode_from_features' fwd_tgt/bwd_tgt); edge
            # replication makes self-pairs like (0, 0) at clip edges.
            fwd_keys = [(win[p], win[p + 1]) for p in range(1, t - 1)]
            bwd_keys = [(win[p], win[p - 1]) for p in range(1, t - 1)]
            dev_tile_flows = []
            for shape, idxs in groups.items():
                feat_j, prep_j, pair_j, ref_j = self._videoflow_pair_fns(*shape)
                fc, pc = fcaches[shape], pcaches[shape]
                for f in dict.fromkeys(win):
                    if f not in fc:
                        tiles = extract_tile_group(
                            arr[f : f + 1], tiles_info, idxs, overlap
                        )[:, 0]
                        feats, ctx = feat_j(self.params, jnp.asarray(tiles))
                        fc[f] = (feats, prep_j(self.params, ctx))
                for key in dict.fromkeys(fwd_keys + bwd_keys):
                    if key not in pc:
                        pc[key] = pair_j(
                            self.params, fc[key[0]][0], fc[key[1]][0]
                        )
                # Exact eviction: keep only this window's working set.
                # Pair volumes are ~1.5 GB each at the 1280-tile — a lax
                # age threshold accumulates ~13 live pairs (>HBM); the
                # needed set is exactly 6 per direction-pair (in-flight
                # refines pin their own inputs until they complete).
                needed_pairs = set(fwd_keys) | set(bwd_keys)
                needed_frames = set(win)
                for f in [f for f in fc if f not in needed_frames]:
                    del fc[f]
                for key in [key for key in pc if key not in needed_pairs]:
                    del pc[key]
                prepared = tuple(fc[win[p]][1] for p in range(1, t - 1))
                cf = tuple(pc[key] for key in fwd_keys)
                cb = tuple(pc[key] for key in bwd_keys)
                dev_tile_flows.append(
                    (idxs, ref_j(self.params, prepared, cf, cb))
                )
            if pending is not None:
                finalize(*pending)
            pending = (i, dev_tile_flows)
        if pending is not None:
            finalize(*pending)
        return flows_out

    def stream_flows(
        self, frames: Sequence[np.ndarray], warm_start: bool = False, chunk: int = 0
    ) -> np.ndarray:
        """MemFlow streaming: one compiled scan over the clip with carried
        memory — flow[i] maps frame i-1 -> i (frame 0: zero motion)."""
        if self.config.model != "memflow":
            raise ValueError("stream_flows is a MemFlow mode")
        if not self._loaded:
            raise RuntimeError("Model not loaded. Call load_model() first.")
        arr = np.asarray(frames)
        n, h, w = arr.shape[:3]
        scan_fn = self._memflow_scan(n, h, w, warm_start)
        return np.asarray(scan_fn(self.params, jnp.asarray(arr)))

    # -- introspection (videoflow_core.py:204-242 parity) -----------------
    def get_model_info(self) -> dict:
        if not self._loaded:
            return {"status": "not_loaded"}
        return {
            "status": "loaded",
            "model_path": self.config.checkpoint_path,
            "dataset": self.config.dataset,
            "architecture": self.config.architecture.upper(),
            "variant": self.config.variant,
            "config": {
                "decoder_depth": self.config.decoder_depth,
                "corr_levels": self.config.corr_levels,
                "corr_radius": self.config.corr_radius,
            },
            "fast_mode": self.config.fast_mode,
            "sequence_length": self.config.sequence_length,
        }

    def get_memory_usage(self) -> dict:
        out = {}
        for d in jax.devices():
            try:
                s = d.memory_stats()
                if s:
                    out[str(d)] = {
                        "allocated_mb": (s.get("bytes_in_use") or 0) / 1024**2,
                        "limit_mb": (s.get("bytes_limit") or 0) / 1024**2,
                    }
            except Exception:
                pass
        return out or {"message": "Memory tracking not available on this backend"}
