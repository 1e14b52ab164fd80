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

import os
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _parse_gw_cap() -> int:
    """TPUFLOW_GW_CAP, parsed + validated ONCE at import.

    The cap must be a single process-wide constant: choose_group runs
    both at volume BUILD time and again inside the LOOKUP trace, and the
    two must agree or the lookup's phase/row-group arithmetic silently
    reads a layout that was never written (ADVICE r3).  Reading the env
    var at call time allowed an in-process sweep to change it between
    the two traces; parsing once at import makes build/lookup agreement
    structural.  Malformed or non-positive values fall back to the
    measured default (512, benchmarks/micro_denselevels.py) with a
    warning instead of raising mid-trace."""
    raw = os.environ.get("TPUFLOW_GW_CAP", "512")
    try:
        cap = int(raw)
    except ValueError:
        cap = -1
    if cap <= 0:
        import warnings

        warnings.warn(
            f"TPUFLOW_GW_CAP={raw!r} is not a positive integer; using 512"
        )
        cap = 512
    return cap


GW_CAP = _parse_gw_cap()


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

    corr: [B, H, W, H2, W2] -> list of FLAT [B*H*W, (H2/2^l)*(W2/2^l)]
    levels.  Levels are stored 2D with the whole target plane in the minor
    dim: H2*W2 is a multiple of 128 for /8-resolution grids of
    multiple-of-8-padded inputs, so the (8,128) tiling pads nothing —
    a [N, H2, W2] layout with W2=160 would pad 1.6x (gigabytes at tile
    sizes), and a trailing unit dim would pad a whole lane-tile per
    element."""
    b, h, w, h2, w2 = corr.shape
    x = corr.reshape(b * h * w, h2, w2)
    pyramid = [x.reshape(b * h * w, h2 * w2)]
    for _ in range(num_levels - 1):
        # Reshape-mean 2x2 pooling (== VALID reduce_window; reduce_window's
        # grad is broken under jit for bf16 in jax 0.9).
        n, lh, lw = x.shape
        x = x[:, : (lh // 2) * 2, : (lw // 2) * 2]
        x = x.reshape(n, lh // 2, 2, lw // 2, 2).mean(axis=(2, 4))
        pyramid.append(x.reshape(n, (lh // 2) * (lw // 2)))
    return pyramid


def _largest_divisor_chunk(n: int, target: int) -> int:
    """Largest divisor of n that is <= target (static shapes only)."""
    c = max(1, min(n, target))
    while n % c:
        c -= 1
    return c


def pyramid_level_dims(h2: int, w2: int, level: int) -> Tuple[int, int]:
    """Spatial dims of pyramid level `level` (VALID 2x pooling)."""
    for _ in range(level):
        h2, w2 = h2 // 2, w2 // 2
    return h2, w2


class CorrPyramid:
    """Materialized correlation pyramid with radius lookup.

    Usage:
      pyr = CorrPyramid.build(fmap1, fmap2, num_levels)
      feats = pyr.lookup(flow, radius)   # [B, H, W, num_levels*(2r+1)^2]
    """

    def __init__(
        self,
        pyramid: List[jnp.ndarray],
        shape: Tuple[int, int, int],
        target_dims: Optional[Tuple[int, int]] = None,
    ):
        self.pyramid = pyramid  # flat levels [B*H*W, lh*lw]
        self.b, self.h, self.w = shape
        # Target-plane dims of level 0 (defaults to the query grid).
        self.h2, self.w2 = target_dims if target_dims is not None else (self.h, self.w)

    @classmethod
    def build(cls, fmap1: jnp.ndarray, fmap2: jnp.ndarray, num_levels: int = 4):
        b, h, w, c = fmap1.shape
        h2, w2 = fmap2.shape[1], fmap2.shape[2]
        scale = 1.0 / float(np.sqrt(c))
        store_dtype = fmap1.dtype

        def build_one(args):
            """Volume + pyramid for ONE batch element: bounds the f32
            matmul transient to a single [HW, HW] plane (at tile sizes the
            full-batch f32 volume alone would exceed HBM)."""
            f1, f2 = args  # [H, W, C], [H2, W2, C]
            corr = jnp.einsum(
                "nc,mc->nm",
                f1.reshape(h * w, c),
                f2.reshape(h2 * w2, c),
                preferred_element_type=jnp.float32,
            )
            corr = (corr * scale).astype(store_dtype)
            x = corr.reshape(h * w, h2, w2)
            levels = [corr]
            for _ in range(num_levels - 1):
                n, lh, lw = x.shape
                x = x[:, : (lh // 2) * 2, : (lw // 2) * 2]
                x = x.reshape(n, lh // 2, 2, lw // 2, 2).mean(axis=(2, 4))
                levels.append(x.reshape(n, -1))
            return tuple(levels)

        stacked = jax.lax.map(build_one, (fmap1, fmap2))
        pyramid = [lvl.reshape(b * h * w, -1) for lvl in stacked]
        return cls(pyramid, (b, h, w), (h2, w2))

    def lookup(
        self, flow: jnp.ndarray, radius: int = 4, border: str = "zeros"
    ) -> jnp.ndarray:
        """Default lookup: sample (2r+1)^2 windows around flow-displaced
        positions at every pyramid level (patch-take formulation; the
        measured-stable choice — see lookup_rows/lookup_span for the
        alternatives and their measured rates).

        flow: [B, H, W, 2] at feature resolution.
        Returns [B, H, W, L*(2r+1)^2] float32.

        Patch-gather formulation: every window position of a query shares
        the same fractional offset (the window deltas are integers), so
        ONE (2r+2)^2 patch gather per query yields all (2r+1)^2 bilinear
        samples via static shifts — ~3x fewer gathered elements and 4x
        fewer gather ops than sampling each position independently.

        Upstream-parity contracts (RAFT CorrBlock as consumed by
        videoflow_core.py:91-94):
        - border='zeros' (default): out-of-plane bilinear corners
          contribute 0, like grid_sample(padding_mode='zeros');
          border='clamp' replicates the edge texel instead.
        - output channel p enumerates the window with the FIRST axis
          applied to x: position(p) = (x0 + d[p // S], y0 + d[p % S]) with
          d = [-r..r], S = 2r+1 — upstream's meshgrid(dy, dx) quirk adds
          the first meshgrid axis to the x coordinate, and the motion
          encoder's weights are laid out for that order."""
        b, h, w, _ = flow.shape
        r = radius
        side = 2 * r + 2  # patch side: window + 1 for the bilinear corner
        n = b * h * w

        ys, xs = jnp.mgrid[0:h, 0:w]
        base_x = (xs.astype(jnp.float32)[None] + flow[..., 0]).reshape(n)
        base_y = (ys.astype(jnp.float32)[None] + flow[..., 1]).reshape(n)

        jj = jnp.arange(side, dtype=jnp.int32)
        out = []
        for lvl, volume in enumerate(self.pyramid):
            lh, lw = pyramid_level_dims(self.h2, self.w2, lvl)
            cx = base_x / (2.0**lvl)
            cy = base_y / (2.0**lvl)
            fx0 = jnp.floor(cx)
            fy0 = jnp.floor(cy)
            wx = (cx - fx0)[:, None, None]  # [N, 1, 1] shared fraction
            wy = (cy - fy0)[:, None, None]
            px = fx0.astype(jnp.int32) - r  # patch origin
            py = fy0.astype(jnp.int32) - r

            # Patch coordinates, clamped; row-local indices gathered with
            # take_along_axis — each query reads its OWN [lh*lw] row, and
            # no global reshape(-1) (which forced a full-volume layout
            # copy inside the refinement loop).
            xraw = px[:, None] + jj[None, :]  # [N, side]
            yraw = py[:, None] + jj[None, :]
            xx = jnp.clip(xraw, 0, lw - 1)
            yy = jnp.clip(yraw, 0, lh - 1)
            idx = yy[:, :, None] * lw + xx[:, None, :]  # [N, side, side]
            patch = jnp.take_along_axis(
                volume, idx.reshape(n, side * side), axis=1
            )
            patch = patch.reshape(n, side, side).astype(jnp.float32)
            if border == "zeros":
                vr = ((yraw >= 0) & (yraw < lh)).astype(jnp.float32)
                vc = ((xraw >= 0) & (xraw < lw)).astype(jnp.float32)
                patch = patch * vr[:, :, None] * vc[:, None, :]

            v00 = patch[:, :-1, :-1]
            v01 = patch[:, :-1, 1:]
            v10 = patch[:, 1:, :-1]
            v11 = patch[:, 1:, 1:]
            sampled = (
                v00 * (1 - wx) * (1 - wy)
                + v01 * wx * (1 - wy)
                + v10 * (1 - wx) * wy
                + v11 * wx * wy
            )  # [N, 2r+1(y), 2r+1(x)]
            # Upstream channel order: first window axis -> x offset.
            sampled = sampled.swapaxes(1, 2)
            out.append(sampled.reshape(b, h, w, (2 * r + 1) ** 2))
        return jnp.concatenate(out, axis=-1)


    def lookup_span(
        self, flow: jnp.ndarray, radius: int = 4, border: str = "zeros"
    ) -> jnp.ndarray:
        """EXPERIMENTAL: per-(query, patch-row) SPAN gathers.

        Crashed the v5e TPU worker via the remote-compile harness (nested
        vmap dynamic_slice lowering); kept for re-evaluation on a direct
        runtime.

        Measured gather rates on v5e: scalar patch-take ~14 cycles/element,
        long contiguous row-bands ~4.6 cycles/element but 4x the elements.
        The window's columns are already CONTIGUOUS in the plane row, so
        the minimal hardware-friendly access is one `span`-wide contiguous
        slice per (query, patch row): side x span elements per query
        (~12M/level-set vs 31M scalar / 123M row-band), at span rate.
        Border clamping is exact: row starts clamp per row, and a small
        one-hot column remap (MXU) restores per-element column clamps.
        Numerics identical to lookup_take (verified in tests)."""
        b, h, w, _ = flow.shape
        r = radius
        side = 2 * r + 2
        n = b * h * w

        ys, xs = jnp.mgrid[0:h, 0:w]
        base_x = (xs.astype(jnp.float32)[None] + flow[..., 0]).reshape(n)
        base_y = (ys.astype(jnp.float32)[None] + flow[..., 1]).reshape(n)

        jj = jnp.arange(side, dtype=jnp.int32)
        out = []
        for lvl, volume in enumerate(self.pyramid):
            lh, lw = pyramid_level_dims(self.h2, self.w2, lvl)
            span = min(16, lw)  # lane-aligned-ish contiguous slice width
            cx = base_x / (2.0**lvl)
            cy = base_y / (2.0**lvl)
            fx0 = jnp.floor(cx)
            fy0 = jnp.floor(cy)
            wx = (cx - fx0)[:, None, None]
            wy = (cy - fy0)[:, None, None]
            px = fx0.astype(jnp.int32) - r
            py = fy0.astype(jnp.int32) - r

            # One contiguous span per (query, patch row), exact row clamp
            # folded into the start offset.
            col0 = jnp.clip(px, 0, lw - span)  # [N]
            row_y = jnp.clip(py[:, None] + jj[None, :], 0, lh - 1)  # [N, side]
            starts = row_y * lw + col0[:, None]  # [N, side] flat offsets

            spans = jax.vmap(
                lambda v, ss: jax.vmap(
                    lambda s: jax.lax.dynamic_slice(v, (s,), (span,))
                )(ss)
            )(volume, starts)  # [N, side, span]

            # Column remap (per-element clamp relative to the span start)
            # as a one-hot contraction on the MXU.
            col_rel = jnp.clip(px[:, None] + jj[None, :], 0, lw - 1) - col0[:, None]
            col_sel = jax.nn.one_hot(col_rel, span, dtype=spans.dtype)  # [N, side, span]
            patch = jnp.einsum(
                "nrs,ncs->nrc", spans, col_sel, preferred_element_type=jnp.float32
            )  # [N, side(rows), side(cols)]
            if border == "zeros":
                yraw = py[:, None] + jj[None, :]
                xraw = px[:, None] + jj[None, :]
                vr = ((yraw >= 0) & (yraw < lh)).astype(jnp.float32)
                vc = ((xraw >= 0) & (xraw < lw)).astype(jnp.float32)
                patch = patch * vr[:, :, None] * vc[:, None, :]

            v00 = patch[:, :-1, :-1]
            v01 = patch[:, :-1, 1:]
            v10 = patch[:, 1:, :-1]
            v11 = patch[:, 1:, 1:]
            sampled = (
                v00 * (1 - wx) * (1 - wy)
                + v01 * wx * (1 - wy)
                + v10 * (1 - wx) * wy
                + v11 * wx * wy
            )
            sampled = sampled.swapaxes(1, 2)  # upstream x-major order
            out.append(sampled.reshape(b, h, w, (2 * r + 1) ** 2))
        return jnp.concatenate(out, axis=-1)

    def lookup_rows(
        self, flow: jnp.ndarray, radius: int = 4, border: str = "zeros"
    ) -> jnp.ndarray:
        """Row-band variant: lookup_take reformulated for the TPU memory system: scalar gathers
        on TPU run near one element per cycle, so the patch-take version
        moves ~60M scattered elements per refinement iteration at scalar
        speed.  Here each query instead gathers `side` CONTIGUOUS plane
        rows (one sliced gather: hardware-friendly), and the within-patch
        row remap + column selection become one-hot contractions on the
        MXU.  Numerics identical to lookup() (same clamped patch
        coordinates, same shared-fraction bilinear)."""
        b, h, w, _ = flow.shape
        r = radius
        side = 2 * r + 2
        n = b * h * w

        ys, xs = jnp.mgrid[0:h, 0:w]
        base_x = (xs.astype(jnp.float32)[None] + flow[..., 0]).reshape(n)
        base_y = (ys.astype(jnp.float32)[None] + flow[..., 1]).reshape(n)

        jj = jnp.arange(side, dtype=jnp.int32)
        out = []
        for lvl, volume in enumerate(self.pyramid):
            lh, lw = pyramid_level_dims(self.h2, self.w2, lvl)
            cx = base_x / (2.0**lvl)
            cy = base_y / (2.0**lvl)
            fx0 = jnp.floor(cx)
            fy0 = jnp.floor(cy)
            wx = (cx - fx0)[:, None, None]
            wy = (cy - fy0)[:, None, None]
            px = fx0.astype(jnp.int32) - r
            py = fy0.astype(jnp.int32) - r

            # Contiguous row-band gather at a clamped per-query row origin
            # (band shrinks at deep levels where the plane has fewer than
            # `side` rows).  The band is a CONTIGUOUS span of the flat
            # [N, lh*lw] row, so the slice happens in flat layout — a 3D
            # [N, lh, lw] view would force a multi-GB padded-layout copy
            # inside the refinement loop.
            band = min(side, lh)
            origin = jnp.clip(py, 0, lh - band)
            rows = jax.vmap(
                lambda v, o: jax.lax.dynamic_slice(v, (o,), (band * lw,))
            )(volume, origin * lw)  # [N, band*lw]
            rows = rows.reshape(n, band, lw)

            # Row remap (edge-replicate clamp) relative to the band origin,
            # as a one-hot contraction (MXU, not gather).
            row_idx = jnp.clip(py[:, None] + jj[None, :], 0, lh - 1) - origin[:, None]
            row_sel = jax.nn.one_hot(row_idx, band, dtype=rows.dtype)  # [N, side, band]
            rows = jnp.einsum(
                "nsr,nrw->nsw", row_sel, rows, preferred_element_type=jnp.float32
            )  # [N, side, lw] f32

            # Column selection, also one-hot.
            col_idx = jnp.clip(px[:, None] + jj[None, :], 0, lw - 1)  # [N, side]
            col_sel = jax.nn.one_hot(col_idx, lw, dtype=volume.dtype)  # [N, side, lw]
            patch = jnp.einsum(
                "nsw,ncw->nsc", rows, col_sel, preferred_element_type=jnp.float32
            )  # [N, side(rows), side(cols)]
            if border == "zeros":
                yraw = py[:, None] + jj[None, :]
                xraw = px[:, None] + jj[None, :]
                vr = ((yraw >= 0) & (yraw < lh)).astype(jnp.float32)
                vc = ((xraw >= 0) & (xraw < lw)).astype(jnp.float32)
                patch = patch * vr[:, :, None] * vc[:, None, :]

            v00 = patch[:, :-1, :-1]
            v01 = patch[:, :-1, 1:]
            v10 = patch[:, 1:, :-1]
            v11 = patch[:, 1:, 1:]
            sampled = (
                v00 * (1 - wx) * (1 - wy)
                + v01 * wx * (1 - wy)
                + v10 * (1 - wx) * wy
                + v11 * wx * wy
            )
            sampled = sampled.swapaxes(1, 2)  # upstream x-major order
            out.append(sampled.reshape(b, h, w, (2 * r + 1) ** 2))
        return jnp.concatenate(out, axis=-1)


def choose_group(lh: int, lw: int, dtype=jnp.bfloat16) -> int:
    """Row-group size g for the dense-lookup volume layout
    [N, ceil(lh/g), g*lw] (stored tile-ALIGNED, see DenseCorrPyramid.build):
    minimize the aligned (sublane x lane) footprint — sublanes round to a
    multiple of 8, lanes to a multiple of 128 (measured from XLA HBM
    dumps on v5e, T(8,128)(2,1)) — subject to g*lw <= cap so the
    [N, side, g*lw] band intermediates inside the refinement loop stay
    small (big groups make the volume compact but blow up per-iteration
    traffic).  The cap trades one-time volume-read bytes (small cap ->
    more lane padding -> bigger volume) against per-lookup band bytes
    (big cap -> wider [N, side, gw] intermediates); 512 won the r3
    device sweep at the bench tile (benchmarks/micro_denselevels.py).
    TPUFLOW_GW_CAP overrides for sweeps — parsed once at import
    (GW_CAP) so the build trace and the lookup trace can never see
    different caps (ADVICE r3: a mid-process change would make the
    lookup decompose rows with a g the stored layout wasn't built
    with)."""
    cap = GW_CAP
    best_g, best_size = 1, None
    for g in range(1, min(65, 2 * lh)):
        if g * lw > cap and g > 1:
            break
        nh = -(-lh // g)
        size = -(-nh // 8) * 8 * (-(-(g * lw) // 128) * 128)
        if best_size is None or size < best_size:
            best_g, best_size = g, size
    return best_g


def aligned_group_dims(lh: int, lw: int, g: int) -> Tuple[int, int]:
    """Tile-aligned storage dims for a grouped level: rows to a multiple
    of 8, lanes to a multiple of 128."""
    nh = -(-lh // g)
    return -(-nh // 8) * 8, -(-(g * lw) // 128) * 128


class DenseCorrPyramid:
    """Materialized pyramid with a GATHER-FREE lookup.

    XLA's TPU gather moves ~12.5 cycles/element (measured,
    tpuflow/kernels/__init__.py), making the radius lookup ~99% of MOFNet
    runtime.  This lookup instead STREAMS each volume through the MXU with
    per-query one-hot selection matrices:

        bands = R @ V        R: [side, nh] one-hot row-group select
        bands *= phase_mask  (lane // lw == row % g, fused elementwise)
        patch = bands @ C^T  C: [side, g*lw] one-hot column select

    Cost is one full read of the volume per lookup at streaming bandwidth
    plus rank-deficient matmuls — ~25x faster than the measured gather at
    1280-tile shapes, entirely in XLA (no Pallas, no Mosaic constraints).
    One-hot matmul selection is exact (products are 1.0 * v, f32
    accumulation of a single nonzero term), so numerics are identical to
    CorrPyramid.lookup: same clamps, same shared-fraction f32 bilinear.

    Storage: levels as [N, ceil(lh/g), g*lw] (row-major regroup of the
    flat layout, zero row padding), g per level from choose_group.
    """

    def __init__(
        self,
        pyramid: List[jnp.ndarray],
        shape: Tuple[int, int, int],
        target_dims: Optional[Tuple[int, int]] = None,
        level_offset: int = 0,
    ):
        self.pyramid = pyramid  # grouped levels [B*H*W, nh, g*lw]
        self.b, self.h, self.w = shape
        self.h2, self.w2 = target_dims if target_dims is not None else (self.h, self.w)
        # When this pyramid holds only the DEEP levels of a larger one
        # (FlashCorr hybrid), `level_offset` shifts the per-level scale:
        # stored level i is semantic level i + level_offset.
        self.level_offset = level_offset
        # Per-level row-group sizes fixed at construction, so lookup can
        # never decompose rows with a g the stored layout wasn't built
        # with (ADVICE r3; choose_group is deterministic now that GW_CAP
        # is parsed once at import, making this equal to what build()
        # used — including after the arrays-only jit-boundary round trip
        # through _corr_state/_corr_from_state).
        self.groups = [
            choose_group(*pyramid_level_dims(self.h2, self.w2, i + level_offset))
            for i in range(len(pyramid))
        ]

    @classmethod
    def build(cls, fmap1: jnp.ndarray, fmap2: jnp.ndarray, num_levels: int = 4):
        """Every level as ONE einsum against avg-POOLED target features,
        written DIRECTLY into the tile-aligned grouped layout.

        Correlation is linear in the target features, so correlating
        with 2^l-pooled features equals avg-pooling the level-0 volume
        (the reference's F.avg_pool2d chain, videoflow corr.py) exactly
        up to float summation order.  Building each level from pooled
        FEATURES instead of pooling the materialized VOLUME removes the
        whole volume-pooling read/write chain AND every unaligned
        intermediate: the target feature rows are zero-padded up front
        so the einsum's flat output minor dim is already nh*g*lw (a
        128-lane multiple), making the [N, nh*g*lw] -> [N, nh, g*lw]
        reshape layout-preserving.  The previous build — per-chunk
        einsum -> [Nc, lh, lw] reshape (unaligned minor dims, full
        relayout copies) -> pad -> regroup -> concat + volume-pool chain
        — measured ~356 ms per window inside the encode jit at the
        1080x1280 bench tile vs ~10 ms of intrinsic FLOPs+bandwidth;
        this form removes every relayout in that chain.

        Aligned shapes (explicit zeros) have a single possible layout,
        so the encode/refine jit boundary moves these arrays with zero
        copies; the lookup's row/phase masks keep the alignment zeros
        inert (zero-padded target rows correlate to exactly 0 and are
        never selected).  Query-side chunking is unnecessary: XLA fuses
        the scale+cast epilogue into the matmul, so the f32 product
        never materializes at full size."""
        b, h, w, c = fmap1.shape
        h2, w2 = fmap2.shape[1], fmap2.shape[2]
        scale = 1.0 / float(np.sqrt(c))
        dt = fmap1.dtype

        q = fmap1.reshape(b, h * w, c)
        # Pool target features in f32: the pooled values feed every
        # deeper level, and f32 pooling keeps the builder within ulp
        # bounds of the volume-pooling reference order.
        f2l = fmap2.astype(jnp.float32)
        pyramid = []
        for lvl in range(num_levels):
            lh, lw = pyramid_level_dims(h2, w2, lvl)
            if lvl > 0:
                # Same edge convention as the volume pool: odd trailing
                # row/col sliced off before the 2x2 mean.
                ph, pw = f2l.shape[1], f2l.shape[2]
                f2l = f2l[:, : (ph // 2) * 2, : (pw // 2) * 2]
                f2l = f2l.reshape(b, lh, 2, lw, 2, c).mean(axis=(2, 4))
            g = choose_group(lh, lw, dt)
            nh = -(-lh // g)
            nh_a, gw_a = aligned_group_dims(lh, lw, g)

            flat = f2l.astype(dt).reshape(b, lh * lw, c)
            if nh * g != lh:  # zero target rows: correlate to exactly 0
                flat = jnp.pad(flat, ((0, 0), (0, (nh * g - lh) * lw), (0, 0)))
            vol = jnp.einsum(
                "bnc,bmc->bnm", q, flat, preferred_element_type=jnp.float32
            )
            vol = (vol * scale).astype(dt)          # fused matmul epilogue
            # Minor split at g*lw (a 128 multiple for regular widths):
            # layout-preserving.
            vol = vol.reshape(b * h * w, nh, g * lw)
            if (nh_a, gw_a) != (nh, g * lw):
                vol = jnp.pad(
                    vol, ((0, 0), (0, nh_a - nh), (0, gw_a - g * lw))
                )
            pyramid.append(vol)
        return cls(pyramid, (b, h, w), (h2, w2))

    def lookup(
        self, flow: jnp.ndarray, radius: int = 4, border: str = "zeros",
        impl: Optional[str] = None, mesh=None,
    ) -> jnp.ndarray:
        """[B, H, W, 2] -> [B, H, W, L*(2r+1)^2] f32, numerics identical to
        CorrPyramid.lookup (tests enforce equality): border='zeros'
        zero-pad + upstream x-major window channel order (see
        CorrPyramid.lookup docstring).

        Formulation: the TPUFLOW_DENSE_LOOKUP env var (sweep override)
        beats the `impl` argument (model-level policy, e.g. the engine
        forces 'xla' under a mesh) beats 'auto' = the fused Pallas
        kernel on single-host TPU, the XLA one-hot formulation
        elsewhere (bench 0.641 vs 0.637 f/s — round-4 notes §7).

        TPUFLOW_DENSE_LOOKUP=pallas routes the WHOLE lookup — one-hot
        patch extraction + border zeros + bilinear + x-major repack —
        through the fused Pallas kernel (kernels/denselookup.py
        dense_feature_level), entirely in VMEM; 'patch' keeps the
        earlier exact-patch kernel + this XLA epilogue.  Patch entries
        are exact volume values in every mode; 'patch' is bitwise-equal
        to the XLA formulation, while the fused kernel's f32 bilinear
        is MORE accurate than this storage-dtype epilogue and therefore
        ulp-level different (tests/test_denselookup.py tolerances).
        History: the non-fused kernel measured 1.44x faster ISOLATED but
        2.7% slower in-context because its [*, 16, 16] patch output
        forced ~124 ms/call of slice+relayout epilogue at the 1280 bench
        tile (round-4 notes §5/§7) — the fused form exists to delete
        exactly that."""
        mode = os.environ.get("TPUFLOW_DENSE_LOOKUP") or impl or "auto"
        if mode == "auto":
            mode = "pallas" if jax.default_backend() == "tpu" else "xla"
        if mode in ("pallas", "interpret", "patch"):
            return self._lookup_kernel(
                flow, radius, border,
                interpret=jax.default_backend() != "tpu",
                fused=mode != "patch",
                mesh=mesh,
            )
        b, h, w, _ = flow.shape
        r = radius
        side = 2 * r + 2
        n = b * h * w

        ys, xs = jnp.mgrid[0:h, 0:w]
        base_x = (xs.astype(jnp.float32)[None] + flow[..., 0]).reshape(n)
        base_y = (ys.astype(jnp.float32)[None] + flow[..., 1]).reshape(n)

        jj = jnp.arange(side, dtype=jnp.int32)
        out = []
        for lvl0, volume in enumerate(self.pyramid):
            lvl = lvl0 + self.level_offset
            lh, lw = pyramid_level_dims(self.h2, self.w2, lvl)
            gw = volume.shape[2]
            # g comes from the layout fixed at construction (self.groups;
            # the stored gw is tile-aligned, so gw // lw would be wrong
            # for small levels); nh is the ALIGNED row count — padded
            # rows are never selected (hk < ceil(lh/g)) and padded lanes
            # are killed by the phase mask, so alignment zeros stay inert.
            g = self.groups[lvl0]
            nh = volume.shape[1]
            cx = base_x / (2.0**lvl)
            cy = base_y / (2.0**lvl)
            fx0 = jnp.floor(cx)
            fy0 = jnp.floor(cy)
            wx = (cx - fx0)[:, None, None]
            wy = (cy - fy0)[:, None, None]
            px = fx0.astype(jnp.int32) - r
            py = fy0.astype(jnp.int32) - r

            yraw = py[:, None] + jj[None, :]  # [N, side]
            xraw = px[:, None] + jj[None, :]
            rr = jnp.clip(yraw, 0, lh - 1)
            cc = jnp.clip(xraw, 0, lw - 1)
            hk = rr // g   # storage row (group) per patch row
            pk = rr % g    # phase within the group

            # Row-group select on the MXU: one-hot [side, nh] x [nh, gw].
            # Streams the volume at full HBM bandwidth (measured: 12-iter
            # full-pyramid lookup in 45 ms/direction at 1280-tile shapes)
            # PROVIDED the volume argument already has the layout the dot
            # consumes — the engine compiles the refine jit with AUTO
            # input layouts and relayouts once at the boundary, because a
            # mismatched volume gets copied per-use under remat
            # compression (~8x on the loop; MOFNet docstring).
            # Both selection matmuls stay in the VOLUME's dtype end to
            # end: every product is 1.0 * v (one-hot), so bands/patch
            # hold exact volume entries — bf16 intermediates lose nothing
            # the bf16-at-rest volume hadn't already, and the f32
            # versions measured ~2x the lookup's HBM traffic.
            row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, side, nh), 2)
            R = (hk[:, :, None] == row_iota).astype(volume.dtype)
            bands = jnp.einsum(
                "nsh,nhw->nsw", R, volume, preferred_element_type=volume.dtype
            )  # [N, side, gw]

            # Phase mask + column one-hot (lane index decomposes as
            # phase * lw + column); the mask generation fuses into the
            # elementwise multiply, only C materializes.
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, gw), 2)
            bands = bands * (lane // lw == pk[:, :, None]).astype(volume.dtype)
            C = (lane % lw == cc[:, :, None]).astype(volume.dtype)
            patch = jnp.einsum(
                "nsw,ncw->nsc",
                bands,
                C,
                preferred_element_type=volume.dtype,
            )  # [N, side(rows), side(cols)] in volume dtype
            dt = volume.dtype
            if border == "zeros":
                vr = ((yraw >= 0) & (yraw < lh)).astype(dt)
                vc = ((xraw >= 0) & (xraw < lw)).astype(dt)
                patch = patch * vr[:, :, None] * vc[:, None, :]

            # Bilinear in the volume dtype: for f32 volumes (tests/parity)
            # this is the exact f32 math; for bf16 volumes the result
            # feeds a bf16 network anyway and the f32 intermediates
            # measured ~2x the lookup's HBM traffic.
            v00 = patch[:, :-1, :-1]
            v01 = patch[:, :-1, 1:]
            v10 = patch[:, 1:, :-1]
            v11 = patch[:, 1:, 1:]
            wxd = wx.astype(dt)
            wyd = wy.astype(dt)
            sampled = (
                v00 * (1 - wxd) * (1 - wyd)
                + v01 * wxd * (1 - wyd)
                + v10 * (1 - wxd) * wyd
                + v11 * wxd * wyd
            )
            sampled = sampled.swapaxes(1, 2)  # upstream x-major order
            out.append(
                sampled.reshape(b, h, w, (2 * r + 1) ** 2).astype(jnp.float32)
            )
        return jnp.concatenate(out, axis=-1)

    def _lookup_kernel(
        self, flow: jnp.ndarray, radius: int, border: str, interpret: bool,
        fused: bool = True, mesh=None,
    ) -> jnp.ndarray:
        """Kernel-backed lookup.

        fused=True (mode 'pallas'): kernels/denselookup.dense_feature_level
        does patch extract + border zeros + bilinear + x-major repack in
        one VMEM pass; only the dense [B, hw, 128] feature lanes leave
        the kernel (this removes the [*, 16, 16] -> [*, 10, 10] slice +
        relayout epilogue that measured ~124 ms/call at the 1280 bench
        tile — round-4 notes §7).  Requires border='zeros' (the only
        mode the models use): out-of-range taps become index sentinels.

        fused=False (mode 'patch'): the exact-value (2r+2)^2 patch kernel
        + the shared XLA bilinear epilogue (_patch_to_features), kept for
        ablation.  Both are bitwise-equal to the XLA formulation.

        `mesh`: when a jax.sharding.Mesh is given, each kernel call is
        wrapped in jax.shard_map over the mesh's batch axis ('data' if
        present, else the first axis): every shard runs the kernel on
        its OWN batch slice, so the Mosaic custom call never needs GSPMD
        partitioning (a custom call under plain pjit would be replicated
        or rejected — VERDICT r4 #5).  All kernel operands are b-major
        on their leading dim, so P(axis) on dim 0 is a pure DP split;
        the engine pads batches to mesh-divisible sizes.  Validated by
        tests/test_sharding.py (8-dev CPU interpret equality) and
        benchmarks/check_denselookup_tpu.py --mesh (real Mosaic kernel
        inside shard_map on the chip).
        """
        from ..kernels.denselookup import dense_feature_level, dense_patch_level

        if border != "zeros":
            fused = False

        def shardwrap(call, nargs):
            if mesh is None:
                return call
            axis = "data" if "data" in mesh.axis_names else mesh.axis_names[0]
            spec = jax.sharding.PartitionSpec(axis)
            return jax.shard_map(
                call, mesh=mesh, in_specs=(spec,) * nargs, out_specs=spec,
                check_vma=False,
            )
        b, h, w, _ = flow.shape
        r = radius
        hw = h * w
        ncs = (2 * r + 1) ** 2

        ys, xs = jnp.mgrid[0:h, 0:w]
        base_x = (xs.astype(jnp.float32)[None] + flow[..., 0]).reshape(b, hw)
        base_y = (ys.astype(jnp.float32)[None] + flow[..., 1]).reshape(b, hw)

        out = []
        for lvl0, volume in enumerate(self.pyramid):
            lvl = lvl0 + self.level_offset
            lh, lw = pyramid_level_dims(self.h2, self.w2, lvl)
            g = self.groups[lvl0]
            idx = _radius_patch_indices(base_x, base_y, lvl, lh, lw, r)
            if fused:
                sent_r = volume.shape[1] * g  # hk >= nh: selects nothing
                rr = jnp.where(
                    (idx.yraw >= 0) & (idx.yraw < lh), idx.yraw, sent_r
                )
                cc = jnp.where(
                    (idx.xraw >= 0) & (idx.xraw < lw), idx.xraw, lw
                )
                call = shardwrap(
                    lambda v, rr_, cc_, wx_, wy_, lh=lh, lw=lw, g=g: (
                        dense_feature_level(
                            v, rr_, cc_, wx_, wy_,
                            lh=lh, lw=lw, g=g, side=2 * r + 2,
                            interpret=interpret,
                        )
                    ),
                    5,
                )
                feats = call(
                    volume, rr, cc, idx.wx[:, :, 0, 0], idx.wy[:, :, 0, 0]
                )
                out.append(
                    feats[:, :, :ncs].reshape(b, h, w, ncs).astype(jnp.float32)
                )
            else:
                call = shardwrap(
                    lambda v, rr_, cc_, lh=lh, lw=lw, g=g: dense_patch_level(
                        v, rr_, cc_,
                        lh=lh, lw=lw, g=g, side=2 * r + 2,
                        interpret=interpret,
                    ),
                    3,
                )
                patch = call(volume, idx.rr, idx.cc)
                out.append(
                    _patch_to_features(patch, idx, lh, lw, border, (b, h, w, r))
                )
        return jnp.concatenate(out, axis=-1)


def corr_feature_dim(num_levels: int, radius: int) -> int:
    return num_levels * (2 * radius + 1) ** 2


def dense_volume_bytes(
    h8: int, w8: int, num_levels: int = 4, dtype=jnp.bfloat16
) -> int:
    """HBM bytes of ONE direction's materialized DenseCorrPyramid for an
    [h8, w8] feature grid (tile-aligned grouped storage, per batch item).
    Engines use this to clamp window batching before XLA hits the
    'arguments exceed HBM' compile error (a WB=2 refine at the 1080p
    bench tile presents 16.46 GB of volume arguments on a 15.75 GB
    chip — docs/ROUND4_NOTES.md §9)."""
    itemsize = jnp.dtype(dtype).itemsize
    nq = h8 * w8
    total = 0
    for lvl in range(num_levels):
        lh, lw = pyramid_level_dims(h8, w8, lvl)
        g = choose_group(lh, lw, dtype)
        nh_a, gw_a = aligned_group_dims(lh, lw, g)
        total += nq * nh_a * gw_a * itemsize
    return total


def _avg_pool_features(fmap: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pool of [B, H, W, C] (VALID, matching the corr-pyramid
    pooling; reshape-mean — see build_corr_pyramid note)."""
    b, h, w, c = fmap.shape
    x = fmap[:, : (h // 2) * 2, : (w // 2) * 2]
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


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

    def lookup(
        self, flow: jnp.ndarray, radius: int = 4, border: str = "zeros",
        chunk_budget: int = 4 * 10**8,
    ) -> jnp.ndarray:
        """[B, H, W, 2] flow -> [B, H, W, L*(2r+1)^2] correlation features,
        numerically matching CorrPyramid.lookup (zero-pad border, upstream
        x-major window channel order: position(p) = (x0 + d[p // S],
        y0 + d[p % S])).

        Queries are processed in chunks under lax.map so the per-corner
        feature gather [B, chunk, P, C] stays within `chunk_budget` bytes
        — at full-frame 2160p the unchunked gather alone would be ~16 GB.
        Chunking only reorders independent per-query work (numerics
        unchanged)."""
        b, h, w, _ = flow.shape
        r = radius
        c = self.fmap1.shape[-1]
        d = jnp.arange(-r, r + 1, dtype=jnp.float32)
        # x takes the FIRST window axis (upstream meshgrid(dy, dx) quirk —
        # see CorrPyramid.lookup docstring).
        dxg, dyg = jnp.meshgrid(d, d, indexing="ij")
        dx = dxg.reshape(-1)
        dy = dyg.reshape(-1)
        p = dx.shape[0]
        hw = h * w

        ys, xs = jnp.mgrid[0:h, 0:w]
        base_x = (xs.astype(jnp.float32)[None] + flow[..., 0]).reshape(b, hw)
        base_y = (ys.astype(jnp.float32)[None] + flow[..., 1]).reshape(b, hw)
        f1 = self.fmap1.reshape(b, hw, c)
        scale = self.scale

        def level_corr(f2l, bx, by):
            """One level's lookup for a block of queries.
            bx/by: [B, Q]; returns [B, Q, P] f32."""
            lh, lw = f2l.shape[1], f2l.shape[2]
            # x/y separate: no [...,2] trailing dim (layout padding trap).
            x = bx[..., None] + dx[None, None, :]  # [B, Q, P]
            y = by[..., None] + dy[None, None, :]
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            wx = x - x0
            wy = y - y0
            x0u = x0.astype(jnp.int32)
            y0u = y0.astype(jnp.int32)
            x0i = jnp.clip(x0u, 0, lw - 1)
            x1i = jnp.clip(x0u + 1, 0, lw - 1)
            y0i = jnp.clip(y0u, 0, lh - 1)
            y1i = jnp.clip(y0u + 1, 0, lh - 1)

            # Bilinear interpolation commutes with the feature contraction,
            # so dot each corner separately: peak transient memory is one
            # [B, Q, P, C] gather instead of four.
            bidx = jnp.arange(b)[:, None, None]
            corr = jnp.zeros(x.shape, jnp.float32)
            for yu, xu, yi, xi, wgt in (
                (y0u, x0u, y0i, x0i, (1 - wx) * (1 - wy)),
                (y0u, x0u + 1, y0i, x1i, wx * (1 - wy)),
                (y0u + 1, x0u, y1i, x0i, (1 - wx) * wy),
                (y0u + 1, x0u + 1, y1i, x1i, wx * wy),
            ):
                if border == "zeros":
                    # grid_sample zero-pad: an out-of-plane corner
                    # contributes nothing.
                    wgt = wgt * (
                        (yu >= 0) & (yu < lh) & (xu >= 0) & (xu < lw)
                    ).astype(wgt.dtype)
                v = f2l[bidx, yi, xi]  # [B, Q, P, C]
                dot = jnp.einsum(
                    "bqc,bqpc->bqp",
                    level_corr.f1_block,
                    v,
                    preferred_element_type=jnp.float32,
                )
                corr = corr + wgt * dot
            return corr * scale

        # Chunk size: largest divisor of hw whose per-corner gather fits
        # the budget (static shapes only).
        target = max(1, min(hw, chunk_budget // max(1, b * p * c * 2)))
        chunk = _largest_divisor_chunk(hw, target)

        if chunk == hw:
            level_corr.f1_block = f1
            out = [
                level_corr(f2l, base_x / (2.0**lvl), base_y / (2.0**lvl))
                .reshape(b, h, w, p)
                for lvl, f2l in enumerate(self.pyramid)
            ]
            return jnp.concatenate(out, axis=-1)

        nchunk = hw // chunk
        bxc = jnp.moveaxis(base_x.reshape(b, nchunk, chunk), 1, 0)
        byc = jnp.moveaxis(base_y.reshape(b, nchunk, chunk), 1, 0)
        f1c = jnp.moveaxis(f1.reshape(b, nchunk, chunk, c), 1, 0)

        def one_chunk(args):
            bx, by, f1b = args  # [B, chunk(, C)]
            level_corr.f1_block = f1b
            return jnp.concatenate(
                [
                    level_corr(f2l, bx / (2.0**lvl), by / (2.0**lvl))
                    for lvl, f2l in enumerate(self.pyramid)
                ],
                axis=-1,
            )  # [B, chunk, L*P]

        out = jax.lax.map(one_chunk, (bxc, byc, f1c))  # [nchunk, B, chunk, LP]
        out = jnp.moveaxis(out, 0, 1).reshape(b, h, w, -1)
        return out


class FlashCorr:
    """Correlation lookup through the fused Pallas kernel
    (tpuflow.kernels.flashcorr): each query's correlation row is
    RECOMPUTED on the MXU from VMEM-resident pooled-feature chunks and
    the (2r+2)^2 patch extracted in VMEM — no volume bytes in HBM, no
    volume build in encode, constant VMEM in grid size (the full-frame
    >=4K path).

    Storage: fmap1 [B, H, W, C]; leading `flash_levels` pyramid levels as
    PADDED pooled target features [B, lh_pad, lw_pad, C]; optionally the
    remaining deep levels as a DenseCorrPyramid (they are tiny — at the
    1280-tile, levels 1-3 total ~0.9 GB vs 2.8 GB for level 0 — and the
    dense lookup amortizes better at small M).

    Numerics: patch entries are exact volume values (one-hot selects, f32
    MXU accumulate * 1/sqrt(C), feature-dtype at rest) — identical to
    DenseCorrPyramid for level 0; deeper levels pool FEATURES rather than
    volumes, exact up to float reassociation (same contract as
    OnTheFlyCorr; tests bound the difference).
    """

    def __init__(
        self,
        fmap1: jnp.ndarray,
        flash_pyr: List[jnp.ndarray],
        dense: Optional["DenseCorrPyramid"] = None,
    ):
        self.fmap1 = fmap1
        self.flash_pyr = flash_pyr
        self.dense = dense

    @classmethod
    def build(
        cls,
        fmap1: jnp.ndarray,
        fmap2: jnp.ndarray,
        num_levels: int = 4,
        flash_levels: Optional[int] = None,
        dense_budget: int = 2 * 10**9,
    ):
        """flash_levels=None picks the split automatically: level 0 goes
        through the kernel (it is ~75% of the volume bytes and compute);
        deeper levels stay dense while their volumes fit `dense_budget`
        bytes, otherwise they go through the kernel too (full-frame 4K)."""
        from ..kernels.flashcorr import pad_f2_level

        b, h, w, c = fmap1.shape
        h2, w2 = fmap2.shape[1], fmap2.shape[2]
        pooled = [fmap2]
        for _ in range(num_levels - 1):
            pooled.append(_avg_pool_features(pooled[-1]))

        if flash_levels is None:
            deep = sum(
                pyramid_level_dims(h2, w2, l)[0] * pyramid_level_dims(h2, w2, l)[1]
                for l in range(1, num_levels)
            )
            deep_bytes = b * h * w * deep * fmap1.dtype.itemsize
            flash_levels = 1 if deep_bytes <= dense_budget else num_levels
        flash_levels = max(1, min(num_levels, flash_levels))

        flash_pyr = [pad_f2_level(p) for p in pooled[:flash_levels]]
        dense = None
        if flash_levels < num_levels:
            sub = DenseCorrPyramid.build(
                fmap1, pooled[flash_levels], num_levels - flash_levels
            )
            dense = DenseCorrPyramid(
                sub.pyramid, (b, h, w), (h2, w2), level_offset=flash_levels
            )
        return cls(fmap1, flash_pyr, dense)

    def lookup(
        self, flow: jnp.ndarray, radius: int = 4, border: str = "zeros"
    ) -> jnp.ndarray:
        """[B, H, W, 2] -> [B, H, W, L*(2r+1)^2] f32; same contracts as
        CorrPyramid.lookup (zero-pad border, upstream x-major window
        order)."""
        from ..kernels.flashcorr import flash_patch_level

        b, h, w, _ = flow.shape
        c = self.fmap1.shape[-1]
        # MOF/MemFlow correlate same-resolution frames: target grid ==
        # query grid (the padded flash_pyr dims are storage-only).
        h2, w2 = (self.dense.h2, self.dense.w2) if self.dense else (h, w)
        r = radius
        side = 2 * r + 2
        hw = h * w
        interpret = jax.default_backend() != "tpu"

        ys, xs = jnp.mgrid[0:h, 0:w]
        base_x = (xs.astype(jnp.float32)[None] + flow[..., 0]).reshape(b, hw)
        base_y = (ys.astype(jnp.float32)[None] + flow[..., 1]).reshape(b, hw)
        f1 = self.fmap1.reshape(b, hw, c)

        out = []
        for lvl, f2pad in enumerate(self.flash_pyr):
            lh, lw = pyramid_level_dims(h2, w2, lvl)
            idx = _radius_patch_indices(base_x, base_y, lvl, lh, lw, r)
            patch = flash_patch_level(
                f1, f2pad, idx.rr, idx.cc, lh=lh, lw=lw, side=side,
                interpret=interpret,
            )                                           # [B, hw, side, side]
            out.append(_patch_to_features(patch, idx, lh, lw, border, (b, h, w, r)))
        flash_out = jnp.concatenate(out, axis=-1)
        if self.dense is None:
            return flash_out
        dense_out = self.dense.lookup(flow, radius, border)
        return jnp.concatenate([flash_out, dense_out], axis=-1)


class FlashCorr2:
    """Correlation lookup through the PHASE-PACKED fused Pallas kernel
    (tpuflow.kernels.flashcorr2): every pyramid level is recomputed on
    the MXU from packed pooled target features with zero lane padding —
    no volume bytes in HBM, no volume build, no dense sidecar.  See the
    kernel docstring for the formulation; deep levels correlate against
    avg-pooled features, which equals volume pooling exactly
    (correlation is linear in the target features) up to float
    summation order.
    """

    def __init__(self, fmap1: jnp.ndarray, packed_pyr: List[jnp.ndarray]):
        self.fmap1 = fmap1          # [B, H, W, C]
        self.packed_pyr = packed_pyr  # per level [B, npr_pad*gw, C]

    @classmethod
    def build(cls, fmap1: jnp.ndarray, fmap2: jnp.ndarray, num_levels: int = 4):
        from ..kernels.flashcorr2 import pack_f2_level

        pooled = [fmap2]
        for _ in range(num_levels - 1):
            pooled.append(_avg_pool_features(pooled[-1]))
        return cls(fmap1, [pack_f2_level(p) for p in pooled])

    def lookup(
        self, flow: jnp.ndarray, radius: int = 4, border: str = "zeros"
    ) -> jnp.ndarray:
        """[B, H, W, 2] -> [B, H, W, L*(2r+1)^2] f32; same contracts as
        CorrPyramid.lookup (zero-pad border, upstream x-major window
        order)."""
        from ..kernels.flashcorr2 import flash2_patch_level

        b, h, w, _ = flow.shape
        c = self.fmap1.shape[-1]
        r = radius
        hw = h * w
        interpret = jax.default_backend() != "tpu"

        ys, xs = jnp.mgrid[0:h, 0:w]
        base_x = (xs.astype(jnp.float32)[None] + flow[..., 0]).reshape(b, hw)
        base_y = (ys.astype(jnp.float32)[None] + flow[..., 1]).reshape(b, hw)
        f1 = self.fmap1.reshape(b, hw, c)

        out = []
        for lvl, f2p in enumerate(self.packed_pyr):
            lh, lw = pyramid_level_dims(h, w, lvl)
            idx = _radius_patch_indices(base_x, base_y, lvl, lh, lw, r)
            patch = flash2_patch_level(
                f1, f2p, idx.rr, idx.cc, lh=lh, lw=lw, side=2 * r + 2,
                interpret=interpret,
            )                                           # [B, hw, side, side]
            out.append(_patch_to_features(patch, idx, lh, lw, border, (b, h, w, r)))
        return jnp.concatenate(out, axis=-1)


class _PatchIdx(NamedTuple):
    """Per-level lookup geometry shared by the Pallas patch kernels."""

    yraw: jnp.ndarray  # [B, hw, side] unclamped patch-row indices
    xraw: jnp.ndarray
    rr: jnp.ndarray    # clamped to [0, lh)
    cc: jnp.ndarray    # clamped to [0, lw)
    wx: jnp.ndarray    # [B, hw, 1, 1] bilinear fractions
    wy: jnp.ndarray


def _radius_patch_indices(base_x, base_y, lvl: int, lh: int, lw: int, r: int):
    """Window geometry for one pyramid level: (2r+2)-side patch row/col
    indices around each query's scaled flow target + shared bilinear
    fractions (CorrPyramid.lookup semantics)."""
    side = 2 * r + 2
    jj = jnp.arange(side, dtype=jnp.int32)
    cx = base_x / (2.0**lvl)
    cy = base_y / (2.0**lvl)
    fx0 = jnp.floor(cx)
    fy0 = jnp.floor(cy)
    wx = (cx - fx0)[:, :, None, None]  # [B, hw, 1, 1]
    wy = (cy - fy0)[:, :, None, None]
    px = fx0.astype(jnp.int32) - r
    py = fy0.astype(jnp.int32) - r
    yraw = py[:, :, None] + jj[None, None, :]  # [B, hw, side]
    xraw = px[:, :, None] + jj[None, None, :]
    rr = jnp.clip(yraw, 0, lh - 1)
    cc = jnp.clip(xraw, 0, lw - 1)
    return _PatchIdx(yraw, xraw, rr, cc, wx, wy)


def _patch_to_features(patch, idx: _PatchIdx, lh, lw, border, shape):
    """(2r+2)^2 exact-value patch -> (2r+1)^2 bilinear features: border
    zeroing, shared-fraction bilinear, upstream x-major channel order.
    Identical math to DenseCorrPyramid.lookup's epilogue."""
    b, h, w, r = shape
    dt = patch.dtype
    if border == "zeros":
        vr = ((idx.yraw >= 0) & (idx.yraw < lh)).astype(dt)
        vc = ((idx.xraw >= 0) & (idx.xraw < lw)).astype(dt)
        patch = patch * vr[:, :, :, None] * vc[:, :, None, :]
    v00 = patch[:, :, :-1, :-1]
    v01 = patch[:, :, :-1, 1:]
    v10 = patch[:, :, 1:, :-1]
    v11 = patch[:, :, 1:, 1:]
    wxd = idx.wx.astype(dt)
    wyd = idx.wy.astype(dt)
    sampled = (
        v00 * (1 - wxd) * (1 - wyd)
        + v01 * wxd * (1 - wyd)
        + v10 * (1 - wxd) * wyd
        + v11 * wxd * wyd
    )                                           # [B, hw, 2r+1, 2r+1]
    sampled = sampled.swapaxes(2, 3)  # upstream x-major order
    return sampled.reshape(b, h, w, (2 * r + 1) ** 2).astype(jnp.float32)


class BandCorrPyramid:
    """Materialized pyramid with the BANDED SPARSE streaming lookup
    (kernels/bandlookup.py): volumes stored plane-row-OUTER
    [B, lh8, NQ_pad, lw_pad], and each refinement iteration reads only
    the row chunks each 512-query block's patches actually touch
    (exact ranges from the clamped indices) — typically ~20-40 of 135+
    plane rows at product shapes, vs the XLA dense path's full-volume
    stream per iteration (DenseCorrPyramid docstring).  Worst case
    degrades to the full stream, never worse.

    Numerics: patch entries are exact volume values (one-hot selects,
    f32 MXU accumulate, volume-dtype at rest) — identical to
    DenseCorrPyramid for equal volume values; pooling is the same
    reshape-mean, exact up to float reassociation in the build chunking.
    """

    def __init__(
        self,
        pyramid: List[jnp.ndarray],
        shape: Tuple[int, int, int],
        target_dims: Optional[Tuple[int, int]] = None,
    ):
        self.pyramid = pyramid  # levels [B, lh8, NQ_pad, lw_pad]
        self.b, self.h, self.w = shape
        self.h2, self.w2 = target_dims if target_dims is not None else (self.h, self.w)

    @classmethod
    def build(cls, fmap1: jnp.ndarray, fmap2: jnp.ndarray, num_levels: int = 4):
        """Chunked all-pairs build emitting the band layout directly:
        each query chunk's [nqc, lh, lw] plane stack is pooled per level,
        transposed row-outer, and lane/row padding is emitted as part of
        one final concat (no full-size unpadded+padded copies coexist —
        the DenseCorrPyramid.build HBM lesson)."""
        from ..kernels.bandlookup import QB, pad_plane_dims

        b, h, w, c = fmap1.shape
        h2, w2 = fmap2.shape[1], fmap2.shape[2]
        scale = 1.0 / float(np.sqrt(c))
        dt = fmap1.dtype
        nq = h * w
        nq_pad = -(-nq // QB) * QB

        rows = max(1, min(nq, int(5e8 / max(1, 4 * h2 * w2))))
        parts: List[List[jnp.ndarray]] = [[] for _ in range(num_levels)]
        for bi in range(b):
            for i in range(-(-nq // rows)):
                blk = jnp.einsum(
                    "nc,mc->nm",
                    fmap1.reshape(b, nq, c)[bi, i * rows : (i + 1) * rows],
                    fmap2.reshape(b, h2 * w2, c)[bi],
                    preferred_element_type=jnp.float32,
                )
                x = (blk * scale).astype(dt).reshape(-1, h2, w2)
                for lvl in range(num_levels):
                    lh, lw = pyramid_level_dims(h2, w2, lvl)
                    lh8, lw_pad = pad_plane_dims(lh, lw)
                    part = x.transpose(1, 0, 2)  # [lh, nqc, lw]
                    part = jnp.pad(
                        part, ((0, lh8 - lh), (0, 0), (0, lw_pad - lw))
                    )
                    parts[lvl].append(part)
                    if lvl + 1 < num_levels:
                        x = x[:, : (lh // 2) * 2, : (lw // 2) * 2]
                        x = x.reshape(-1, lh // 2, 2, lw // 2, 2).mean(axis=(2, 4))
        pyramid = []
        for lvl in range(num_levels):
            lh, lw = pyramid_level_dims(h2, w2, lvl)
            lh8, lw_pad = pad_plane_dims(lh, lw)
            per_b = []
            n_chunks = len(parts[lvl]) // b
            for bi in range(b):
                chunk = parts[lvl][bi * n_chunks : (bi + 1) * n_chunks]
                if nq_pad != nq:
                    chunk = chunk + [
                        jnp.zeros((lh8, nq_pad - nq, lw_pad), dt)
                    ]
                per_b.append(
                    chunk[0] if len(chunk) == 1 else jnp.concatenate(chunk, axis=1)
                )
            pyramid.append(jnp.stack(per_b))
        return cls(pyramid, (b, h, w), (h2, w2))

    def lookup(
        self, flow: jnp.ndarray, radius: int = 4, border: str = "zeros"
    ) -> jnp.ndarray:
        """[B, H, W, 2] -> [B, H, W, L*(2r+1)^2] f32; same contracts as
        CorrPyramid.lookup (zero-pad border, upstream x-major window
        order)."""
        from ..kernels.bandlookup import band_patch_level

        b, h, w, _ = flow.shape
        r = radius
        side = 2 * r + 2
        hw = h * w
        interpret = jax.default_backend() != "tpu"

        ys, xs = jnp.mgrid[0:h, 0:w]
        base_x = (xs.astype(jnp.float32)[None] + flow[..., 0]).reshape(b, hw)
        base_y = (ys.astype(jnp.float32)[None] + flow[..., 1]).reshape(b, hw)

        out = []
        for lvl, vol in enumerate(self.pyramid):
            lh, lw = pyramid_level_dims(self.h2, self.w2, lvl)
            idx = _radius_patch_indices(base_x, base_y, lvl, lh, lw, r)
            patch = band_patch_level(
                vol, idx.rr, idx.cc, lh=lh, lw=lw, side=side,
                interpret=interpret,
            )                                           # [B, hw, side, side]
            out.append(_patch_to_features(patch, idx, lh, lw, border, (b, h, w, r)))
        return jnp.concatenate(out, axis=-1)


def make_corr(
    fmap1: jnp.ndarray,
    fmap2: jnp.ndarray,
    num_levels: int = 4,
    impl: str = "auto",
    materialize_threshold: int = 168 * 168,
):
    """Pick the correlation implementation.

    'auto' materializes the volume wherever it fits (dense gather-free
    lookup — flow-independent cost) and switches to the FlashCorr2
    Pallas kernel for larger feature grids where the full volume would
    blow HBM (full-frame >=1440p; static decision — shapes are known at
    trace time).  'flash2' forces the kernel everywhere (since round 4
    it loses to dense even on smooth flows at materializable grids —
    see the regime note below).  'gather' keeps the round-1 patch-take
    lookup for comparison."""
    if impl == "materialized" or impl == "dense":
        return DenseCorrPyramid.build(fmap1, fmap2, num_levels)
    if impl == "gather":
        return CorrPyramid.build(fmap1, fmap2, num_levels)
    if impl == "direct":
        return OnTheFlyCorr.build(fmap1, fmap2, num_levels)
    if impl == "flash":
        return FlashCorr.build(fmap1, fmap2, num_levels)
    if impl == "flash2":
        return FlashCorr2.build(fmap1, fmap2, num_levels)
    if impl == "band":
        return BandCorrPyramid.build(fmap1, fmap2, num_levels)
    hw = fmap1.shape[1] * fmap1.shape[2]
    if hw > materialize_threshold:
        # Too big to materialize: FlashCorr2 recomputes correlation rows
        # on the MXU from packed pooled features — one 4-level 2160p
        # full-frame lookup measured 0.079 s vs the XLA OnTheFlyCorr
        # fallback's ~30 min (v5e, benchmarks/micro_4k.py).
        if jax.default_backend() == "tpu":
            return FlashCorr2.build(fmap1, fmap2, num_levels)
        return OnTheFlyCorr.build(fmap1, fmap2, num_levels)
    # Materializable: dense DOMINATES both flow regimes since round 4
    # (v5e, benchmarks/micro_corrvariants.py, build + 12-iteration
    # 2-direction lookup at the bench tile): 413-418 ms vs flash2's
    # 546 + 7 ms in flash2's own BEST case (FLOWSCALE=0, maximal chunk
    # gating) — and dense is flow-independent while chaotic flows
    # degrade flash2 further (r3: FLOWSCALE=40 -> 855 ms).  This closes
    # VERDICT r3 next-step #10 (flow-adaptive dense-vs-flash2 gating)
    # as moot: there is no regime left where the gate would pick
    # flash2 at materializable grids.  The round-3 numbers that
    # motivated it (flash2 617 vs dense 669+164) predate the pooled
    # dense build and the fused lookup kernel.  v1 FlashCorr (681 ms +
    # deep-level sidecar) and the banded DMA variant (291 ms vs dense
    # 173 ms smooth at round-2 shapes, 1.67x volume bytes) both lost at
    # every setting; all stay reachable via impl= for regression
    # comparison; flash2 remains the >threshold path above.
    return DenseCorrPyramid.build(fmap1, fmap2, num_levels)
