"""Flow-correction engine: batched phase correlation + NCC template match.

The reference corrects bad flow pixels one at a time in Python with
cv2.phaseCorrelate and cv2.matchTemplate inside a thread pool
(correction_worker.py:62-138, 221-342; flow_visualizer.py:2725-2865).
Here every bad pixel of a frame is corrected in ONE batched device pass:

  1. `quality_frame` marks bad pixels (red channel > 0 — the worker
     predicate at correction_worker.py:248).
  2. coarse: extract regions around each bad pixel and its LOD-predicted
     target, batched FFT phase correlation -> translation per pixel
     (correction_worker.py:80-97).
  3. fine (where coarse quality < threshold): batched NCC template match
     (TM_CCOEFF_NORMED semantics) of an 11px-radius template over a
     50px-radius search area (correction_worker.py:99-138), plus the
     spiral color-match rescue evaluated as a single prioritized argmax
     over the spiral positions instead of a sequential walk.
  4. accept a correction if it reaches good quality or improves on the
     original (correction_worker.py:306-312); corrected flows are written
     to a sibling `<cache>_corrected/` directory (:322-330).

Coordinate convention throughout: target = source - flow (backward
sampling), matching the correction engine.
"""

from __future__ import annotations

import os
from functools import partial
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..pipeline import ops
from ..pipeline.cache import FlowFileHandler

# Reference constants (flow_visualizer.py config; correction_worker usage).
GOOD_QUALITY_THRESHOLD = 0.98
FINE_CORRECTION_THRESHOLD = 0.95
DETAIL_ANALYSIS_REGION_SIZE = 50
TEMPLATE_RADIUS = 11
SEARCH_RADIUS = 50


def generate_spiral_offsets(width: int, height: int) -> np.ndarray:
    """Outward spiral coordinates from the center, in visit order
    (correction_worker.py:33-42)."""
    out = []
    x, y = 0, 0
    dx, dy = 0, -1
    for _ in range(max(width, height) ** 2):
        if (-width / 2 < x <= width / 2) and (-height / 2 < y <= height / 2):
            out.append((x, y))
        if x == y or (x < 0 and x == -y) or (x > 0 and x == 1 - y):
            dx, dy = -dy, dx
        x, y = x + dx, y + dy
    return np.asarray(out, dtype=np.int32)


# ---------------------------------------------------------------------------
# Batched region extraction
# ---------------------------------------------------------------------------
def extract_regions(
    image: jnp.ndarray, centers_x: jnp.ndarray, centers_y: jnp.ndarray, radius: int
) -> jnp.ndarray:
    """Extract [N, 2r, 2r(, C)] square regions with zero padding outside
    the image (correction_worker.py:44-60 semantics: the region starts at
    center - radius clamped to 0 and is zero-padded at the bottom/right to
    2r).  Batched gather."""
    h, w = image.shape[0], image.shape[1]
    size = int(2 * radius)
    x1 = jnp.maximum(0, centers_x.astype(jnp.int32) - radius)
    y1 = jnp.maximum(0, centers_y.astype(jnp.int32) - radius)
    x2 = jnp.minimum(w, centers_x.astype(jnp.int32) + radius)
    y2 = jnp.minimum(h, centers_y.astype(jnp.int32) + radius)

    dx = jnp.arange(size)
    dy = jnp.arange(size)
    xs = x1[:, None] + dx[None, :]            # [N, size]
    ys = y1[:, None] + dy[None, :]
    valid = (xs < x2[:, None])[:, None, :] & (ys < y2[:, None])[:, :, None]

    xs_c = jnp.clip(xs, 0, w - 1)
    ys_c = jnp.clip(ys, 0, h - 1)
    gathered = image[ys_c[:, :, None], xs_c[:, None, :]]  # [N, size, size(, C)]
    if gathered.ndim == 4:
        valid = valid[..., None]
    return jnp.where(valid, gathered, 0)


def to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """cv2 RGB2GRAY weights."""
    return (
        0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    ).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Batched phase correlation
# ---------------------------------------------------------------------------
def phase_correlate_batch(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Translation estimate per pair via the cross-power spectrum
    (cv2.phaseCorrelate semantics, correction_worker.py:62-78): peak of
    the inverse FFT of the normalized cross spectrum, refined to subpixel
    with a 5x5 weighted centroid around the peak, and a confidence equal
    to the response energy around the peak.

    a, b: [N, H, W] float32 grayscale. Returns (shift_xy [N, 2], conf [N])
    where b ~= a shifted by shift_xy."""
    n, h, w = a.shape
    fa = jnp.fft.rfft2(a)
    fb = jnp.fft.rfft2(b)
    cross = jnp.conj(fa) * fb
    cross = cross / jnp.maximum(jnp.abs(cross), 1e-10)
    resp = jnp.fft.irfft2(cross, s=(h, w))  # [N, H, W]

    flat_idx = jnp.argmax(resp.reshape(n, -1), axis=-1)
    py = flat_idx // w
    px = flat_idx % w

    # 5x5 weighted centroid around the (wrapped) peak.
    dy, dx = jnp.mgrid[-2:3, -2:3]
    ys = (py[:, None, None] + dy[None]) % h
    xs = (px[:, None, None] + dx[None]) % w
    vals = jnp.maximum(resp[jnp.arange(n)[:, None, None], ys, xs], 0.0)
    wsum = jnp.sum(vals, axis=(1, 2))
    # Centroid in wrapped offsets relative to the peak.
    cy = jnp.sum(vals * dy[None], axis=(1, 2)) / jnp.maximum(wsum, 1e-10)
    cx = jnp.sum(vals * dx[None], axis=(1, 2)) / jnp.maximum(wsum, 1e-10)

    # Unwrap: peaks beyond the Nyquist fold are negative shifts.
    sx = jnp.where(px > w // 2, px - w, px).astype(jnp.float32) + cx
    sy = jnp.where(py > h // 2, py - h, py).astype(jnp.float32) + cy

    peak = resp[jnp.arange(n), py, px]
    conf = jnp.clip(peak, 0.0, 1.0)
    return jnp.stack([sx, sy], axis=-1), conf


# ---------------------------------------------------------------------------
# Batched NCC template matching (TM_CCOEFF_NORMED)
# ---------------------------------------------------------------------------
def ncc_match_batch(search: jnp.ndarray, template: jnp.ndarray) -> jnp.ndarray:
    """TM_CCOEFF_NORMED response maps for N independent (search, template)
    pairs — the batched analogue of cv2.matchTemplate at
    correction_worker.py:107.

    search:   [N, S, S, C] float32
    template: [N, t, t, C] float32
    Returns [N, S-t+1, S-t+1] responses in [-1, 1]."""
    n, s, _, c = search.shape
    t = template.shape[1]
    out_dim = s - t + 1
    area = t * t * c

    tmean = jnp.mean(template, axis=(1, 2, 3), keepdims=True)
    tz = template - tmean
    tnorm = jnp.sqrt(jnp.sum(tz**2, axis=(1, 2, 3)))  # [N]

    # Numerator: correlation of search with zero-mean template, one group
    # per pair via feature_group_count over the batch dim folded into
    # channels: reshape to [1, S, S, N*C] with grouped conv.
    lhs = jnp.transpose(search, (1, 2, 0, 3)).reshape(1, s, s, n * c)
    rhs = jnp.transpose(tz, (1, 2, 3, 0)).reshape(t, t, c, n)
    num = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=n,
        preferred_element_type=jnp.float32,
    )[0]  # [out, out, N]
    num = jnp.transpose(num, (2, 0, 1))  # [N, out, out]

    # Window sums for the search mean/std via a ones-kernel grouped conv.
    ones = jnp.ones((t, t, c, n), jnp.float32)
    ssum = jax.lax.conv_general_dilated(
        lhs, ones, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=n, preferred_element_type=jnp.float32,
    )[0]
    ssum = jnp.transpose(ssum, (2, 0, 1))
    ssq = jax.lax.conv_general_dilated(
        jnp.transpose(search**2, (1, 2, 0, 3)).reshape(1, s, s, n * c),
        ones, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=n, preferred_element_type=jnp.float32,
    )[0]
    ssq = jnp.transpose(ssq, (2, 0, 1))

    svar = jnp.maximum(ssq - ssum**2 / area, 0.0)
    snorm = jnp.sqrt(svar)

    denom = snorm * tnorm[:, None, None]
    return jnp.where(denom > 1e-6, num / jnp.maximum(denom, 1e-30), 0.0)


# ---------------------------------------------------------------------------
# The correction passes
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("region_size",))
def coarse_correction_batch(
    frame1: jnp.ndarray,
    frame2: jnp.ndarray,
    sources: jnp.ndarray,       # [N, 2] (x, y) int
    lod_flows: jnp.ndarray,     # [N, 2] LOD-predicted flow at each source
    region_size: int = DETAIL_ANALYSIS_REGION_SIZE,
):
    """Batched coarse correction (correction_worker.py:80-97): phase-
    correlate the region around each source with the region around its
    LOD-predicted target; corrected_flow = lod_flow - shift.

    Returns dict of per-pixel arrays: flow [N,2], target [N,2],
    similarity [N], confidence [N]."""
    h, w = frame1.shape[0], frame1.shape[1]
    sx = sources[:, 0].astype(jnp.float32)
    sy = sources[:, 1].astype(jnp.float32)
    lod_tx = sx - lod_flows[:, 0]
    lod_ty = sy - lod_flows[:, 1]

    g1 = to_gray(frame1.astype(jnp.float32))
    g2 = to_gray(frame2.astype(jnp.float32))
    r1 = extract_regions(g1, sources[:, 0], sources[:, 1], region_size)
    r2 = extract_regions(g2, lod_tx.astype(jnp.int32), lod_ty.astype(jnp.int32), region_size)

    shift, conf = phase_correlate_batch(r1, r2)
    corrected = lod_flows - shift  # [N, 2]

    tgt_x = sx - corrected[:, 0]
    tgt_y = sy - corrected[:, 1]
    inb = (tgt_x >= 0) & (tgt_x < w) & (tgt_y >= 0) & (tgt_y < h)
    txi = jnp.clip(tgt_x.astype(jnp.int32), 0, w - 1)
    tyi = jnp.clip(tgt_y.astype(jnp.int32), 0, h - 1)
    src_colors = frame1[sources[:, 1], sources[:, 0]].astype(jnp.float32)
    tgt_colors = frame2[tyi, txi].astype(jnp.float32)
    sim = jnp.where(inb, ops.pixel_quality(src_colors, tgt_colors), 0.0)
    return {
        "flow": corrected,
        "target": jnp.stack([tgt_x, tgt_y], axis=-1),
        "similarity": sim,
        "confidence": conf,
    }


@partial(jax.jit, static_argnames=("template_radius", "search_radius", "threshold"))
def fine_correction_batch(
    frame1: jnp.ndarray,
    frame2: jnp.ndarray,
    sources: jnp.ndarray,        # [N, 2]
    coarse_targets: jnp.ndarray, # [N, 2] float
    template_radius: int = TEMPLATE_RADIUS,
    search_radius: int = SEARCH_RADIUS,
    threshold: float = GOOD_QUALITY_THRESHOLD,
):
    """Batched fine correction (correction_worker.py:99-138): NCC template
    match + spiral color rescue.

    The spiral rescue evaluates all spiral positions at once and picks the
    FIRST good one in spiral order (prioritized argmax), matching the
    reference's sequential early-exit walk."""
    h, w = frame1.shape[0], frame1.shape[1]
    f1 = frame1.astype(jnp.float32)
    f2 = frame2.astype(jnp.float32)

    template = extract_regions(f1, sources[:, 0], sources[:, 1], template_radius)
    ctx = coarse_targets[:, 0].astype(jnp.int32)
    cty = coarse_targets[:, 1].astype(jnp.int32)
    search = extract_regions(f2, ctx, cty, search_radius)

    resp = ncc_match_batch(search, template)  # [N, out, out]
    n, out_dim, _ = resp.shape
    flat = jnp.argmax(resp.reshape(n, -1), axis=-1)
    loc_y = flat // out_dim
    loc_x = flat % out_dim
    max_val = resp.reshape(n, -1)[jnp.arange(n), flat]

    # Search-area origin (clamped like extract_regions).
    sb_x = jnp.maximum(0, ctx - search_radius)
    sb_y = jnp.maximum(0, cty - search_radius)
    patch_cx = sb_x + loc_x + template_radius
    patch_cy = sb_y + loc_y + template_radius

    src_colors = f1[sources[:, 1], sources[:, 0]]
    pcx = jnp.clip(patch_cx, 0, w - 1)
    pcy = jnp.clip(patch_cy, 0, h - 1)
    patch_sim = ops.pixel_quality(src_colors, f2[pcy, pcx])

    # Spiral rescue around the matched patch center.
    spiral = jnp.asarray(generate_spiral_offsets(template_radius * 2, template_radius * 2))
    k = spiral.shape[0]
    cand_x = patch_cx[:, None] + spiral[None, :, 0]
    cand_y = patch_cy[:, None] + spiral[None, :, 1]
    inb = (cand_x >= 0) & (cand_x < w) & (cand_y >= 0) & (cand_y < h)
    cxc = jnp.clip(cand_x, 0, w - 1)
    cyc = jnp.clip(cand_y, 0, h - 1)
    cand_sim = ops.pixel_quality(src_colors[:, None, :], f2[cyc, cxc])
    cand_good = (cand_sim > threshold) & inb
    # First good spiral position: argmax of good-flag weighted by reverse
    # order so earlier positions win.
    priority = cand_good.astype(jnp.float32) * (k - jnp.arange(k))[None, :]
    first = jnp.argmax(priority, axis=-1)
    any_good = jnp.any(cand_good, axis=-1)

    need_rescue = patch_sim <= threshold
    use_spiral = need_rescue & any_good
    fin_x = jnp.where(use_spiral, cand_x[jnp.arange(n), first], patch_cx)
    fin_y = jnp.where(use_spiral, cand_y[jnp.arange(n), first], patch_cy)
    fin_sim = jnp.where(use_spiral, cand_sim[jnp.arange(n), first], patch_sim)

    flow_x = sources[:, 0].astype(jnp.float32) - fin_x
    flow_y = sources[:, 1].astype(jnp.float32) - fin_y
    return {
        "flow": jnp.stack([flow_x, flow_y], axis=-1),
        "target": jnp.stack([fin_x, fin_y], axis=-1).astype(jnp.float32),
        "similarity": fin_sim,
        "confidence": max_val,
    }


# ---------------------------------------------------------------------------
# Frame-level driver (the batched replacement of worker_process)
# ---------------------------------------------------------------------------
def correct_frame(
    frame1: np.ndarray,
    frame2: np.ndarray,
    flow: np.ndarray,
    lod_flow: Optional[np.ndarray] = None,
    good_quality_threshold: float = GOOD_QUALITY_THRESHOLD,
    fine_threshold: float = FINE_CORRECTION_THRESHOLD,
    max_pixels: int = 65536,
) -> Dict:
    """Correct all bad pixels of one frame in two batched device passes
    (the reference loops pixels in Python, correction_worker.py:268-312).

    Returns {'flow': corrected flow, 'initial_errors': int,
    'final_errors': int}."""
    h, w = frame1.shape[:2]
    qf = np.asarray(ops.quality_frame(frame1, frame2, flow, good_quality_threshold))
    bad_y, bad_x = np.where(qf[:, :, 0] > 0)
    initial = len(bad_y)
    if initial == 0:
        return {"flow": flow, "initial_errors": 0, "final_errors": 0}
    if initial > max_pixels:
        order = np.argsort(-qf[bad_y, bad_x, 0])[:max_pixels]
        bad_y, bad_x = bad_y[order], bad_x[order]

    sources = np.stack([bad_x, bad_y], axis=-1).astype(np.int32)

    if lod_flow is None:
        lod_flow = flow
    lh, lw = lod_flow.shape[:2]
    ly = np.clip((bad_y * lh) // h, 0, lh - 1)
    lx = np.clip((bad_x * lw) // w, 0, lw - 1)
    lod_vectors = lod_flow[ly, lx] / np.array([lw / w, lh / h])

    # Original similarity at each bad pixel (acceptance baseline,
    # correction_worker.py:283-292).
    orig_flow_vec = flow[bad_y, bad_x]
    otx = np.clip(np.round(bad_x - orig_flow_vec[:, 0]).astype(int), 0, w - 1)
    oty = np.clip(np.round(bad_y - orig_flow_vec[:, 1]).astype(int), 0, h - 1)
    inb = (
        (bad_x - orig_flow_vec[:, 0] >= 0) & (bad_x - orig_flow_vec[:, 0] < w)
        & (bad_y - orig_flow_vec[:, 1] >= 0) & (bad_y - orig_flow_vec[:, 1] < h)
    )
    orig_sim = np.where(
        inb,
        np.asarray(
            ops.pixel_quality(
                jnp.asarray(frame1[bad_y, bad_x], jnp.float32),
                jnp.asarray(frame2[oty, otx], jnp.float32),
            )
        ),
        0.0,
    )

    f1 = jnp.asarray(frame1)
    f2 = jnp.asarray(frame2)
    coarse = coarse_correction_batch(
        f1, f2, jnp.asarray(sources), jnp.asarray(lod_vectors, jnp.float32)
    )
    coarse = {k: np.asarray(v) for k, v in coarse.items()}

    need_fine = coarse["similarity"] < fine_threshold
    final_flow_vec = coarse["flow"].copy()
    final_sim = coarse["similarity"].copy()

    if need_fine.any():
        idx = np.where(need_fine)[0]
        fine = fine_correction_batch(
            f1,
            f2,
            jnp.asarray(sources[idx]),
            jnp.asarray(coarse["target"][idx]),
        )
        fine = {k: np.asarray(v) for k, v in fine.items()}
        better = fine["similarity"] > coarse["similarity"][idx]
        final_flow_vec[idx[better]] = fine["flow"][better]
        final_sim[idx[better]] = fine["similarity"][better]

    # Accept if good or improved (correction_worker.py:306-312).
    accept = (final_sim > good_quality_threshold) | (final_sim > orig_sim)
    corrected = flow.copy()
    corrected[bad_y[accept], bad_x[accept]] = final_flow_vec[accept]

    qf2 = np.asarray(ops.quality_frame(frame1, frame2, corrected, good_quality_threshold))
    final = int((qf2[:, :, 0] > 0).sum())
    return {"flow": corrected, "initial_errors": initial, "final_errors": final}


def correct_cache_range(
    frames: List[np.ndarray],
    flow_files: List[str],
    frame_indices: List[int],
    lod_loader=None,
    progress: bool = True,
) -> List[Dict]:
    """Batch correction over a frame range, writing corrected flows to a
    sibling `<cache>_corrected/` directory (correction_worker.py:322-330).
    The reference shards this over a thread pool; the batched kernels make
    one device pass per frame instead."""
    results = []
    iterator = frame_indices
    if progress:
        try:
            from tqdm import tqdm

            iterator = tqdm(frame_indices, desc="Correcting flow")
        except ImportError:
            pass
    for i in iterator:
        if i + 1 >= len(frames):
            continue
        path = Path(flow_files[i])
        flow = (
            FlowFileHandler.load_flow_flo(str(path))
            if path.suffix == ".flo"
            else FlowFileHandler.load_flow_npz(str(path))["flow"]
        )
        lod = lod_loader(i) if lod_loader else None
        res = correct_frame(frames[i], frames[i + 1], flow, lod)
        out_dir = path.parent.with_name(path.parent.name + "_corrected")
        out_dir.mkdir(exist_ok=True)
        out_path = out_dir / path.name
        if out_path.suffix == ".flo":
            FlowFileHandler.save_flow_flo(res["flow"], str(out_path))
        else:
            FlowFileHandler.save_flow_npz(res["flow"], str(out_path))
        res["path"] = str(out_path)
        results.append(res)
    return results
