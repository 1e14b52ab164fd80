"""On-TPU image/flow ops: encoders, TAA, quality maps, turbulence, LOD.

Every function here is a pure jnp function (jit/vmap/scan-friendly, static
shapes, no Python branching on data).  Numerics mirror the reference's
numpy/cv2 formulas so outputs are interchangeable:

- HSV encoder          -> /root/reference/encoding/flow_encoders.py:30-67
- gamedev RG encoder   -> flow_encoders.py:70-117
- motion-vectors RG8   -> flow_encoders.py:120-177 (encode + exact decode)
- motion-vectors RGB8  -> flow_encoders.py:180-364 ('rgb+' method, module
  default at flow_encoders.py:10, plus legacy dir+mag and YCbCr variants)
- color wheel          -> flow_encoders.py:367-427 (Middlebury wheel,
  torchvision.utils.flow_to_image semantics)
- TAA warp+blend       -> effects/taa_processor.py:92-262
- quality map          -> correction_worker.py:9-27, 175-208
- turbulence map       -> flow_visualizer.py:2997-3052
- LOD pyramid          -> storage/cache_manager.py:73-161

The per-frame-normalized HSV encoder's max-magnitude reduce and TAA's
history are data dependencies the reference handles imperatively; here they
are explicit inputs/carries so the whole post-pipeline fuses under jit.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# =============================================================================
# HSV helpers (OpenCV uint8 semantics: H in [0,180], S,V in [0,255])
# =============================================================================
def hsv_to_rgb_u8(hsv: jnp.ndarray) -> jnp.ndarray:
    """HSV (uint8, OpenCV ranges) -> RGB uint8, matching cv2.COLOR_HSV2RGB.

    OpenCV maps H in [0,180] to [0,360) degrees. Float math then round.
    """
    h = hsv[..., 0].astype(jnp.float32) * 2.0  # degrees
    s = hsv[..., 1].astype(jnp.float32) / 255.0
    v = hsv[..., 2].astype(jnp.float32)

    h60 = h / 60.0
    sector = jnp.floor(h60).astype(jnp.int32) % 6
    f = h60 - jnp.floor(h60)

    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))

    # sector -> (r, g, b) selection
    r = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [v, q, p, p, t],
        default=v,
    )
    g = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [t, v, v, q, p],
        default=p,
    )
    b = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [p, p, t, v, v],
        default=q,
    )
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)


# =============================================================================
# Flow encoders
# =============================================================================
def encode_hsv(flow: jnp.ndarray) -> jnp.ndarray:
    """HSV flow visualization (flow_encoders.py:38-67): hue=angle,
    sat=magnitude / per-frame max magnitude, val=255."""
    flow = jnp.nan_to_num(flow, nan=0.0, posinf=1.0, neginf=-1.0)
    magnitude = jnp.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
    angle = jnp.arctan2(flow[..., 1], flow[..., 0])

    hue = (angle + jnp.pi) / (2 * jnp.pi) * 180.0
    hue = jnp.clip(hue, 0, 180).astype(jnp.uint8)

    max_magnitude = jnp.max(magnitude)
    saturation = jnp.where(
        max_magnitude > 0,
        (magnitude / jnp.maximum(max_magnitude, 1e-30) * 255.0),
        0.0,
    ).astype(jnp.uint8)
    value = jnp.full_like(saturation, 255, dtype=jnp.uint8)
    hsv = jnp.stack([hue, saturation, value], axis=-1)
    return hsv_to_rgb_u8(hsv)


def encode_gamedev(
    flow: jnp.ndarray,
    width: int,
    height: int,
    scale_factor: float = 200.0,
    clamp_range: float = 20.0,
) -> jnp.ndarray:
    """Gamedev RG encoding (flow_encoders.py:90-117): normalize by frame
    dims, x200, clamp +/-20, map to [0,1] in R (x) and G (y), B=0."""
    fx = flow[..., 0] / width * scale_factor
    fy = flow[..., 1] / height * scale_factor
    enc = jnp.stack([fx, fy], axis=-1)
    enc = jnp.clip(enc, -clamp_range, clamp_range)
    enc = (enc + clamp_range) / (2 * clamp_range)
    enc = jnp.clip(enc, 0.0, 1.0)
    rgb = jnp.concatenate([enc, jnp.zeros_like(enc[..., :1])], axis=-1)
    rgb = rgb * 255.0
    rgb = jnp.nan_to_num(rgb, nan=0.0, posinf=255.0, neginf=0.0)
    return rgb.astype(jnp.uint8)


def encode_motion_vectors_rg8(flow: jnp.ndarray, clamp_range: float = 64.0) -> jnp.ndarray:
    """RG8 UNORM encoding (flow_encoders.py:131-153)."""
    clamped = jnp.clip(flow, -clamp_range, clamp_range)
    enc = (clamped + clamp_range) / (2 * clamp_range)
    enc = jnp.clip(enc, 0.0, 1.0)
    rgb = jnp.concatenate([enc, jnp.zeros_like(enc[..., :1])], axis=-1) * 255.0
    rgb = jnp.nan_to_num(rgb, nan=0.0, posinf=255.0, neginf=0.0)
    return rgb.astype(jnp.uint8)


def decode_motion_vectors_rg8(encoded: jnp.ndarray, clamp_range: float = 64.0) -> jnp.ndarray:
    """Exact inverse of RG8 encode (flow_encoders.py:155-177)."""
    normalized = encoded.astype(jnp.float32) / 255.0
    flow = normalized[..., :2]
    return flow * (2 * clamp_range) - clamp_range


def encode_motion_vectors_rgb8(
    flow: jnp.ndarray, clamp_range: float = 32.0, method: str = "rgb+"
) -> jnp.ndarray:
    """RGB8 encoding (flow_encoders.py:191-293). Default 'rgb+' method
    (module-level `method='rgb+'`, flow_encoders.py:10): RG hold the
    clamped direction, B holds the sqrt(1-x^2-y^2) length corrector."""
    fx = flow[..., 0]
    fy = flow[..., 1]

    if method == "rgb+":
        dx = fx / clamp_range
        dy = fy / clamp_range
        length = jnp.sqrt(dx**2 + dy**2)
        scale = jnp.where(length > 1.0, 1.0 / jnp.maximum(length, 1e-30), 1.0)
        dx = dx * scale
        dy = dy * scale
        corrector = jnp.sqrt(jnp.maximum(1.0 - dx**2 - dy**2, 0.0))
        r = (jnp.clip(dx, -1, 1) + 1) / 2
        g = (jnp.clip(dy, -1, 1) + 1) / 2
        rgb = jnp.stack([r, g, corrector], axis=-1)
    elif method == "rgb-ycbcr":
        magnitude = jnp.sqrt(fx**2 + fy**2)
        magnitude_clamped = jnp.clip(magnitude, 0, clamp_range)
        nz = magnitude > 1e-6
        inv_mag = jnp.where(nz, 1.0 / jnp.maximum(magnitude, 1e-30), 0.0)
        dx = jnp.clip(fx * inv_mag, -1, 1)
        dy = jnp.clip(fy * inv_mag, -1, 1)
        mag_norm = magnitude_clamped / clamp_range
        Y = mag_norm * (1 - 0.7) + 0.5 * 0.7
        Cb = 0.5 + dx * 0.2
        Cr = 0.5 + dy * 0.2
        R = Y + 1.402 * (Cr - 0.5)
        G = Y - 0.344136 * (Cb - 0.5) - 0.714136 * (Cr - 0.5)
        B = Y + 1.772 * (Cb - 0.5)
        rgb = jnp.stack([R, G, B], axis=-1)
    else:  # legacy dir+mag: R=dir_x, G=magnitude, B=dir_y
        magnitude = jnp.sqrt(fx**2 + fy**2)
        magnitude_clamped = jnp.clip(magnitude, 0, clamp_range)
        nz = magnitude > 1e-6
        inv_mag = jnp.where(nz, 1.0 / jnp.maximum(magnitude, 1e-30), 0.0)
        dx = (jnp.clip(fx * inv_mag, -1, 1) + 1) / 2
        dy = (jnp.clip(fy * inv_mag, -1, 1) + 1) / 2
        mag_norm = magnitude_clamped / clamp_range
        rgb = jnp.stack([dx, mag_norm, dy], axis=-1)

    rgb = rgb * 255.0
    rgb = jnp.nan_to_num(rgb, nan=0.0, posinf=255.0, neginf=0.0)
    return rgb.astype(jnp.uint8)


def decode_motion_vectors_rgb8(
    encoded: jnp.ndarray, clamp_range: float = 32.0, method: str = "rgb+"
) -> jnp.ndarray:
    """Inverse of RGB8 encode (flow_encoders.py:295-364)."""
    normalized = encoded.astype(jnp.float32) / 255.0

    if method == "rgb+":
        dx = normalized[..., 0] * 2 - 1
        dy = normalized[..., 1] * 2 - 1
        corrector = normalized[..., 2]
        corrected_len = jnp.sqrt(dx**2 + dy**2 + corrector**2)
        magnitude = 1.0 / jnp.maximum(corrected_len, 1e-30) * clamp_range
    elif method == "rgb-ycbcr":
        R = normalized[..., 0]
        G = normalized[..., 1]
        B = normalized[..., 2]
        Y = 0.299 * R + 0.587 * G + 0.114 * B
        Cb = 0.5643 * (B - Y) + 0.5
        Cr = 0.7132 * (R - Y) + 0.5
        Y = (Y - 0.5 * 0.7) / (1 - 0.7)
        Cb = (-0.5 + Cb) / 0.2
        Cr = (-0.5 + Cr) / 0.2
        dx = Cb
        dy = Cr
        magnitude = Y * clamp_range
    else:
        dx = normalized[..., 0] * 2 - 1
        magnitude = normalized[..., 1] * clamp_range
        dy = normalized[..., 2] * 2 - 1

    return jnp.stack([dx * magnitude, dy * magnitude], axis=-1)


# Middlebury color wheel (RY=15, YG=6, GC=4, CB=11, BM=13, MR=6 = 55 colors),
# as used by torchvision.utils.flow_to_image (flow_encoders.py:367-427).
def _make_colorwheel() -> np.ndarray:
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    colorwheel = np.zeros((ncols, 3))
    col = 0
    colorwheel[0:RY, 0] = 255
    colorwheel[0:RY, 1] = np.floor(255 * np.arange(0, RY) / RY)
    col += RY
    colorwheel[col : col + YG, 0] = 255 - np.floor(255 * np.arange(0, YG) / YG)
    colorwheel[col : col + YG, 1] = 255
    col += YG
    colorwheel[col : col + GC, 1] = 255
    colorwheel[col : col + GC, 2] = np.floor(255 * np.arange(0, GC) / GC)
    col += GC
    colorwheel[col : col + CB, 1] = 255 - np.floor(255 * np.arange(0, CB) / CB)
    colorwheel[col : col + CB, 2] = 255
    col += CB
    colorwheel[col : col + BM, 2] = 255
    colorwheel[col : col + BM, 0] = np.floor(255 * np.arange(0, BM) / BM)
    col += BM
    colorwheel[col : col + MR, 2] = 255 - np.floor(255 * np.arange(0, MR) / MR)
    colorwheel[col : col + MR, 0] = 255
    return colorwheel


_COLORWHEEL = jnp.asarray(_make_colorwheel(), dtype=jnp.float32)


def encode_colorwheel(flow: jnp.ndarray) -> jnp.ndarray:
    """Middlebury color-wheel visualization with torchvision
    flow_to_image semantics (per-frame max-norm normalization, then the
    classic Baker et al. wheel lookup).  Replaces the reference's
    torchvision dependency (flow_encoders.py:399-427)."""
    u = flow[..., 0]
    v = flow[..., 1]
    norm = jnp.sqrt(u**2 + v**2)
    max_norm = jnp.max(norm)
    eps = 1e-5
    u = u / (max_norm + eps)
    v = v / (max_norm + eps)
    rad = jnp.sqrt(u**2 + v**2)

    ncols = _COLORWHEEL.shape[0]
    a = jnp.arctan2(-v, -u) / jnp.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = jnp.floor(fk).astype(jnp.int32)
    k1 = (k0 + 1) % ncols
    f = fk - k0

    col0 = _COLORWHEEL[k0] / 255.0
    col1 = _COLORWHEEL[k1] / 255.0
    col = (1 - f[..., None]) * col0 + f[..., None] * col1
    col = 1 - rad[..., None] * (1 - col)
    return jnp.floor(255.0 * col).astype(jnp.uint8)


def encode_flow(
    flow: jnp.ndarray,
    width: int,
    height: int,
    format_name: str = "gamedev",
    clamp_range: float = 32.0,
) -> jnp.ndarray:
    """Dispatch by format name (flow_encoders.py:430-499). Static string
    dispatch — resolved at trace time."""
    format_name = format_name.lower()
    if format_name == "hsv":
        return encode_hsv(flow)
    if format_name == "gamedev":
        return encode_gamedev(flow, width, height)
    if format_name == "torchvision":
        return encode_colorwheel(flow)
    if format_name == "motion-vectors-rg8":
        return encode_motion_vectors_rg8(flow, clamp_range)
    if format_name == "motion-vectors-rgb8":
        return encode_motion_vectors_rgb8(flow, clamp_range)
    raise ValueError(
        f"Unsupported format '{format_name}'. Available formats: "
        "hsv, gamedev, torchvision, motion-vectors-rg8, motion-vectors-rgb8"
    )


# =============================================================================
# Bilinear / bilateral resampling + TAA
# =============================================================================
def bilinear_sample(image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear gather at float coords (taa_processor.py:218-262).
    image: [H, W, C]; x, y: [H, W] (or any matching shape)."""
    h, w = image.shape[0], image.shape[1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x0 = jnp.clip(x0, 0, w - 1)
    y0 = jnp.clip(y0, 0, h - 1)

    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    p00 = image[y0, x0]
    p01 = image[y0, x1]
    p10 = image[y1, x0]
    p11 = image[y1, x1]
    return (
        p00 * (1 - wx) * (1 - wy)
        + p01 * wx * (1 - wy)
        + p10 * (1 - wx) * wy
        + p11 * wx * wy
    )


def bilateral_reprojection_sample(
    image: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    current_frame: jnp.ndarray,
    sigma_color: float = 25.0,
) -> jnp.ndarray:
    """4-tap bilinear weights x luminance-similarity Gaussian weights
    (taa_processor.py:149-216).  Note the reference clamps x0 to w-2 /
    y0 to h-2 (not w-1), reproduced here."""
    h, w = image.shape[0], image.shape[1]
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    x1 = x0 + 1
    y1 = y0 + 1

    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    p00 = image[y0, x0]
    p01 = image[y0, x1]
    p10 = image[y1, x0]
    p11 = image[y1, x1]

    current_lum = jnp.mean(current_frame, axis=-1)
    sigma_sq = sigma_color**2 * 0.1

    def color_weight(p):
        lum_diff = current_lum - jnp.mean(p, axis=-1)
        return jnp.exp(-(lum_diff**2) / (2 * sigma_sq + 1e-6))[..., None]

    w00 = (1 - wx) * (1 - wy) * color_weight(p00)
    w01 = wx * (1 - wy) * color_weight(p01)
    w10 = (1 - wx) * wy * color_weight(p10)
    w11 = wx * wy * color_weight(p11)

    total = w00 + w01 + w10 + w11
    total = jnp.where(total == 0, 1e-6, total)
    return (p00 * w00 + p01 * w01 + p10 * w10 + p11 * w11) / total


def taa_step(
    current_frame: jnp.ndarray,
    flow_pixels: Optional[jnp.ndarray],
    previous_taa: jnp.ndarray,
    alpha: float = 0.1,
    use_flow: bool = True,
    use_bilateral: bool = True,
    sigma_color: float = 25.0,
) -> jnp.ndarray:
    """One TAA step: reproject history along flow, EMA blend
    (taa_processor.py:41-147).  `previous_taa` is an explicit carry —
    suitable as a lax.scan carry.  current_frame: [H, W, 3] float32 0-255."""
    current = current_frame.astype(jnp.float32)
    if not use_flow or flow_pixels is None:
        return alpha * current + (1 - alpha) * previous_taa

    h, w = current.shape[0], current.shape[1]
    y_coords, x_coords = jnp.mgrid[0:h, 0:w]
    prev_x = x_coords + flow_pixels[..., 0]
    prev_y = y_coords + flow_pixels[..., 1]
    prev_x = jnp.nan_to_num(prev_x, nan=0.0, posinf=w - 1, neginf=0.0)
    prev_y = jnp.nan_to_num(prev_y, nan=0.0, posinf=h - 1, neginf=0.0)
    prev_x = jnp.clip(prev_x, 0, w - 1)
    prev_y = jnp.clip(prev_y, 0, h - 1)

    if use_bilateral:
        reprojected = bilateral_reprojection_sample(
            previous_taa, prev_x, prev_y, current, sigma_color
        )
    else:
        reprojected = bilinear_sample(previous_taa, prev_x, prev_y)
    return alpha * current + (1 - alpha) * reprojected


# =============================================================================
# Quality + turbulence maps
# =============================================================================
def pixel_quality(
    src_pixels: jnp.ndarray, dst_pixels: jnp.ndarray
) -> jnp.ndarray:
    """Per-pixel color-match quality = mean of (RGB-distance similarity,
    abs-diff similarity, remapped cosine similarity)
    (correction_worker.py:9-27; cosine mapped (cos+1)/2 at :22, with the
    norm-difference fallback for near-black pixels at :24-25)."""
    src = src_pixels.astype(jnp.float32)
    dst = dst_pixels.astype(jnp.float32)
    diff = src - dst
    dist = jnp.sqrt(jnp.sum(diff**2, axis=-1))
    max_dist = jnp.sqrt(3.0) * 255.0
    sim_dist = 1.0 - dist / max_dist

    abs_diff = jnp.mean(jnp.abs(diff), axis=-1)
    sim_abs = 1.0 - abs_diff / 255.0

    dot = jnp.sum(src * dst, axis=-1)
    norm_s = jnp.sqrt(jnp.sum(src**2, axis=-1))
    norm_d = jnp.sqrt(jnp.sum(dst**2, axis=-1))
    denom = norm_s * norm_d
    cos = dot / jnp.maximum(denom, 1e-30)
    sim_cos = jnp.where(
        denom > 1e-12,
        (cos + 1.0) / 2.0,
        1.0 - jnp.abs(norm_s - norm_d) / max_dist,
    )

    return (sim_dist + sim_abs + sim_cos) / 3.0


def quality_map(
    frame_a: jnp.ndarray, frame_b: jnp.ndarray, flow: jnp.ndarray, sign: float = -1.0
) -> jnp.ndarray:
    """Dense flow quality: sample frame_b at `pos + sign*flow` and compare
    colors with frame_a.  sign=-1 is the correction engine's
    `target = pos - flow` convention (correction_worker.py:186-191).
    Returns [H, W] in [0,1]; out-of-bounds targets score 0."""
    h, w = frame_a.shape[0], frame_a.shape[1]
    y_coords, x_coords = jnp.mgrid[0:h, 0:w]
    tx = x_coords + sign * flow[..., 0]
    ty = y_coords + sign * flow[..., 1]
    oob = (tx < 0) | (tx >= w) | (ty < 0) | (ty >= h)
    # Reference samples with integer (truncated) coords
    # (correction_worker.py:189-191).
    txi = jnp.clip(tx.astype(jnp.int32), 0, w - 1)
    tyi = jnp.clip(ty.astype(jnp.int32), 0, h - 1)
    sampled = frame_b.astype(jnp.float32)[tyi, txi]
    q = pixel_quality(frame_a.astype(jnp.float32), sampled)
    return jnp.where(oob, 0.0, q)


def quality_frame(
    frame_a: jnp.ndarray,
    frame_b: jnp.ndarray,
    flow: jnp.ndarray,
    good_quality_threshold: float = 0.98,
) -> jnp.ndarray:
    """Red/green quality visualization, matching the reference's GPU path
    (correction_worker.py:175-208): good pixels get green intensity
    (sim-0.5)*2, bad pixels get red 1-sim, out-of-bounds pure red.
    Works on raw 0-255 frames; the reference normalizes to [0,1] first,
    which leaves the similarity unchanged (all terms are scale-ratios).
    The red channel > 0 is the 'bad pixel' predicate consumed by the
    batch corrector (correction_worker.py:248)."""
    h, w = frame_a.shape[0], frame_a.shape[1]
    y_coords, x_coords = jnp.mgrid[0:h, 0:w]
    tx = x_coords - flow[..., 0]
    ty = y_coords - flow[..., 1]
    oob = (tx < 0) | (tx >= w) | (ty < 0) | (ty >= h)
    txi = jnp.clip(tx.astype(jnp.int32), 0, w - 1)
    tyi = jnp.clip(ty.astype(jnp.int32), 0, h - 1)
    sampled = frame_b.astype(jnp.float32)[tyi, txi]
    sim = pixel_quality(frame_a.astype(jnp.float32), sampled)

    green = jnp.clip((sim - 0.5) * 2.0, 0.0, 1.0)
    red = jnp.clip(1.0 - sim, 0.0, 1.0)
    good = sim > good_quality_threshold
    out = jnp.stack(
        [
            jnp.where(good, 0.0, red),
            jnp.where(good, green, 0.0),
            jnp.zeros_like(red),
        ],
        axis=-1,
    )
    out = jnp.where(oob[..., None], jnp.asarray([1.0, 0.0, 0.0]), out)
    return (out * 255).astype(jnp.uint8)


def _box_filter(x: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Mean filter via separable cumulative sums (cv2.boxFilter analogue,
    BORDER_REFLECT-free: uses edge padding like cv2's default replicate)."""
    pad = ksize // 2
    xp = jnp.pad(x, ((pad, pad), (pad, pad)), mode="edge")
    kernel = jnp.ones((ksize,), dtype=x.dtype) / ksize
    # separable: rows then cols
    xp = jax.vmap(lambda row: jnp.convolve(row, kernel, mode="valid"))(xp)
    xp = jax.vmap(lambda col: jnp.convolve(col, kernel, mode="valid"), in_axes=1, out_axes=1)(xp)
    return xp


def turbulence_map(flow: jnp.ndarray, ksize: int = 5) -> jnp.ndarray:
    """Local flow variance E[X^2]-E[X]^2 per channel, summed
    (flow_visualizer.py:2997-3052's boxFilter construction).  Returns the
    raw variance map; percentile normalization + colormap stay host-side
    (they feed a UI)."""
    var = jnp.zeros(flow.shape[:2], dtype=jnp.float32)
    for c in range(2):
        ch = flow[..., c].astype(jnp.float32)
        mean = _box_filter(ch, ksize)
        mean_sq = _box_filter(ch**2, ksize)
        var = var + jnp.maximum(mean_sq - mean**2, 0.0)
    return var


# =============================================================================
# LOD pyramid (jnp twin of pipeline.cache.LODGenerator)
# =============================================================================
def lod_downsample(flow: jnp.ndarray, weight: Optional[jnp.ndarray] = None):
    """One weighted 2x2 downsample with bottom/right zero-padding for odd
    dims, flow scaled x0.5 (cache_manager.py:95-159)."""
    h, w = flow.shape[0], flow.shape[1]
    pad_h, pad_w = h % 2, w % 2
    if weight is None:
        weight = jnp.ones((h, w), dtype=jnp.float32)
    if pad_h or pad_w:
        flow = jnp.pad(flow, ((0, pad_h), (0, pad_w), (0, 0)))
        weight = jnp.pad(weight, ((0, pad_h), (0, pad_w)))

    fw = flow * weight[..., None]
    fw_sum = fw[0::2, 0::2] + fw[0::2, 1::2] + fw[1::2, 0::2] + fw[1::2, 1::2]
    w_sum = (
        weight[0::2, 0::2] + weight[0::2, 1::2] + weight[1::2, 0::2] + weight[1::2, 1::2]
    )
    safe = jnp.where(w_sum > 0, w_sum, 1.0)
    down = jnp.where((w_sum > 0)[..., None], fw_sum / safe[..., None] * 0.5, 0.0)
    return down.astype(jnp.float32)


def generate_lods(flow: jnp.ndarray, num_lods: int = 5):
    """Full LOD pyramid on device. Returns list of arrays (shapes differ
    per level, so this is a Python-level loop over static shapes)."""
    lods = [flow.astype(jnp.float32)]
    current = lods[0]
    for _ in range(1, num_lods):
        current = lod_downsample(current)
        lods.append(current)
    return lods


# =============================================================================
# Fused post-pipeline: flow -> (encoded, taa) in one jitted step
# =============================================================================
@partial(jax.jit, static_argnames=("flow_format", "width", "height", "use_bilateral"))
def postprocess_step(
    flow: jnp.ndarray,
    current_frame: jnp.ndarray,
    previous_taa: jnp.ndarray,
    width: int,
    height: int,
    flow_format: str = "gamedev",
    clamp_range: float = 32.0,
    alpha: float = 0.1,
    use_bilateral: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode flow + apply TAA in one fused device step (the reference
    does these as separate host numpy passes, flow_processor.py:998-1109).
    TAA uses the *inverted* flow of the previous frame per the reference's
    convention (flow_processor.py:1016-1050 passes inverted previous flow).
    Callers pass `flow_pixels` pre-inverted."""
    encoded = encode_flow(flow, width, height, flow_format, clamp_range)
    taa = taa_step(
        current_frame, flow, previous_taa, alpha=alpha, use_bilateral=use_bilateral
    )
    return encoded, taa
