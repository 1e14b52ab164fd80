"""On-device ops vs reference-formula oracles.

Each oracle is a transcription of the reference's numpy math
(encoding/flow_encoders.py, effects/taa_processor.py) executed in numpy;
the tpuflow jnp implementation must match on CPU backend."""

import numpy as np
import pytest

import tpuflow.pipeline.ops as ops


# ---------------------------------------------------------------------------
# Oracles (reference formulas, numpy)
# ---------------------------------------------------------------------------
def oracle_gamedev(flow, width, height, scale_factor=200.0, clamp_range=20.0):
    norm_flow = flow.copy()
    norm_flow[:, :, 0] /= width
    norm_flow[:, :, 1] /= height
    norm_flow *= scale_factor
    clamped = np.clip(norm_flow, -clamp_range, clamp_range)
    encoded = (clamped + clamp_range) / (2 * clamp_range)
    encoded = np.clip(encoded, 0, 1)
    h, w = flow.shape[:2]
    rgb = np.zeros((h, w, 3), dtype=np.float32)
    rgb[:, :, 0] = encoded[:, :, 0]
    rgb[:, :, 1] = encoded[:, :, 1]
    rgb_8bit = np.nan_to_num(rgb * 255, nan=0.0, posinf=255.0, neginf=0.0)
    return rgb_8bit.astype(np.uint8)


def oracle_rg8(flow, clamp_range=64.0):
    clamped = np.clip(flow, -clamp_range, clamp_range)
    encoded = np.clip((clamped + clamp_range) / (2 * clamp_range), 0, 1)
    h, w = flow.shape[:2]
    rgb = np.zeros((h, w, 3), dtype=np.float32)
    rgb[:, :, 0] = encoded[:, :, 0]
    rgb[:, :, 1] = encoded[:, :, 1]
    return np.nan_to_num(rgb * 255, nan=0.0, posinf=255.0, neginf=0.0).astype(np.uint8)


def oracle_rgb8_plus(flow, clamp_range=32.0):
    fx, fy = flow[:, :, 0], flow[:, :, 1]
    dx = fx / clamp_range
    dy = fy / clamp_range
    ln = np.sqrt(dx**2 + dy**2)
    mask = ln > 1
    dx = dx.copy()
    dy = dy.copy()
    dx[mask] = dx[mask] / ln[mask]
    dy[mask] = dy[mask] / ln[mask]
    corrector = np.sqrt(np.maximum(1 - dx**2 - dy**2, 0))
    r = (np.clip(dx, -1, 1) + 1) / 2
    g = (np.clip(dy, -1, 1) + 1) / 2
    rgb = np.stack([r, g, corrector], axis=-1)
    return np.nan_to_num(rgb * 255, nan=0.0, posinf=255.0, neginf=0.0).astype(np.uint8)


def oracle_bilinear(image, x, y):
    h, w = image.shape[:2]
    x0 = np.floor(x).astype(int)
    x1 = np.minimum(x0 + 1, w - 1)
    y0 = np.floor(y).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x0, x1 = np.clip(x0, 0, w - 1), np.clip(x1, 0, w - 1)
    y0, y1 = np.clip(y0, 0, h - 1), np.clip(y1, 0, h - 1)
    wx = x - x0
    wy = y - y0
    result = np.zeros_like(image, dtype=np.float32)
    for c in range(image.shape[2]):
        result[:, :, c] = (
            image[y0, x0, c] * (1 - wx) * (1 - wy)
            + image[y0, x1, c] * wx * (1 - wy)
            + image[y1, x0, c] * (1 - wx) * wy
            + image[y1, x1, c] * wx * wy
        )
    return result


def oracle_bilateral(image, x, y, current, sigma_color=25.0):
    h, w = image.shape[:2]
    x0 = np.clip(np.floor(x).astype(int), 0, w - 2)
    y0 = np.clip(np.floor(y).astype(int), 0, h - 2)
    x1, y1 = x0 + 1, y0 + 1
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    p00, p01 = image[y0, x0], image[y0, x1]
    p10, p11 = image[y1, x0], image[y1, x1]
    current_lum = np.mean(current, axis=2)
    sigma_sq = sigma_color**2 * 0.1

    def cw(p):
        lum_diff = current_lum - np.mean(p, axis=2)
        return np.exp(-(lum_diff**2) / (2 * sigma_sq + 1e-6))[..., None]

    w00 = (1 - wx) * (1 - wy) * cw(p00)
    w01 = wx * (1 - wy) * cw(p01)
    w10 = (1 - wx) * wy * cw(p10)
    w11 = wx * wy * cw(p11)
    total = w00 + w01 + w10 + w11
    total = np.where(total == 0, 1e-6, total)
    return (p00 * w00 + p01 * w01 + p10 * w10 + p11 * w11) / total


def oracle_taa(current, flow, prev, alpha=0.1, use_bilateral=True):
    current = current.astype(np.float32)
    h, w = current.shape[:2]
    y_coords, x_coords = np.mgrid[0:h, 0:w]
    px = np.nan_to_num(x_coords + flow[:, :, 0], nan=0.0, posinf=w - 1, neginf=0.0)
    py = np.nan_to_num(y_coords + flow[:, :, 1], nan=0.0, posinf=h - 1, neginf=0.0)
    px = np.clip(px, 0, w - 1)
    py = np.clip(py, 0, h - 1)
    if use_bilateral:
        reproj = oracle_bilateral(prev, px, py, current)
    else:
        reproj = oracle_bilinear(prev, px, py)
    return alpha * current + (1 - alpha) * reproj


# ---------------------------------------------------------------------------
# Encoder tests
# ---------------------------------------------------------------------------
def test_gamedev_matches_oracle(random_flow):
    got = np.asarray(ops.encode_gamedev(random_flow, 64, 48))
    want = oracle_gamedev(random_flow, 64, 48)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_rg8_matches_oracle(random_flow):
    got = np.asarray(ops.encode_motion_vectors_rg8(random_flow, 64.0))
    want = oracle_rg8(random_flow, 64.0)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_rg8_roundtrip(random_flow):
    clamp = 64.0
    enc = ops.encode_motion_vectors_rg8(random_flow, clamp)
    dec = np.asarray(ops.decode_motion_vectors_rg8(enc, clamp))
    # Quantization error bound: half a UNORM8 step of the clamp range.
    step = 2 * clamp / 255.0
    inside = np.abs(random_flow) < clamp - step
    assert np.abs(dec - random_flow)[inside.all(axis=-1)].max() <= step


def test_rgb8_plus_matches_oracle(random_flow):
    got = np.asarray(ops.encode_motion_vectors_rgb8(random_flow, 32.0))
    want = oracle_rgb8_plus(random_flow, 32.0)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_rgb8_plus_roundtrip_magnitude(rng):
    # Decode recovers magnitude via 1/||(x,y,corrector)|| * clamp.
    clamp = 32.0
    flow = rng.normal(0, 6, size=(32, 32, 2)).astype(np.float32)
    enc = ops.encode_motion_vectors_rgb8(flow, clamp)
    dec = np.asarray(ops.decode_motion_vectors_rgb8(enc, clamp))
    mag = np.sqrt((flow**2).sum(-1))
    inside = mag < clamp * 0.9
    err = np.abs(dec - flow)[inside]
    assert np.median(err) < 0.5  # 8-bit quantization noise

def test_hsv_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    flow = rng.normal(0, 10, size=(40, 40, 2)).astype(np.float32)

    # Oracle (flow_encoders.py:38-67)
    f = np.nan_to_num(flow, nan=0.0, posinf=1.0, neginf=-1.0)
    mag = np.sqrt(f[:, :, 0] ** 2 + f[:, :, 1] ** 2)
    ang = np.arctan2(f[:, :, 1], f[:, :, 0])
    hue = np.clip((ang + np.pi) / (2 * np.pi) * 180, 0, 180).astype(np.uint8)
    sat = (mag / mag.max() * 255).astype(np.uint8)
    val = np.full_like(mag, 255, dtype=np.uint8)
    want = cv2.cvtColor(np.stack([hue, sat, val], axis=2), cv2.COLOR_HSV2RGB)

    got = np.asarray(ops.encode_hsv(flow))
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 2


def test_colorwheel_against_torchvision(random_flow):
    torch = pytest.importorskip("torch")
    torchvision = pytest.importorskip("torchvision")
    from torchvision.utils import flow_to_image

    t = torch.from_numpy(random_flow).permute(2, 0, 1).unsqueeze(0).float()
    want = flow_to_image(t).squeeze(0).permute(1, 2, 0).numpy()
    got = np.asarray(ops.encode_colorwheel(random_flow))
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_encode_flow_dispatch(random_flow):
    for fmt in ["hsv", "gamedev", "torchvision", "motion-vectors-rg8", "motion-vectors-rgb8"]:
        out = ops.encode_flow(random_flow, 64, 48, fmt)
        assert out.shape == (48, 64, 3)
        assert out.dtype == np.uint8
    with pytest.raises(ValueError):
        ops.encode_flow(random_flow, 64, 48, "nope")


# ---------------------------------------------------------------------------
# TAA tests
# ---------------------------------------------------------------------------
def test_taa_first_step_blend(random_frame):
    prev = np.full((48, 64, 3), 100.0, np.float32)
    got = np.asarray(
        ops.taa_step(random_frame, None, prev, alpha=0.1, use_flow=False)
    )
    want = 0.1 * random_frame.astype(np.float32) + 0.9 * prev
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_taa_bilinear_matches_oracle(rng, random_frame):
    flow = rng.normal(0, 3, size=(48, 64, 2)).astype(np.float32)
    prev = rng.uniform(0, 255, size=(48, 64, 3)).astype(np.float32)
    got = np.asarray(
        ops.taa_step(random_frame, flow, prev, alpha=0.1, use_bilateral=False)
    )
    want = oracle_taa(random_frame, flow, prev, 0.1, use_bilateral=False)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


def test_taa_bilateral_matches_oracle(rng, random_frame):
    flow = rng.normal(0, 3, size=(48, 64, 2)).astype(np.float32)
    prev = rng.uniform(0, 255, size=(48, 64, 3)).astype(np.float32)
    got = np.asarray(
        ops.taa_step(random_frame, flow, prev, alpha=0.1, use_bilateral=True)
    )
    want = oracle_taa(random_frame, flow, prev, 0.1, use_bilateral=True)
    # Pixels whose 4 bilateral weights all underflow are numerically
    # degenerate (divide by ~0); the reference's own float32 math is
    # arbitrary there, so compare only the well-conditioned ones.
    h, w = flow.shape[:2]
    y_coords, x_coords = np.mgrid[0:h, 0:w]
    px = np.clip(x_coords + flow[:, :, 0], 0, w - 1)
    py = np.clip(y_coords + flow[:, :, 1], 0, h - 1)
    x0 = np.clip(np.floor(px).astype(int), 0, w - 2)
    y0 = np.clip(np.floor(py).astype(int), 0, h - 2)
    wx = (px - x0)[..., None]
    wy = (py - y0)[..., None]
    cur = random_frame.astype(np.float32)
    sig = 25.0**2 * 0.1

    def cw(p):
        d = np.mean(cur, 2) - np.mean(p, 2)
        return np.exp(-(d.astype(np.float64) ** 2) / (2 * sig + 1e-6))[..., None]

    total = (
        (1 - wx) * (1 - wy) * cw(prev[y0, x0])
        + wx * (1 - wy) * cw(prev[y0, x0 + 1])
        + (1 - wx) * wy * cw(prev[y0 + 1, x0])
        + wx * wy * cw(prev[y0 + 1, x0 + 1])
    )
    # float32 underflows below ~1e-38; only those pixels are degenerate.
    ok = (total > 1e-30).squeeze(-1)
    assert ok.mean() > 0.95
    np.testing.assert_allclose(got[ok], want[ok], rtol=1e-2, atol=0.5)


def test_taa_handles_nan_flow(random_frame):
    flow = np.full((48, 64, 2), np.nan, np.float32)
    prev = np.zeros((48, 64, 3), np.float32)
    got = np.asarray(ops.taa_step(random_frame, flow, prev, alpha=0.5))
    assert np.isfinite(got).all()


# ---------------------------------------------------------------------------
# Quality / turbulence / LOD
# ---------------------------------------------------------------------------
def test_quality_map_identity():
    # Zero flow on identical frames -> perfect quality.
    frame = np.random.default_rng(2).integers(10, 245, size=(32, 32, 3)).astype(np.uint8)
    q = np.asarray(ops.quality_map(frame, frame, np.zeros((32, 32, 2), np.float32)))
    assert q.min() > 0.99


def test_quality_map_detects_mismatch(rng):
    a = rng.integers(0, 50, size=(32, 32, 3)).astype(np.uint8)
    b = rng.integers(200, 255, size=(32, 32, 3)).astype(np.uint8)
    q = np.asarray(ops.quality_map(a, b, np.zeros((32, 32, 2), np.float32)))
    assert q.mean() < 0.8


def test_turbulence_zero_for_uniform_flow():
    flow = np.full((32, 32, 2), 5.0, np.float32)
    t = np.asarray(ops.turbulence_map(flow))
    np.testing.assert_allclose(t, 0.0, atol=1e-3)


def test_turbulence_positive_for_noisy_flow(rng):
    flow = rng.normal(0, 5, size=(32, 32, 2)).astype(np.float32)
    t = np.asarray(ops.turbulence_map(flow))
    assert t.mean() > 1.0


def test_jnp_lods_match_numpy(random_flow):
    from tpuflow.pipeline.cache import LODGenerator

    ours = [np.asarray(x) for x in ops.generate_lods(random_flow, 4)]
    want = LODGenerator.generate_lods(random_flow, 4)
    for a, b in zip(ours, want):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_postprocess_step_fused(rng, random_frame):
    flow = rng.normal(0, 3, size=(48, 64, 2)).astype(np.float32)
    prev = rng.uniform(0, 255, size=(48, 64, 3)).astype(np.float32)
    encoded, taa = ops.postprocess_step(
        flow, random_frame.astype(np.float32), prev, 64, 48, "gamedev"
    )
    assert encoded.shape == (48, 64, 3) and encoded.dtype == np.uint8
    assert taa.shape == (48, 64, 3)
