"""Correction engine tests: batched phase correlation, NCC matching,
spiral, end-to-end frame correction on synthetic translations."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpuflow.tools.correction import (
    coarse_correction_batch,
    correct_frame,
    extract_regions,
    fine_correction_batch,
    generate_spiral_offsets,
    ncc_match_batch,
    phase_correlate_batch,
)


def _shift_image(img, dx, dy):
    """Integer roll (content moves by +dx,+dy)."""
    return np.roll(np.roll(img, dy, axis=0), dx, axis=1)


def test_spiral_path_matches_reference_order():
    # Oracle: the generator from correction_worker.py:33-42.
    def oracle(width, height):
        x, y = 0, 0
        dx, dy = 0, -1
        for _ in range(max(width, height) ** 2):
            if (-width / 2 < x <= width / 2) and (-height / 2 < y <= height / 2):
                yield (x, y)
            if x == y or (x < 0 and x == -y) or (x > 0 and x == 1 - y):
                dx, dy = -dy, dx
            x, y = x + dx, y + dy

    got = generate_spiral_offsets(6, 6)
    want = np.asarray(list(oracle(6, 6)))
    np.testing.assert_array_equal(got, want)


def test_extract_regions_center_and_edge(rng):
    img = rng.integers(0, 255, (40, 50)).astype(np.float32)
    regions = np.asarray(
        extract_regions(jnp.asarray(img), jnp.asarray([25, 0]), jnp.asarray([20, 0]), 5)
    )
    assert regions.shape == (2, 10, 10)
    np.testing.assert_array_equal(regions[0], img[15:25, 20:30])
    # Edge region: starts at 0, zero-padded on the side beyond the image...
    np.testing.assert_array_equal(regions[1][:5, :5], img[0:5, 0:5])


def test_phase_correlation_recovers_shift(rng):
    base = rng.normal(size=(64, 64)).astype(np.float32)
    # Smooth for subpixel stability.
    base = np.asarray(jnp.asarray(base))
    shifted = _shift_image(base, 3, -5)
    shifts, conf = phase_correlate_batch(
        jnp.asarray(base[None]), jnp.asarray(shifted[None])
    )
    shifts = np.asarray(shifts)
    # cv2 convention: phaseCorrelate(a, b) where b = a shifted by s
    # returns s; rolled content moved by (3, -5).
    assert abs(abs(shifts[0, 0]) - 3) < 0.5
    assert abs(abs(shifts[0, 1]) - 5) < 0.5
    assert float(conf[0]) > 0.2


def test_phase_correlation_matches_cv2_direction(rng):
    cv2 = pytest.importorskip("cv2")
    base = rng.normal(size=(64, 64)).astype(np.float32)
    shifted = _shift_image(base, 4, 2)
    (cv_dx, cv_dy), _ = cv2.phaseCorrelate(base, shifted)
    shifts, _ = phase_correlate_batch(jnp.asarray(base[None]), jnp.asarray(shifted[None]))
    assert abs(float(shifts[0, 0]) - cv_dx) < 0.75
    assert abs(float(shifts[0, 1]) - cv_dy) < 0.75


def test_ncc_match_finds_template(rng):
    search = rng.normal(size=(1, 40, 40, 3)).astype(np.float32)
    template = search[:, 12:22, 15:25, :]
    resp = np.asarray(ncc_match_batch(jnp.asarray(search), jnp.asarray(template)))
    assert resp.shape == (1, 31, 31)
    loc = np.unravel_index(resp[0].argmax(), resp[0].shape)
    assert loc == (12, 15)
    assert resp[0][loc] > 0.99


def test_ncc_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    search = rng.normal(size=(30, 30)).astype(np.float32)
    template = search[5:15, 8:18].copy()
    want = cv2.matchTemplate(search, template, cv2.TM_CCOEFF_NORMED)
    got = np.asarray(
        ncc_match_batch(
            jnp.asarray(search[None, :, :, None]), jnp.asarray(template[None, :, :, None])
        )
    )[0]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_coarse_correction_on_pure_translation(rng):
    # frame2 = frame1 content shifted by (dx, dy) = flow (5, 3):
    # target = src - flow must land on matching content.
    f1 = rng.integers(0, 255, (80, 96, 3)).astype(np.uint8)
    dx, dy = 5, 3
    f2 = _shift_image(f1, -dx, -dy)  # content at (x,y) in f1 is at (x-dx, y-dy) in f2
    sources = jnp.asarray([[48, 40], [30, 30]], jnp.int32)
    # Give a wrong LOD prediction; phase correlation should fix it.
    lod = jnp.asarray([[0.0, 0.0], [0.0, 0.0]], jnp.float32)
    res = coarse_correction_batch(jnp.asarray(f1), jnp.asarray(f2), sources, lod, 16)
    flow = np.asarray(res["flow"])
    np.testing.assert_allclose(flow[0], [dx, dy], atol=0.75)
    assert float(res["similarity"][0]) > 0.9


def test_fine_correction_on_pure_translation(rng):
    f1 = rng.integers(0, 255, (120, 140, 3)).astype(np.uint8)
    dx, dy = 4, -6
    f2 = _shift_image(f1, -dx, -dy)
    sources = jnp.asarray([[70, 60]], jnp.int32)
    # Coarse target close but off by a couple of pixels.
    coarse_targets = jnp.asarray([[70 - dx + 2, 60 - dy - 1]], jnp.float32)
    res = fine_correction_batch(
        jnp.asarray(f1), jnp.asarray(f2), sources, coarse_targets,
        template_radius=6, search_radius=20,
    )
    flow = np.asarray(res["flow"])
    np.testing.assert_allclose(flow[0], [dx, dy], atol=0.5)
    assert float(res["similarity"][0]) > 0.97


def test_correct_frame_improves_errors(rng):
    f1 = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    dx, dy = 3, 2
    f2 = _shift_image(f1, -dx, -dy)
    # Correct flow everywhere except a corrupted block.
    flow = np.full((64, 64, 2), [dx, dy], np.float32)
    flow[20:30, 20:30] = [15.0, -11.0]
    res = correct_frame(f1, f2, flow)
    assert res["initial_errors"] > 0
    assert res["final_errors"] < res["initial_errors"]


def test_correct_frame_clean_flow_noop(rng):
    f1 = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
    f2 = _shift_image(f1, -2, 0)
    flow = np.full((48, 48, 2), [2.0, 0.0], np.float32)
    res = correct_frame(f1, f2, flow)
    # Rolled content wraps at the border; interior must be error-free.
    assert res["initial_errors"] <= 48 * 4
    np.testing.assert_array_equal(res["flow"][10:-10, 10:-10], flow[10:-10, 10:-10])
