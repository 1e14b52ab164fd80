"""BandCorrPyramid (banded sparse streaming Pallas lookup) vs the XLA
paths.  Runs the kernel in interpret mode on CPU; the chunk-range DMA
formulation is TPU-measured in benchmarks/micro_bandlookup.py.

Reference semantics under test: the RAFT-family radius lookup consumed by
the reference via videoflow_core.py:91-94 — zero-pad border, shared-
fraction bilinear, upstream x-major window channel order.  Unlike
FlashCorr's deep levels (feature pooling), BandCorrPyramid pools the
VOLUME exactly like CorrPyramid, so agreement holds at every level up to
build-chunk reassociation only.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow.core.corr import (
    BandCorrPyramid,
    CorrPyramid,
    DenseCorrPyramid,
    make_corr,
)
from tpuflow.kernels.bandlookup import compute_band_ranges


@pytest.fixture
def small_pair():
    rng = np.random.default_rng(23)
    f1 = rng.normal(size=(2, 16, 24, 32)).astype(np.float32)
    f2 = rng.normal(size=(2, 16, 24, 32)).astype(np.float32)
    flow = rng.normal(0, 6, size=(2, 16, 24, 2)).astype(np.float32)
    return jnp.asarray(f1), jnp.asarray(f2), jnp.asarray(flow)


def test_band_matches_gather_all_levels(small_pair):
    f1, f2, flow = small_pair
    cp = CorrPyramid.build(f1, f2, 3)
    bp = BandCorrPyramid.build(f1, f2, 3)
    for r in (3, 4):
        a = np.asarray(cp.lookup(flow, r))
        b = np.asarray(bp.lookup(flow, r))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_band_matches_dense(small_pair):
    f1, f2, flow = small_pair
    dp = DenseCorrPyramid.build(f1, f2, 4)
    bp = BandCorrPyramid.build(f1, f2, 4)
    a = np.asarray(dp.lookup(flow, 4))
    b = np.asarray(bp.lookup(flow, 4))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_band_border_crossing_queries():
    # Flows that push patches fully/partially off-plane: clamped rows
    # keep the DMA ranges legal and the epilogue zeroes exactly like the
    # gather path (grid_sample zero padding semantics).
    rng = np.random.default_rng(29)
    f1 = jnp.asarray(rng.normal(size=(1, 8, 16, 16)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(1, 8, 16, 16)).astype(np.float32))
    flow = jnp.asarray(
        rng.normal(0, 30, size=(1, 8, 16, 2)).astype(np.float32)
    )
    cp = CorrPyramid.build(f1, f2, 2)
    bp = BandCorrPyramid.build(f1, f2, 2)
    a = np.asarray(cp.lookup(flow, 4))
    b = np.asarray(bp.lookup(flow, 4))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_band_bf16_storage():
    rng = np.random.default_rng(31)
    f1 = jnp.asarray(rng.normal(size=(1, 16, 20, 16)), jnp.bfloat16)
    f2 = jnp.asarray(rng.normal(size=(1, 16, 20, 16)), jnp.bfloat16)
    flow = jnp.asarray(rng.normal(0, 4, size=(1, 16, 20, 2)), jnp.float32)
    cp = CorrPyramid.build(f1, f2, 2)
    bp = BandCorrPyramid.build(f1, f2, 2)
    a = np.asarray(cp.lookup(flow, 4))
    b = np.asarray(bp.lookup(flow, 4))
    scale = max(1.0, np.abs(a).max())
    assert np.max(np.abs(a - b)) <= 3 * 0.0079 * scale


def test_band_ranges_exact_and_clamped():
    # lo/hi must cover exactly the chunks the rows touch; pad queries
    # (edge-replicated) must not widen the range.
    rr = jnp.asarray(
        np.stack(
            [np.full((512, 3), 5), np.full((512, 3), 21)], axis=0
        ).astype(np.int32)
    )  # block of 512 queries per batch entry, rows all 5 / all 21
    lohi = np.asarray(compute_band_ranges(rr, nqb=1, nchunks=4, chunk_rows=8))
    assert lohi.tolist() == [[[0, 1]], [[2, 3]]]


def test_band_state_roundtrip(small_pair):
    from tpuflow.core.mofnet import _corr_from_state, _corr_state

    f1, f2, flow = small_pair
    bp = BandCorrPyramid.build(f1, f2, 3)
    state = _corr_state(bp)
    bp2 = _corr_from_state(state, (2, 16, 24))
    assert isinstance(bp2, BandCorrPyramid)
    a = np.asarray(bp.lookup(flow, 4))
    b = np.asarray(bp2.lookup(flow, 4))
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_make_corr_band(small_pair):
    f1, f2, _ = small_pair
    bp = make_corr(f1, f2, 3, impl="band")
    assert isinstance(bp, BandCorrPyramid)
