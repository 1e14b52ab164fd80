"""FlashCorr (fused Pallas on-the-fly correlation lookup) vs the XLA
paths.  Runs the kernel in interpret mode on CPU; the formulation itself
(transposed one-hot selects, static stores) is TPU-probed in
benchmarks/micro_flashcorr.py.

Reference semantics under test: the RAFT-family radius lookup consumed by
the reference via videoflow_core.py:91-94 — zero-pad border, shared-
fraction bilinear, upstream x-major window channel order.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow.core.corr import (
    CorrPyramid,
    DenseCorrPyramid,
    FlashCorr,
    make_corr,
)


@pytest.fixture
def small_pair():
    rng = np.random.default_rng(23)
    f1 = rng.normal(size=(2, 16, 24, 32)).astype(np.float32)
    f2 = rng.normal(size=(2, 16, 24, 32)).astype(np.float32)
    flow = rng.normal(0, 6, size=(2, 16, 24, 2)).astype(np.float32)
    return jnp.asarray(f1), jnp.asarray(f2), jnp.asarray(flow)


def test_flash_all_levels_matches_gather(small_pair):
    # Every level through the kernel: equality with the patch-take
    # lookup to feature-pooling reassociation (same contract as
    # OnTheFlyCorr — levels > 0 pool features, not volumes).
    f1, f2, flow = small_pair
    cp = CorrPyramid.build(f1, f2, 3)
    fc = FlashCorr.build(f1, f2, 3, flash_levels=3)
    assert fc.dense is None
    for r in (3, 4):
        a = np.asarray(cp.lookup(flow, r))
        b = np.asarray(fc.lookup(flow, r))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_flash_level0_exact_vs_dense(small_pair):
    # Level 0 never pools: the kernel's one-hot selection and the dense
    # one-hot-matmul lookup must agree to f32 exactness there.
    f1, f2, flow = small_pair
    dp = DenseCorrPyramid.build(f1, f2, 1)
    fc = FlashCorr.build(f1, f2, 1, flash_levels=1)
    a = np.asarray(dp.lookup(flow, 4))
    b = np.asarray(fc.lookup(flow, 4))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_flash_hybrid_matches_dense(small_pair):
    # flash level 0 + dense deep levels (the 1280-tile production
    # split): deep levels are volume-pooled from pooled features, so
    # agreement with the full dense pyramid is to reassociation.
    f1, f2, flow = small_pair
    dp = DenseCorrPyramid.build(f1, f2, 3)
    fc = FlashCorr.build(f1, f2, 3, flash_levels=1)
    assert fc.dense is not None and len(fc.dense.pyramid) == 2
    a = np.asarray(dp.lookup(flow, 4))
    b = np.asarray(fc.lookup(flow, 4))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_flash_border_crossing_queries():
    # Flows that push the whole patch off-plane must zero out exactly
    # like the gather path (grid_sample zero padding semantics).
    rng = np.random.default_rng(29)
    f1 = jnp.asarray(rng.normal(size=(1, 8, 16, 16)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(1, 8, 16, 16)).astype(np.float32))
    flow = jnp.asarray(
        rng.normal(0, 30, size=(1, 8, 16, 2)).astype(np.float32)
    )
    cp = CorrPyramid.build(f1, f2, 2)
    fc = FlashCorr.build(f1, f2, 2, flash_levels=2)
    a = np.asarray(cp.lookup(flow, 4))
    b = np.asarray(fc.lookup(flow, 4))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_flash_bf16_storage():
    # bf16 features (the TPU configuration): selection is exact; pooled
    # levels agree to bf16 ulp bounds.
    rng = np.random.default_rng(31)
    f1 = jnp.asarray(rng.normal(size=(1, 16, 20, 16)), jnp.bfloat16)
    f2 = jnp.asarray(rng.normal(size=(1, 16, 20, 16)), jnp.bfloat16)
    flow = jnp.asarray(rng.normal(0, 4, size=(1, 16, 20, 2)), jnp.float32)
    cp = CorrPyramid.build(f1, f2, 2)
    fc = FlashCorr.build(f1, f2, 2, flash_levels=2)
    a = np.asarray(cp.lookup(flow, 4))
    b = np.asarray(fc.lookup(flow, 4))
    scale = max(1.0, np.abs(a).max())
    assert np.max(np.abs(a - b)) <= 3 * 0.0079 * scale


def test_flash_state_roundtrip(small_pair):
    # The engine moves correlation objects across the encode/refine jit
    # boundary as arrays-only pytrees; FlashCorr must survive the trip.
    from tpuflow.core.mofnet import _corr_from_state, _corr_state

    f1, f2, flow = small_pair
    fc = FlashCorr.build(f1, f2, 3, flash_levels=1)
    state = _corr_state(fc)
    assert len(state) == 3
    fc2 = _corr_from_state(state, (2, 16, 24))
    assert isinstance(fc2, FlashCorr)
    assert fc2.dense is not None
    assert fc2.dense.level_offset == 1
    a = np.asarray(fc.lookup(flow, 4))
    b = np.asarray(fc2.lookup(flow, 4))
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_make_corr_flash(small_pair):
    f1, f2, _ = small_pair
    fc = make_corr(f1, f2, 3, impl="flash")
    assert isinstance(fc, FlashCorr)
