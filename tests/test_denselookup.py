"""kernels/denselookup: the exact-patch kernel + XLA epilogue ('patch')
must be BITWISE equal to DenseCorrPyramid.lookup's XLA formulation
(one-hot selects extract exact volume entries, shared epilogue); the
fully fused feature kernel ('interpret'/'pallas': extract + border +
bilinear + x-major repack in VMEM) matches within tight tolerance —
its bilinear runs in f32 on the exact patch values, which is MORE
accurate than the XLA storage-dtype epilogue, so f32 volumes agree to
~1 ulp and bf16 volumes differ by the XLA path's own bf16 rounding."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow.core.corr import (
    DenseCorrPyramid,
    _radius_patch_indices,
    _patch_to_features,
    pyramid_level_dims,
)
from tpuflow.kernels.denselookup import dense_patch_level


@pytest.mark.parametrize("mode", ["interpret", "patch"])
@pytest.mark.parametrize("dt", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("b,h,w", [(1, 16, 24), (2, 24, 40)])
def test_dense_patch_kernel_matches_xla(mode, dt, b, h, w):
    rng = np.random.default_rng(7)
    c, r, levels = 32, 4, 3
    f1 = jnp.asarray(rng.standard_normal((b, h, w, c)), dt)
    f2 = jnp.asarray(rng.standard_normal((b, h, w, c)), dt)
    flow = jnp.asarray(rng.standard_normal((b, h, w, 2)) * 4, jnp.float32)
    pyr = DenseCorrPyramid.build(f1, f2, levels)

    old = os.environ.get("TPUFLOW_DENSE_LOOKUP")
    try:
        os.environ["TPUFLOW_DENSE_LOOKUP"] = "xla"
        ref = pyr.lookup(flow, r)
        os.environ["TPUFLOW_DENSE_LOOKUP"] = mode
        got = pyr.lookup(flow, r)
    finally:
        if old is None:
            os.environ.pop("TPUFLOW_DENSE_LOOKUP", None)
        else:
            os.environ["TPUFLOW_DENSE_LOOKUP"] = old
    _assert_matches(mode, dt, got, ref)


def _assert_matches(mode, dt, got, ref):
    got, ref = np.asarray(got), np.asarray(ref)
    if mode == "patch":
        np.testing.assert_array_equal(got, ref)
    elif dt == jnp.float32:
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    else:  # fused f32 bilinear vs the XLA path's bf16 bilinear rounding
        np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("mode", ["interpret", "patch"])
def test_dense_patch_kernel_border_and_tail(mode):
    """Out-of-plane windows (border zeroing happens in the epilogue from
    raw indices) and a query count that does not divide the kernel block
    (tail queries padded by replication, outputs sliced off)."""
    rng = np.random.default_rng(3)
    b, h, w, c, r = 1, 8, 104, 16, 4  # hw=832: not a multiple of QB=256
    f1 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    # Huge flows push entire patches out of plane.
    flow = jnp.asarray(rng.standard_normal((b, h, w, 2)) * 50, jnp.float32)
    pyr = DenseCorrPyramid.build(f1, f2, 2)
    old = os.environ.get("TPUFLOW_DENSE_LOOKUP")
    try:
        os.environ["TPUFLOW_DENSE_LOOKUP"] = "xla"
        ref = pyr.lookup(flow, r)
        os.environ["TPUFLOW_DENSE_LOOKUP"] = mode
        got = pyr.lookup(flow, r)
    finally:
        if old is None:
            os.environ.pop("TPUFLOW_DENSE_LOOKUP", None)
        else:
            os.environ["TPUFLOW_DENSE_LOOKUP"] = old
    _assert_matches(mode, jnp.float32, got, ref)


@pytest.mark.parametrize("mode", ["interpret", "patch"])
def test_partial_subblock_query_counts_stay_finite_and_exact(mode):
    """Regression: Nq not a multiple of the sub-block size (QBS=8).

    The per-sub-block one-hot dots contract over every sub-block
    query's volume rows at once, so a sub-block straddling the
    valid-query boundary used to mix OUT-OF-BOUNDS volume block reads
    (NaN in interpret mode) into valid queries' f32 accumulations as
    0 * NaN — poisoning the last <=7 valid queries (found at the 5x6
    engine-test grid, docs/ROUND5_NOTES.md §4).  Product grids are
    8-multiples and never hit this; _pad_queries_to_subblock now pads
    the volume's query dim so every partially-valid sub-block is fully
    in-bounds.  Grids chosen so h*w % 8 != 0."""
    rng = np.random.default_rng(11)
    for (h, w) in [(5, 6), (6, 10), (9, 7)]:
        b, c, r, levels = 1, 32, 2, 2
        f1 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
        f2 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
        flow = jnp.asarray(rng.standard_normal((b, h, w, 2)) * 3, jnp.float32)
        pyr = DenseCorrPyramid.build(f1, f2, levels)
        ref = pyr.lookup(flow, r, impl="xla")
        got = pyr.lookup(flow, r, impl=mode)
        assert np.isfinite(np.asarray(got)).all(), (mode, h, w)
        _assert_matches(mode, jnp.float32, got, ref)
