"""kernels/denselookup: the fused Pallas dense-pyramid lookup must be
BITWISE equal to DenseCorrPyramid.lookup's XLA formulation — both
extract exact volume entries with one-hot selects and share the same
bilinear epilogue (_patch_to_features)."""

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


@pytest.mark.parametrize("dt", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("b,h,w", [(1, 16, 24), (2, 24, 40)])
def test_dense_patch_kernel_matches_xla(dt, b, h, w):
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
        os.environ["TPUFLOW_DENSE_LOOKUP"] = "interpret"
        got = pyr.lookup(flow, r)
    finally:
        if old is None:
            os.environ.pop("TPUFLOW_DENSE_LOOKUP", None)
        else:
            os.environ["TPUFLOW_DENSE_LOOKUP"] = old
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_dense_patch_kernel_border_and_tail():
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
        os.environ["TPUFLOW_DENSE_LOOKUP"] = "interpret"
        got = pyr.lookup(flow, r)
    finally:
        if old is None:
            os.environ.pop("TPUFLOW_DENSE_LOOKUP", None)
        else:
            os.environ["TPUFLOW_DENSE_LOOKUP"] = old
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
