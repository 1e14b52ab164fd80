"""Pallas lookup kernel: interpret-mode equality with the XLA lookup.

The kernel implements clamp-border, y-major order (the round-1 contract);
the product lookups since moved to upstream zeros-border x-major order, so
comparisons pin border="clamp" and transpose the kernel output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow.core.corr import CorrPyramid
from tpuflow.kernels.lookup_pallas import lookup_level_pallas, pyramid_lookup_pallas


def test_pyramid_lookup_pallas_matches_xla(rng):
    f1 = rng.normal(size=(2, 16, 24, 32)).astype(np.float32)
    f2 = rng.normal(size=(2, 16, 24, 32)).astype(np.float32)
    flow = rng.normal(0, 6, size=(2, 16, 24, 2)).astype(np.float32)
    cp = CorrPyramid.build(jnp.asarray(f1), jnp.asarray(f2), 3)
    want = np.asarray(cp.lookup(jnp.asarray(flow), 3, border="clamp"))
    got = np.asarray(
        pyramid_lookup_pallas(cp.pyramid, 16, 24, jnp.asarray(flow), 3, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pyramid_lookup_pallas_extreme_borders(rng):
    # Flows that push every patch fully out of bounds on all sides.
    f = rng.normal(size=(1, 8, 16, 16)).astype(np.float32)
    flow = np.zeros((1, 8, 16, 2), np.float32)
    flow[:, :4] = 100.0
    flow[:, 4:] = -100.0
    cp = CorrPyramid.build(jnp.asarray(f), jnp.asarray(f), 2)
    want = np.asarray(cp.lookup(jnp.asarray(flow), 2, border="clamp"))
    got = np.asarray(
        pyramid_lookup_pallas(cp.pyramid, 8, 16, jnp.asarray(flow), 2, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_level_lookup_pallas_bf16(rng):
    n, lh, lw, r = 32, 16, 16, 2
    vol = jnp.asarray(rng.normal(size=(n, lh * lw)).astype(np.float32), dtype=jnp.bfloat16)
    py = jnp.asarray(rng.integers(-4, lh, n), dtype=jnp.int32)
    px = jnp.asarray(rng.integers(-4, lw, n), dtype=jnp.int32)
    wx = jnp.asarray(rng.random(n).astype(np.float32))
    wy = jnp.asarray(rng.random(n).astype(np.float32))
    out = np.asarray(
        lookup_level_pallas(vol, lh, lw, py, px, wx, wy, r, interpret=True)
    )
    assert out.shape == (n, (2 * r + 1) ** 2)
    assert np.isfinite(out).all()
