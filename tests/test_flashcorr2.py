"""FlashCorr2 (phase-packed fused Pallas correlation lookup) vs the XLA
paths.  Runs the kernel in interpret mode on CPU; the packing math (zero
lane padding via dense-path phase arithmetic) is TPU-measured in
benchmarks/micro_corrvariants.py.

Reference semantics under test: the RAFT-family radius lookup consumed
by the reference via videoflow_core.py:91-94 — zero-pad border, shared-
fraction bilinear, upstream x-major window channel order.  Deep levels
correlate against avg-pooled features == avg-pooled volumes exactly
(linearity), up to float summation order.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow.core.corr import (
    CorrPyramid,
    DenseCorrPyramid,
    FlashCorr2,
    make_corr,
)
from tpuflow.kernels.flashcorr2 import level_pack_dims


@pytest.fixture
def small_pair():
    rng = np.random.default_rng(23)
    f1 = rng.normal(size=(2, 16, 24, 32)).astype(np.float32)
    f2 = rng.normal(size=(2, 16, 24, 32)).astype(np.float32)
    flow = rng.normal(0, 6, size=(2, 16, 24, 2)).astype(np.float32)
    return jnp.asarray(f1), jnp.asarray(f2), jnp.asarray(flow)


def test_pack_dims_zero_waste_for_videoflow_widths():
    # Every VideoFlow tile level width packs to exactly 640 lanes.
    for lh, lw in [(135, 160), (67, 80), (33, 40), (16, 20)]:
        g, gw, npr_pad, gr = level_pack_dims(lh, lw)
        assert g * lw == gw == 640
        assert npr_pad * g >= lh
        assert npr_pad % gr == 0
        # Equalized chunks: padding bounded by nchunks-1 rows.
        npr = -(-lh // g)
        assert npr_pad - npr < npr_pad // gr
    # L0 at the bench tile: 34 pseudo-rows -> 35 padded (5 chunks of 7),
    # not 40 (5 chunks of 8).
    _, _, npr_pad, gr = level_pack_dims(135, 160)
    assert (npr_pad, gr) == (35, 7)
    # Tiny deep level: single chunk, zero padded pseudo-rows.
    _, _, npr_pad, gr = level_pack_dims(16, 20)
    assert npr_pad == gr == 1
    # Irregular width falls back to lane padding, never fails.
    g, gw, _, _ = level_pack_dims(10, 100)
    assert gw % 128 == 0 and gw >= g * 100


def test_flash2_all_levels_matches_gather(small_pair):
    f1, f2, flow = small_pair
    cp = CorrPyramid.build(f1, f2, 3)
    fc = FlashCorr2.build(f1, f2, 3)
    for r in (3, 4):
        a = np.asarray(cp.lookup(flow, r))
        b = np.asarray(fc.lookup(flow, r))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_flash2_level0_exact_vs_dense(small_pair):
    f1, f2, flow = small_pair
    dp = DenseCorrPyramid.build(f1, f2, 1)
    fc = FlashCorr2.build(f1, f2, 1)
    a = np.asarray(dp.lookup(flow, 4))
    b = np.asarray(fc.lookup(flow, 4))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_flash2_border_crossing_queries():
    # Flows that push patches fully/partially off-plane: clamped indices
    # keep the selects legal and the epilogue zeroes exactly like the
    # gather path (grid_sample zero padding semantics).
    rng = np.random.default_rng(29)
    f1 = jnp.asarray(rng.normal(size=(1, 8, 16, 16)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(1, 8, 16, 16)).astype(np.float32))
    flow = jnp.asarray(rng.normal(0, 30, size=(1, 8, 16, 2)).astype(np.float32))
    cp = CorrPyramid.build(f1, f2, 2)
    fc = FlashCorr2.build(f1, f2, 2)
    a = np.asarray(cp.lookup(flow, 4))
    b = np.asarray(fc.lookup(flow, 4))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_flash2_bf16_storage():
    rng = np.random.default_rng(31)
    f1 = jnp.asarray(rng.normal(size=(1, 16, 20, 16)), jnp.bfloat16)
    f2 = jnp.asarray(rng.normal(size=(1, 16, 20, 16)), jnp.bfloat16)
    flow = jnp.asarray(rng.normal(0, 4, size=(1, 16, 20, 2)), jnp.float32)
    cp = CorrPyramid.build(f1, f2, 2)
    fc = FlashCorr2.build(f1, f2, 2)
    a = np.asarray(cp.lookup(flow, 4))
    b = np.asarray(fc.lookup(flow, 4))
    scale = max(1.0, np.abs(a).max())
    assert np.max(np.abs(a - b)) <= 3 * 0.0079 * scale


def test_flash2_state_roundtrip(small_pair):
    from tpuflow.core.mofnet import _corr_from_state, _corr_state

    f1, f2, flow = small_pair
    fc = FlashCorr2.build(f1, f2, 3)
    state = _corr_state(fc)
    fc2 = _corr_from_state(state, (2, 16, 24))
    assert isinstance(fc2, FlashCorr2)
    a = np.asarray(fc.lookup(flow, 4))
    b = np.asarray(fc2.lookup(flow, 4))
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_make_corr_flash2(small_pair):
    f1, f2, _ = small_pair
    fc = make_corr(f1, f2, 3, impl="flash2")
    assert isinstance(fc, FlashCorr2)


def test_flash2_inside_mofnet_scan(small_pair):
    """corr_impl='flash2' through the full MOFNet forward (kernel inside
    the scanned refine loop, interpret mode) matches the dense path."""
    import jax

    from tpuflow.core.mofnet import MOFNet

    rng = np.random.default_rng(7)
    frames = jnp.asarray(rng.random((1, 3, 32, 48, 3)).astype(np.float32))
    kw = dict(
        encoder="cnn", corr_levels=2, corr_radius=2, decoder_depth=2,
        dtype=jnp.float32,
    )
    m_dense = MOFNet(corr_impl="dense", **kw)
    m_flash2 = MOFNet(corr_impl="flash2", **kw)
    params = m_dense.init(jax.random.PRNGKey(0), frames)
    a_f, a_b = m_dense.apply(params, frames)
    b_f, b_b = m_flash2.apply(params, frames)
    # Deep levels pool FEATURES (flash2) vs VOLUMES (dense) — equal math,
    # different summation order; the difference compounds through the
    # refine iterations, so compare endpoint flows EPE-style.
    for a, b in ((a_f, b_f), (a_b, b_b)):
        a, b = np.asarray(a), np.asarray(b)
        epe = np.linalg.norm(a - b, axis=-1)
        scale = np.mean(np.linalg.norm(a, axis=-1)) + 1e-6
        assert np.mean(epe) / scale < 1e-3, (np.mean(epe), scale)


def test_flash2_chunk_gating_multichunk():
    """Grid tall enough for nm>1 chunks (lh=128, lw=16 -> g=8, npr=16,
    nm=2) with flows that concentrate each query block's patch rows in
    one chunk — the gated kernel must still match the gather path
    exactly (skipped chunks contribute all-zero bands by construction),
    including blocks whose range straddles the chunk boundary."""
    rng = np.random.default_rng(37)
    f1 = jnp.asarray(rng.normal(size=(1, 128, 16, 16)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(1, 128, 16, 16)).astype(np.float32))
    # Mix of smooth (near-zero), large vertical (crossing into the other
    # chunk), and chaotic per-query flows.
    flow = rng.normal(0, 2, size=(1, 128, 16, 2)).astype(np.float32)
    flow[0, :40, :, 1] += 70.0   # push early blocks' patches far down
    flow[0, 90:, :, 1] -= 70.0   # and late blocks' far up
    flow = jnp.asarray(flow)
    cp = CorrPyramid.build(f1, f2, 2)
    fc = FlashCorr2.build(f1, f2, 2)
    a = np.asarray(cp.lookup(flow, 4))
    b = np.asarray(fc.lookup(flow, 4))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_flash2_irregular_width_fallback():
    """Widths whose lcm with 128 is too large fall back to lane padding
    (g=1); the phase mask must still kill the padded lanes (their
    lane//lw >= 1 never matches pk=0)."""
    rng = np.random.default_rng(41)
    f1 = jnp.asarray(rng.normal(size=(1, 8, 23, 16)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(1, 8, 23, 16)).astype(np.float32))
    flow = jnp.asarray(rng.normal(0, 5, size=(1, 8, 23, 2)).astype(np.float32))
    g, gw, _, _ = level_pack_dims(8, 23)
    assert g == 1 and gw == 128  # the fallback under test
    cp = CorrPyramid.build(f1, f2, 2)
    fc = FlashCorr2.build(f1, f2, 2)
    a = np.asarray(cp.lookup(flow, 4))
    b = np.asarray(fc.lookup(flow, 4))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_flash2_through_engine_split_jits():
    """corr_impl='flash2' across the engine's encode/refine jit boundary
    (the bench/product path: FlashCorr2 state rides the MOFEncoded
    pytree as jit arguments)."""
    from tpuflow.config import ModelConfig
    from tpuflow.runtime.engine import FlowEngine

    rng = np.random.default_rng(9)
    frames = (rng.random((5, 64, 96, 3)) * 255).astype(np.uint8)

    kw = dict(
        model="videoflow", architecture="mof", sequence_length=5,
        decoder_depth=1, encoder="cnn",
    )
    dense = FlowEngine(ModelConfig(corr_impl="dense", **kw))
    dense.load_model("__random_init__")
    flash2 = FlowEngine(ModelConfig(corr_impl="flash2", **kw))
    flash2.params = dense.params  # identical weights
    flash2._loaded = True

    a = dense.compute_flow(list(frames), 2)
    b = flash2.compute_flow(list(frames), 2)
    epe = np.linalg.norm(a - b, axis=-1)
    scale = np.mean(np.linalg.norm(a, axis=-1)) + 1e-6
    assert np.mean(epe) / scale < 1e-3, (np.mean(epe), scale)
