"""Model smoke + invariance tests (tiny shapes, CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow.core.corr import (
    CorrPyramid,
    OnTheFlyCorr,
    all_pairs_correlation,
    corr_feature_dim,
    make_corr,
)
from tpuflow.core.memflownet import MemFlowNet, init_memory, memory_write
from tpuflow.core.mofnet import BOFNet, MOFNet
from tpuflow.core.padding import InputPadder, bucket_shape, pad_dims
from tpuflow.core.update import upsample_flow_convex


SMALL = dict(
    corr_levels=2,
    corr_radius=2,
    decoder_depth=2,
    feature_dim=64,
    hidden_dim=32,
    context_dim=32,
)


def test_pad_dims_multiple_of_8():
    for h, w in [(436, 1024), (100, 100), (64, 64), (65, 129)]:
        pt, pb, pl, pr = pad_dims(h, w, 8)
        assert (h + pt + pb) % 8 == 0
        assert (w + pl + pr) % 8 == 0


def test_input_padder_roundtrip():
    x = jnp.arange(2 * 3 * 50 * 70, dtype=jnp.float32).reshape(2, 3, 50, 70)
    padder = InputPadder(x.shape)
    xp = padder.pad(x)
    assert xp.shape[-2] % 8 == 0 and xp.shape[-1] % 8 == 0
    np.testing.assert_array_equal(np.asarray(padder.unpad(xp)), np.asarray(x))


def test_bucket_shape():
    assert bucket_shape(480, 854) == (512, 896)
    assert bucket_shape(64, 64) == (64, 64)


def test_all_pairs_correlation_matches_einsum():
    rng = np.random.default_rng(0)
    f1 = rng.normal(size=(2, 4, 6, 8)).astype(np.float32)
    f2 = rng.normal(size=(2, 4, 6, 8)).astype(np.float32)
    corr = np.asarray(all_pairs_correlation(jnp.asarray(f1), jnp.asarray(f2)))
    want = np.einsum("bijc,bklc->bijkl", f1, f2) / np.sqrt(8)
    np.testing.assert_allclose(corr, want, rtol=1e-5, atol=1e-5)


def test_corr_lookup_center_identity():
    # Zero flow, radius 0, one level: lookup returns the self-correlation
    # cost at each position's own location.
    rng = np.random.default_rng(1)
    f = rng.normal(size=(1, 4, 4, 8)).astype(np.float32)
    pyr = CorrPyramid.build(jnp.asarray(f), jnp.asarray(f), num_levels=1)
    out = np.asarray(pyr.lookup(jnp.zeros((1, 4, 4, 2)), radius=0))
    want = (f * f).sum(-1) / np.sqrt(8)
    np.testing.assert_allclose(out[0, :, :, 0], want[0], rtol=1e-4, atol=1e-4)


def test_corr_feature_dim():
    assert corr_feature_dim(4, 4) == 4 * 81


def test_on_the_fly_corr_matches_materialized():
    # The pooling-commutes-with-correlation identity must hold exactly
    # (up to float reassociation) for every level and arbitrary flows.
    rng = np.random.default_rng(7)
    f1 = rng.normal(size=(2, 16, 24, 32)).astype(np.float32)
    f2 = rng.normal(size=(2, 16, 24, 32)).astype(np.float32)
    flow = rng.normal(0, 3, size=(2, 16, 24, 2)).astype(np.float32)

    mat = CorrPyramid.build(jnp.asarray(f1), jnp.asarray(f2), num_levels=3)
    otf = OnTheFlyCorr.build(jnp.asarray(f1), jnp.asarray(f2), num_levels=3)

    a = np.asarray(mat.lookup(jnp.asarray(flow), radius=3))
    b = np.asarray(otf.lookup(jnp.asarray(flow), radius=3))
    assert a.shape == b.shape == (2, 16, 24, 3 * 49)
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_lookup_rows_matches_lookup():
    # The MXU-oriented row-band formulation must be numerically identical
    # to the patch-take lookup, including border-crossing queries.
    rng = np.random.default_rng(11)
    f1 = rng.normal(size=(2, 16, 24, 32)).astype(np.float32)
    f2 = rng.normal(size=(2, 16, 24, 32)).astype(np.float32)
    flow = rng.normal(0, 6, size=(2, 16, 24, 2)).astype(np.float32)
    cp = CorrPyramid.build(jnp.asarray(f1), jnp.asarray(f2), 3)
    a = np.asarray(cp.lookup(jnp.asarray(flow), 3))
    b = np.asarray(cp.lookup_rows(jnp.asarray(flow), 3))
    c = np.asarray(cp.lookup_span(jnp.asarray(flow), 3))
    np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_dense_lookup_matches_lookup():
    # The gather-free one-hot-matmul lookup must be numerically identical
    # to the patch-take lookup (same clamps, same f32 bilinear), including
    # border-crossing queries and non-square / odd-dim target planes.
    from tpuflow.core.corr import DenseCorrPyramid

    rng = np.random.default_rng(13)
    f1 = rng.normal(size=(2, 16, 24, 32)).astype(np.float32)
    f2 = rng.normal(size=(2, 16, 24, 32)).astype(np.float32)
    flow = rng.normal(0, 6, size=(2, 16, 24, 2)).astype(np.float32)
    cp = CorrPyramid.build(jnp.asarray(f1), jnp.asarray(f2), 3)
    dp = DenseCorrPyramid.build(jnp.asarray(f1), jnp.asarray(f2), 3)
    for r in (3, 4):
        a = np.asarray(cp.lookup(jnp.asarray(flow), r))
        b = np.asarray(dp.lookup(jnp.asarray(flow), r))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_dense_lookup_matches_lookup_bf16():
    # bf16 volume storage (the TPU configuration): one-hot SELECTION is
    # exact in bf16 — at integer flow (no interpolation) dense == gather
    # bit-for-bit.  At fractional flow the dense path interpolates in
    # bf16 (its consumers are bf16; the f32 intermediates measured ~2x
    # the lookup's HBM traffic — corr.py), so equality holds to bf16
    # interpolation rounding.
    from tpuflow.core.corr import DenseCorrPyramid

    rng = np.random.default_rng(17)
    f1 = jnp.asarray(rng.normal(size=(1, 16, 20, 16)), jnp.bfloat16)
    f2 = jnp.asarray(rng.normal(size=(1, 16, 20, 16)), jnp.bfloat16)
    cp = CorrPyramid.build(f1, f2, 3)
    dp = DenseCorrPyramid.build(f1, f2, 3)

    # The two BUILDERS may differ by one bf16 rounding in pooled levels
    # (different reduction association between the per-plane lax.map and
    # the chunked batched einsum), so bf16 agreement is to ulp bounds;
    # the selection/interpolation machinery itself is exact (the f32
    # test above is bit-for-bit).
    for flow in (
        jnp.asarray(rng.integers(-4, 5, size=(1, 16, 20, 2)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 4, size=(1, 16, 20, 2)), jnp.float32),
    ):
        a = np.asarray(cp.lookup(flow, 4))
        b = np.asarray(dp.lookup(flow, 4))
        scale = max(1.0, np.abs(a).max())
        assert np.max(np.abs(a - b)) <= 2 * 0.0079 * scale  # 2 ulp bf16


def test_choose_group_layouts():
    from tpuflow.core.corr import aligned_group_dims, choose_group

    # 160-wide plane rows: grouping must reach a low-padding ALIGNED
    # layout (rows mult 8, lanes mult 128 — the measured v5e padding
    # model) while keeping the per-iteration band width g*lw bounded.
    g = choose_group(160, 160, jnp.bfloat16)
    assert g * 160 <= 512  # band-width cap (loop-intermediate size)
    nh_a, gw_a = aligned_group_dims(160, 160, g)
    assert nh_a % 8 == 0 and gw_a % 128 == 0
    assert nh_a * gw_a <= 160 * 160 * 1.25
    assert choose_group(1, 128, jnp.float32) >= 1  # degenerate plane


def test_make_corr_auto_selection():
    from tpuflow.core.corr import DenseCorrPyramid

    f = jnp.zeros((1, 8, 8, 4))
    assert isinstance(make_corr(f, f, 2, "auto"), DenseCorrPyramid)
    assert isinstance(make_corr(f, f, 2, "gather"), CorrPyramid)
    big = jnp.zeros((1, 176, 176, 4))
    assert isinstance(make_corr(big, big, 2, "auto"), OnTheFlyCorr)


def test_upsample_flow_convex_constant():
    # Convex combination of a constant field is the constant (x8).
    flow = jnp.full((1, 4, 4, 2), 2.0)
    mask = jnp.zeros((1, 4, 4, 576))
    up = np.asarray(upsample_flow_convex(flow, mask))
    assert up.shape == (1, 32, 32, 2)
    # Interior only: border cells average zero-padded neighbors (RAFT
    # unfold semantics).
    np.testing.assert_allclose(up[:, 8:-8, 8:-8], 16.0, rtol=1e-5)


def test_mofnet_forward_shapes():
    model = MOFNet(**SMALL)
    frames = jnp.zeros((1, 5, 32, 48, 3))
    params = model.init(jax.random.PRNGKey(0), frames)
    fwd, bwd = model.apply(params, frames)
    assert fwd.shape == (1, 3, 32, 48, 2)
    assert bwd.shape == (1, 3, 32, 48, 2)
    assert np.isfinite(np.asarray(fwd)).all()


def test_bofnet_three_frames():
    model = BOFNet(**SMALL)
    frames = jnp.zeros((1, 3, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), frames)
    fwd, bwd = model.apply(params, frames)
    assert fwd.shape == (1, 1, 32, 32, 2)


def test_memory_ring_buffer():
    mem = init_memory(2, 3, 4, 2, 2)
    assert float(mem.valid.sum()) == 0
    k = jnp.ones((2, 4, 2))
    v = jnp.ones((2, 4, 2)) * 5
    mem = memory_write(mem, k, v)
    assert float(mem.valid.sum()) == 2  # one slot per batch element
    assert np.asarray(mem.ptr).tolist() == [1, 1]
    mem = memory_write(mem, k * 2, v)
    mem = memory_write(mem, k * 3, v)
    mem = memory_write(mem, k * 4, v)  # wraps: overwrites slot 0
    assert np.asarray(mem.ptr).tolist() == [4, 4]
    np.testing.assert_allclose(np.asarray(mem.keys[0, 0]), 4.0)
    np.testing.assert_allclose(np.asarray(mem.keys[0, 1]), 2.0)


def test_memflow_forward_and_memory_carry():
    model = MemFlowNet(memory_capacity=2, key_dim=8, value_dim=16, **SMALL)
    pair = jnp.zeros((1, 2, 32, 32, 3))
    mem0 = model.empty_memory(1, 32, 32)
    params = model.init(jax.random.PRNGKey(0), pair, mem0)
    flow, mem1, flow_low = model.apply(params, pair, mem0)
    assert flow.shape == (1, 32, 32, 2)
    assert flow_low.shape == (1, 4, 4, 2)
    assert float(mem1.valid.sum()) == 1
    # Second step consumes the carried memory.
    flow2, mem2, _ = model.apply(params, pair, mem1)
    assert float(mem2.valid.sum()) == 2
    assert np.isfinite(np.asarray(flow2)).all()


def test_memflow_warm_start():
    model = MemFlowNet(memory_capacity=2, key_dim=8, value_dim=16, **SMALL)
    pair = jnp.zeros((1, 2, 32, 32, 3))
    mem0 = model.empty_memory(1, 32, 32)
    params = model.init(jax.random.PRNGKey(0), pair, mem0)
    init = jnp.ones((1, 4, 4, 2))
    flow, _, _ = model.apply(params, pair, mem0, init)
    assert np.isfinite(np.asarray(flow)).all()


def test_refine_pairs_matches_encode_refine():
    """The pair-cached path (prepare_context per frame + pair_corr_state
    per frame pair + refine_pairs) matches encode+refine.

    Assertions at two strengths: (a) the per-pair corr states and the
    per-pair refine LOOKUP branch are BITWISE equal to the batched path
    (the volumes are the same einsums; per-pair lookup only reorders
    independent per-query work); (b) end-to-end including the per-frame
    cnet cache is equal up to float reassociation (the cnet batch is all
    T frames instead of the T-2 interiors, which can reassociate conv
    reductions — same tolerance as the engine-level stride-1 test)."""
    model = MOFNet(**SMALL)
    rng = np.random.default_rng(11)
    t = 5
    frames = jnp.asarray(rng.random((1, t, 32, 48, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), frames)

    from tpuflow.core.mofnet import MOFEncoded

    enc = model.apply(params, frames, method="encode")
    ref_fwd, ref_bwd = model.apply(params, enc, method="refine")

    feats, ctx = model.apply(
        params, frames.reshape(t, 32, 48, 3), method="frame_features"
    )
    prepared = tuple(
        model.apply(params, ctx[f : f + 1], method="prepare_context")
        for f in range(1, t - 1)
    )
    cf = tuple(
        model.apply(
            params, feats[f : f + 1], feats[f + 1 : f + 2],
            method="pair_corr_state",
        )
        for f in range(1, t - 1)
    )
    cb = tuple(
        model.apply(
            params, feats[f : f + 1], feats[f - 1 : f], method="pair_corr_state"
        )
        for f in range(1, t - 1)
    )

    # (a) per-pair volumes == batched volumes, bitwise.
    for lvl in range(len(enc.corr_fwd[1])):
        batched = np.asarray(enc.corr_fwd[1][lvl])
        per_pair = np.stack([np.asarray(s[1][lvl]) for s in cf]).reshape(
            batched.shape
        )
        np.testing.assert_array_equal(batched, per_pair)

    # (a) refine with per-pair states == refine with the batched state,
    # bitwise (identical inp/net/q/k, only the lookup branch differs).
    enc_pairs = MOFEncoded(
        inp=enc.inp, net=enc.net, q=enc.q, k=enc.k, attn=None,
        corr_fwd=cf, corr_bwd=cb, batch=enc.batch,
    )
    pf2, pb2 = model.apply(params, enc_pairs, method="refine")
    np.testing.assert_array_equal(np.asarray(pf2), np.asarray(ref_fwd))
    np.testing.assert_array_equal(np.asarray(pb2), np.asarray(ref_bwd))

    # (b) full pair-cached path, up to per-frame-cache reassociation.
    pair_fwd, pair_bwd = model.apply(params, prepared, cf, cb, method="refine_pairs")
    scale = max(1.0, float(np.abs(np.asarray(ref_fwd)).max()))
    assert np.max(np.abs(np.asarray(pair_fwd) - np.asarray(ref_fwd))) / scale < 2e-3
    assert np.max(np.abs(np.asarray(pair_bwd) - np.asarray(ref_bwd))) / scale < 2e-3
