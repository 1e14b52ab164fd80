#!/usr/bin/env python3
"""Isolated 12-iteration 2-direction lookup timing for each corr
implementation at the bench tile L-shapes, plus build-only timings —
locates where FlashCorr's expected win over dense goes.

Usage: [TH=1080 TW=1280 BN=3 FL=1] python benchmarks/micro_corrvariants.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=4):
    out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters


def main():
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tpuflow.core.corr import DenseCorrPyramid, FlashCorr, FlashCorr2

    TH = int(os.environ.get("TH", "1080"))
    TW = int(os.environ.get("TW", "1280"))
    BN = int(os.environ.get("BN", "3"))
    FL = int(os.environ.get("FL", "1"))
    H8, W8 = TH // 8, TW // 8
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    # FLOWSCALE=0 (default) is the smooth/converged regime (zero flow,
    # maximal flash2 chunk gating); FLOWSCALE=s draws N(0, s) per-pixel
    # flow — chaotic queries that defeat gating (random-init bench
    # weights produce this regime).
    fs = float(os.environ.get("FLOWSCALE", "0"))
    print(f"grid {H8}x{W8}, BN={BN}, flash_levels={FL}, flowscale={fs}", flush=True)

    f1 = jnp.asarray(rng.standard_normal((BN, H8, W8, 256)), dt)
    f2 = jnp.asarray(rng.standard_normal((BN, H8, W8, 256)), dt)
    flow = jnp.asarray(
        rng.normal(0, fs, (BN, H8, W8, 2)) if fs else np.zeros((BN, H8, W8, 2)),
        jnp.float32,
    )

    def scal(x):
        return jnp.mean(jnp.abs(x)).astype(jnp.float32)

    only = os.environ.get("ONLY")  # 'flash2' skips the other variants

    # --- build-only ---
    def build_dense(f1, f2):
        a = DenseCorrPyramid.build(f1, f2, 4)
        b = DenseCorrPyramid.build(f2, f1, 4)
        return scal(a.pyramid[0]) + scal(b.pyramid[0])

    def build_flash(f1, f2):
        a = FlashCorr.build(f1, f2, 4, flash_levels=FL)
        b = FlashCorr.build(f2, f1, 4, flash_levels=FL)
        out = scal(a.flash_pyr[0]) + scal(b.flash_pyr[0])
        if a.dense is not None:
            out = out + scal(a.dense.pyramid[0]) + scal(b.dense.pyramid[0])
        return out

    if not only:
        print(f"build dense x2dir: {timeit(jax.jit(build_dense), f1, f2)*1e3:.1f} ms", flush=True)
        print(f"build flash x2dir: {timeit(jax.jit(build_flash), f1, f2)*1e3:.1f} ms", flush=True)

    # --- lookup x12, 2 dirs ---
    def loop(mk):
        def fn(f1, f2, flow):
            cf = mk(f1, f2)
            cb = mk(f2, f1)

            def body(f, _):
                a = cf.lookup(f[..., :2], 4)
                b = cb.lookup(f[..., :2], 4)
                return (
                    f
                    + jnp.mean(a, -1, keepdims=True) * 1e-6
                    + jnp.mean(b, -1, keepdims=True) * 1e-6,
                    None,
                )

            f4 = jnp.concatenate([flow, flow], -1)
            out, _ = jax.lax.scan(body, f4, None, length=12)
            return scal(out)

        return jax.jit(fn)

    if not only:
        t_dense = timeit(
            loop(lambda a, b: DenseCorrPyramid.build(a, b, 4)), f1, f2, flow
        )
        print(f"build+lookup x12 dense: {t_dense*1e3:.1f} ms", flush=True)
        t_flash = timeit(
            loop(lambda a, b: FlashCorr.build(a, b, 4, flash_levels=FL)), f1, f2, flow
        )
        print(f"build+lookup x12 flash(FL={FL}): {t_flash*1e3:.1f} ms", flush=True)

    def build_flash2(f1, f2):
        a = FlashCorr2.build(f1, f2, 4)
        b = FlashCorr2.build(f2, f1, 4)
        return scal(a.packed_pyr[0]) + scal(b.packed_pyr[0])

    print(
        f"build flash2 x2dir: {timeit(jax.jit(build_flash2), f1, f2)*1e3:.1f} ms",
        flush=True,
    )
    t_flash2 = timeit(loop(FlashCorr2.build), f1, f2, flow)
    print(f"build+lookup x12 flash2: {t_flash2*1e3:.1f} ms", flush=True)


if __name__ == "__main__" and not os.environ.get("BREAKDOWN"):
    main()


def breakdown():
    """L0 path pieces: raw kernel x24, kernel+index-prep x24,
    full lookup x12 — run with BREAKDOWN=1."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuflow.core.corr import (
        FlashCorr,
        _patch_to_features,
        _radius_patch_indices,
    )
    from tpuflow.kernels.flashcorr import flash_patch_level, pad_f2_level

    TH = int(os.environ.get("TH", "1080"))
    TW = int(os.environ.get("TW", "1280"))
    BN = int(os.environ.get("BN", "3"))
    H8, W8 = TH // 8, TW // 8
    hw = H8 * W8
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    print(f"breakdown: grid {H8}x{W8}, BN={BN}", flush=True)

    f1 = jnp.asarray(rng.standard_normal((BN, H8, W8, 256)), dt)
    f2 = jnp.asarray(rng.standard_normal((BN, H8, W8, 256)), dt)
    flow = jnp.zeros((BN, H8, W8, 2))
    f2pad = pad_f2_level(f2)
    f1q = f1.reshape(BN, hw, 256)

    def scal(x):
        return jnp.mean(jnp.abs(x).astype(jnp.float32))

    # raw kernel x24 (indices fixed, prepped outside)
    ys, xs = jnp.mgrid[0:H8, 0:W8]
    bx = (xs.astype(jnp.float32)[None] + flow[..., 0]).reshape(BN, hw)
    by = (ys.astype(jnp.float32)[None] + flow[..., 1]).reshape(BN, hw)
    idx = _radius_patch_indices(bx, by, 0, H8, W8, 4)

    def raw24(f1q, f2pad, rr, cc):
        # (rr + it) % lh: real data dependency per iteration (prevents
        # XLA hoisting/CSE of the loop-invariant kernel call) at
        # negligible cost vs the full index prep.
        def body(c, it):
            rr2 = (rr + it) % H8
            p = flash_patch_level(
                f1q, f2pad, rr2, cc, lh=H8, lw=W8, side=10
            )
            return c + scal(p) * 1e-6, None

        out, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(24, dtype=jnp.int32)
        )
        return out

    t = timeit(jax.jit(raw24), f1q, f2pad, idx.rr, idx.cc)
    print(f"raw kernel x24: {t*1e3:.1f} ms", flush=True)

    # kernel + index prep + epilogue x24 (full L0 per-iteration path)
    def l0full24(f1q, f2pad, flow):
        bx = (xs.astype(jnp.float32)[None] + flow[..., 0]).reshape(BN, hw)
        by = (ys.astype(jnp.float32)[None] + flow[..., 1]).reshape(BN, hw)

        def body(c, _):
            i = _radius_patch_indices(bx + c * 1e-9, by, 0, H8, W8, 4)
            p = flash_patch_level(
                f1q, f2pad, i.rr, i.cc, lh=H8, lw=W8, side=10
            )
            feat = _patch_to_features(p, i, H8, W8, "zeros", (BN, H8, W8, 4))
            return c + scal(feat) * 1e-6, None

        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=24)
        return out

    t = timeit(jax.jit(l0full24), f1q, f2pad, flow)
    print(f"kernel+idx+epilogue x24: {t*1e3:.1f} ms", flush=True)

    # full FlashCorr.lookup x12 x2dir (FL=1)
    def full12(f1, f2, flow):
        cf = FlashCorr.build(f1, f2, 4, flash_levels=1)
        cb = FlashCorr.build(f2, f1, 4, flash_levels=1)

        def body(f, _):
            a = cf.lookup(f[..., :2], 4)
            b = cb.lookup(f[..., :2], 4)
            return (
                f + jnp.mean(a, -1, keepdims=True) * 1e-6
                + jnp.mean(b, -1, keepdims=True) * 1e-6,
                None,
            )

        f4 = jnp.concatenate([flow, flow], -1)
        out, _ = jax.lax.scan(body, f4, None, length=12)
        return scal(out)

    t = timeit(jax.jit(full12), f1, f2, flow)
    print(f"full lookup x12 x2dir (FL=1): {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__" and os.environ.get("BREAKDOWN"):
    breakdown()
    sys.exit(0)
