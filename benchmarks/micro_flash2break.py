#!/usr/bin/env python3
"""FlashCorr2 per-level breakdown at the bench tile: raw kernel x24 for
each pyramid level in isolation, then index-prep+epilogue, then the full
lookup — locates where the measured lookup time diverges from the FLOP
model (docs/ROUND3_NOTES.md §2 predicted ~10-13 ms/call; first on-device
measurement was ~34 ms/call).

Usage: [TH=1080 TW=1280 BN=3] python benchmarks/micro_flash2break.py
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

    from tpuflow.core.corr import (
        FlashCorr2,
        _patch_to_features,
        _radius_patch_indices,
        pyramid_level_dims,
    )
    from tpuflow.kernels.flashcorr2 import flash2_patch_level

    TH = int(os.environ.get("TH", "1080"))
    TW = int(os.environ.get("TW", "1280"))
    BN = int(os.environ.get("BN", "3"))
    H8, W8 = TH // 8, TW // 8
    hw = H8 * W8
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    print(f"flash2 breakdown: grid {H8}x{W8}, BN={BN}", flush=True)

    f1 = jnp.asarray(rng.standard_normal((BN, H8, W8, 256)), dt)
    f2 = jnp.asarray(rng.standard_normal((BN, H8, W8, 256)), dt)
    flow = jnp.zeros((BN, H8, W8, 2))
    fc = FlashCorr2.build(f1, f2, 4)
    f1q = f1.reshape(BN, hw, 256)

    def scal(x):
        return jnp.mean(jnp.abs(x).astype(jnp.float32))

    ys, xs = jnp.mgrid[0:H8, 0:W8]
    bx = (xs.astype(jnp.float32)[None] + flow[..., 0]).reshape(BN, hw)
    by = (ys.astype(jnp.float32)[None] + flow[..., 1]).reshape(BN, hw)

    # raw kernel x24, each level in isolation (indices prepped outside;
    # (rr + it) % lh keeps a real data dependency per iteration)
    for lvl in range(4):
        lh, lw = pyramid_level_dims(H8, W8, lvl)
        idx = _radius_patch_indices(bx, by, lvl, lh, lw, 4)
        f2p = fc.packed_pyr[lvl]

        def raw24(f1q, f2p, rr, cc, lh=lh, lw=lw):
            def body(c, it):
                rr2 = (rr + it) % lh
                p = flash2_patch_level(f1q, f2p, rr2, cc, lh=lh, lw=lw, side=10)
                return c + scal(p) * 1e-6, None

            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(24, dtype=jnp.int32))
            return out

        t = timeit(jax.jit(raw24), f1q, f2p, idx.rr, idx.cc)
        print(f"raw kernel x24 L{lvl} ({lh}x{lw}): {t*1e3:.1f} ms "
              f"({t/24*1e3:.2f} ms/call)", flush=True)

    # full per-level path x24 (index prep + kernel + bilinear epilogue), L0
    def l0full24(f1q, f2p, flow):
        bx = (xs.astype(jnp.float32)[None] + flow[..., 0]).reshape(BN, hw)
        by = (ys.astype(jnp.float32)[None] + flow[..., 1]).reshape(BN, hw)

        def body(c, _):
            i = _radius_patch_indices(bx + c * 1e-9, by, 0, H8, W8, 4)
            p = flash2_patch_level(f1q, f2p, i.rr, i.cc, lh=H8, lw=W8, side=10)
            feat = _patch_to_features(p, i, H8, W8, "zeros", (BN, H8, W8, 4))
            return c + scal(feat) * 1e-6, None

        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=24)
        return out

    t = timeit(jax.jit(l0full24), f1q, fc.packed_pyr[0], flow)
    print(f"kernel+idx+epilogue x24 L0: {t*1e3:.1f} ms", flush=True)

    # full lookup x12 x2dir (all levels, matches micro_corrvariants loop)
    def full12(f1, f2, flow):
        cf = FlashCorr2.build(f1, f2, 4)
        cb = FlashCorr2.build(f2, f1, 4)

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
    print(f"full lookup x12 x2dir: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
