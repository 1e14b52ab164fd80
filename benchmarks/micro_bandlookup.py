#!/usr/bin/env python3
"""BandCorrPyramid (banded sparse streaming Pallas lookup) on device vs
the XLA dense path, at bench tile shapes.

Two timings per shape, both as 12-iteration scans (mirroring refine):
  - dense: DenseCorrPyramid.lookup (full-volume one-hot stream, XLA)
  - band:  BandCorrPyramid.lookup  (chunk-range DMA Pallas kernel)
with a smooth flow field (the realistic case: block row ranges small)
and a chaotic flow field (worst case: ranges approach the full plane).

Usage: [TH=1080 TW=1280 BN=3 SMALL=1] python benchmarks/micro_bandlookup.py
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

    from tpuflow.core.corr import BandCorrPyramid, DenseCorrPyramid

    if os.environ.get("SMALL"):
        TH, TW, BN, C = 256, 256, 1, 64
    else:
        TH = int(os.environ.get("TH", "1080"))
        TW = int(os.environ.get("TW", "1280"))
        BN = int(os.environ.get("BN", "3"))
        C = 256
    H8, W8 = TH // 8, TW // 8
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    print(f"grid {H8}x{W8}, BN={BN}, C={C}", flush=True)

    f1 = jnp.asarray(rng.standard_normal((BN, H8, W8, C)), dt)
    f2 = jnp.asarray(rng.standard_normal((BN, H8, W8, C)), dt)

    # Smooth flow: slowly varying, a few px at 1/8 scale.
    ys, xs = np.mgrid[0:H8, 0:W8]
    smooth = np.stack(
        [3 * np.sin(ys / 17.0) + 2 * np.cos(xs / 23.0),
         2 * np.cos(ys / 13.0) - 3 * np.sin(xs / 29.0)], axis=-1
    )
    flow_smooth = jnp.asarray(np.broadcast_to(smooth, (BN, H8, W8, 2)), jnp.float32)
    flow_chaos = jnp.asarray(
        rng.uniform(-H8 / 2, H8 / 2, (BN, H8, W8, 2)), jnp.float32
    )

    def scan12(builder):
        def run(flow, *pyr):
            obj = builder(list(pyr), (BN, H8, W8), (H8, W8))

            def body(f, _):
                o = obj.lookup(f, 4)
                return f + jnp.mean(o, -1, keepdims=True) * 1e-6, None
            out, _ = jax.lax.scan(body, flow, None, length=12)
            return jnp.mean(jnp.abs(out)).astype(jnp.float32)
        return jax.jit(run)

    for name, builder in (("dense", DenseCorrPyramid), ("band", BandCorrPyramid)):
        pyr = jax.jit(lambda a, b, B=builder: tuple(B.build(a, b, 4).pyramid))(f1, f2)
        gb = sum(v.size * v.dtype.itemsize for v in pyr) / 1e9
        raw = scan12(builder)
        fn = lambda flow, raw=raw, pyr=pyr: raw(flow, *pyr)
        t_s = timeit(fn, flow_smooth)
        t_c = timeit(fn, flow_chaos)
        print(
            f"{name}: x12 smooth {t_s*1000:.1f} ms, chaos {t_c*1000:.1f} ms "
            f"(volumes {gb:.2f} GB)",
            flush=True,
        )
        for v in pyr:
            v.delete()  # free HBM before the next builder's volumes
        del pyr, fn, raw


if __name__ == "__main__":
    main()
