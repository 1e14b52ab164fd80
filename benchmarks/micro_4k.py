#!/usr/bin/env python3
"""Full-frame 2160p correlation lookup through FlashCorr2 (VERDICT r2
missing #4: the blockwise on-the-fly path for grids whose volume cannot
exist in HBM).

At 3840x2160 the 1/8-res grid is 270x480 = 129,600 queries; the dense
L0 volume alone would be 129600^2 bf16 = 33.6 GB — impossible.  The XLA
OnTheFlyCorr fallback is scalar-gather-bound (~30 min per lookup,
kernels/__init__.py round-2 note).  FlashCorr2 recomputes correlation
rows on the MXU from 265 MB of packed pooled features and extracts
patches in VMEM — constant VMEM in grid size.

Times ONE radius lookup (all 4 levels, one direction) and a 2-direction
pair, exactly the per-iteration unit the 30-minute figure measured.

Usage: python benchmarks/micro_4k.py     (TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tpuflow.core.corr import FlashCorr2

    H8, W8, C = 270, 480, 256  # 3840x2160 at 1/8 resolution
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    print(f"full-frame 2160p grid {H8}x{W8} ({H8*W8} queries); dense L0 "
          f"volume would be {(H8*W8)**2*2/2**30:.1f} GiB", flush=True)

    f1 = jnp.asarray(rng.standard_normal((1, H8, W8, C)), dt)
    f2 = jnp.asarray(rng.standard_normal((1, H8, W8, C)), dt)
    flow = jnp.asarray(rng.normal(0, 8, (1, H8, W8, 2)), jnp.float32)

    def scal(x):
        return jnp.mean(jnp.abs(x)).astype(jnp.float32)

    def one_lookup(f1, f2, flow):
        fc = FlashCorr2.build(f1, f2, 4)
        return scal(fc.lookup(flow, 4))

    def pair_lookup(f1, f2, flow):
        cf = FlashCorr2.build(f1, f2, 4)
        cb = FlashCorr2.build(f2, f1, 4)
        return scal(cf.lookup(flow, 4)) + scal(cb.lookup(flow, 4))

    j1 = jax.jit(one_lookup)
    t0 = time.perf_counter()
    float(j1(f1, f2, flow))
    print(f"compile+first lookup: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        out = j1(f1, f2, flow)
    float(out)
    per = (time.perf_counter() - t0) / 3
    print(f"one 4-level lookup: {per:.3f}s  (XLA OnTheFlyCorr fallback "
          f"measured ~30 min — {1800/per:.0f}x)", flush=True)

    j2 = jax.jit(pair_lookup)
    float(j2(f1, f2, flow))
    t0 = time.perf_counter()
    for _ in range(3):
        out = j2(f1, f2, flow)
    float(out)
    print(f"2-direction pair: {(time.perf_counter()-t0)/3:.3f}s; "
          f"12-iteration refine ~{(time.perf_counter()-t0)/3*12/60:.1f} min/window",
          flush=True)


if __name__ == "__main__":
    main()
