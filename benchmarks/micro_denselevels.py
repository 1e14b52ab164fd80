#!/usr/bin/env python3
"""Per-level timing of the DENSE gather-free lookup at the bench tile —
which pyramid levels carry the 2.4x gap between the measured lookup
(~21 ms/dir-iter) and its HBM-traffic roofline (~8.6 ms)?

Usage: [TH=1080 TW=1280 BN=3] python benchmarks/micro_denselevels.py
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
        DenseCorrPyramid,
        choose_group,
        pyramid_level_dims,
    )

    TH = int(os.environ.get("TH", "1080"))
    TW = int(os.environ.get("TW", "1280"))
    BN = int(os.environ.get("BN", "3"))
    H8, W8 = TH // 8, TW // 8
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    print(f"dense per-level: grid {H8}x{W8}, BN={BN}", flush=True)
    for lvl in range(4):
        lh, lw = pyramid_level_dims(H8, W8, lvl)
        g = choose_group(lh, lw, dt)
        print(f"  L{lvl}: {lh}x{lw} g={g} gw={-(-(g*lw)//128)*128}", flush=True)

    f1 = jnp.asarray(rng.standard_normal((BN, H8, W8, 256)), dt)
    f2 = jnp.asarray(rng.standard_normal((BN, H8, W8, 256)), dt)
    flow = jnp.zeros((BN, H8, W8, 2))
    dp = DenseCorrPyramid.build(f1, f2, 4)

    def scal(x):
        return jnp.mean(jnp.abs(x).astype(jnp.float32))

    # Per-level x24 (isolate one level by truncating the pyramid).
    # The volume is a jit ARGUMENT — closing over it captures multi-GB
    # constants (3.2 GB warning + relay-upload hang).
    for lvl in range(4):
        def lvl24(vol, flow, lvl=lvl):
            sub = DenseCorrPyramid(
                [vol], (dp.b, dp.h, dp.w), (dp.h2, dp.w2),
                level_offset=lvl,
            )

            def body(c, it):
                out = sub.lookup(flow + c * 1e-9, 4)
                return c + scal(out) * 1e-6, None

            out, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(24, dtype=jnp.int32))
            return out

        t = timeit(jax.jit(lvl24), dp.pyramid[lvl], flow)
        print(f"dense lookup x24 L{lvl}: {t*1e3:.1f} ms ({t/24*1e3:.2f} ms/call)",
              flush=True)


if __name__ == "__main__":
    main()
