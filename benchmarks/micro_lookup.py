#!/usr/bin/env python3
"""Microbenchmark: correlation-lookup implementations at tile size.

Times ONE lookup (all levels, one direction, N = 3*160*160 queries)
for each implementation, device-resident, scalar-checksum fetch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=4, label=""):
    out = fn(*args)
    _ = float(jnp.sum(out[..., :1, :1]).astype(jnp.float32)) if hasattr(out, "shape") else None
    chk = jax.jit(lambda o: jnp.mean(jnp.abs(o)).astype(jnp.float32))
    _ = float(chk(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(chk(out))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:<28} {dt * 1000:9.2f} ms", flush=True)
    return dt


def main():
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tpuflow.core.corr import CorrPyramid

    B, H8, W8, R, L = 3, 160, 160, 4, 4
    N = B * H8 * W8
    rng = np.random.default_rng(0)

    # Synthetic flat pyramid (bf16) + flow.
    pyr = []
    lh, lw = H8, W8
    for _ in range(L):
        pyr.append(jax.device_put(jnp.asarray(
            rng.normal(size=(N, lh * lw)).astype(np.float32), dtype=jnp.bfloat16)))
        lh, lw = lh // 2, lw // 2
    flow = jax.device_put(jnp.asarray(rng.normal(0, 8, (B, H8, W8, 2)).astype(np.float32)))

    cp = CorrPyramid(list(pyr), (B, H8, W8), (H8, W8))

    bench(jax.jit(lambda f: cp.lookup_span(f, R)), flow, label="lookup span (experimental)")
    bench(jax.jit(lambda f: cp.lookup_rows(f, R)), flow, label="lookup row-band")
    if os.environ.get("MICRO_TAKE"):
        # The standalone patch-take program compiles pathologically slowly
        # on the remote helper; opt-in only.
        bench(jax.jit(lambda f: cp.lookup(f, R)), flow, label="lookup patch-take (default)")


if __name__ == "__main__":
    main()
