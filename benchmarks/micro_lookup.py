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

    from tpuflow.core.corr import CorrPyramid, DenseCorrPyramid, choose_group, pyramid_level_dims

    B, H8, W8, R, L = 3, 160, 160, 4, 4
    N = B * H8 * W8
    rng = np.random.default_rng(0)

    # Synthetic pyramids generated ON DEVICE (a host-side 4 GB pyramid
    # would take minutes of RNG + relay upload).
    @jax.jit
    def gen(key):
        flat, grouped = [], []
        for lvl in range(L):
            lh, lw = pyramid_level_dims(H8, W8, lvl)
            key, sub = jax.random.split(key)
            v = jax.random.normal(sub, (N, lh * lw), jnp.bfloat16)
            flat.append(v)
            g = choose_group(lh, lw, jnp.bfloat16)
            nh = -(-lh // g)
            pad = nh * g * lw - lh * lw
            grouped.append(jnp.pad(v, ((0, 0), (0, pad))).reshape(N, nh, g * lw))
        return tuple(flat), tuple(grouped)

    pyr, grouped = gen(jax.random.PRNGKey(0))
    pyr, grouped = list(pyr), list(grouped)
    for lvl, gv in enumerate(grouped):
        print(f"  level {lvl}: grouped {gv.shape}", flush=True)
    flow = jax.device_put(jnp.asarray(rng.normal(0, 8, (B, H8, W8, 2)).astype(np.float32)))

    cp = CorrPyramid(list(pyr), (B, H8, W8), (H8, W8))
    dp = DenseCorrPyramid(list(grouped), (B, H8, W8), (H8, W8))

    bench(jax.jit(lambda f: dp.lookup(f, R)), flow, label="lookup dense (one-hot MXU)")
    bench(jax.jit(lambda f: cp.lookup_rows(f, R)), flow, label="lookup row-band")
    if os.environ.get("MICRO_SPAN"):
        # Crashed the v5e worker via the remote-compile harness; opt-in.
        bench(jax.jit(lambda f: cp.lookup_span(f, R)), flow, label="lookup span (experimental)")
    if os.environ.get("MICRO_TAKE"):
        # The standalone patch-take program compiles pathologically slowly
        # on the remote helper; opt-in only.
        bench(jax.jit(lambda f: cp.lookup(f, R)), flow, label="lookup patch-take (default)")


if __name__ == "__main__":
    main()
