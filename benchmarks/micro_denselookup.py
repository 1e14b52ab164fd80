#!/usr/bin/env python3
"""Dense-pyramid lookup: Pallas fused kernel vs XLA one-hot formulation.

Times a full 4-level lookup (12 iterations x 2 directions, like one
window's refine) at the bench-tile grid, both per-pair (B=1, the
pair-cached engine path) and batched (B=3).

Usage: [GRID=135x160] [BN=1] python benchmarks/micro_denselookup.py
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
    float(jnp.mean(out[0]) if isinstance(out, tuple) else jnp.mean(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.mean(out[0]) if isinstance(out, tuple) else jnp.mean(out))
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

    from tpuflow.core.corr import DenseCorrPyramid

    gh, gw_ = map(int, os.environ.get("GRID", "135x160").split("x"))
    bn = int(os.environ.get("BN", "1"))
    c = 256
    r = 4
    iters_refine = 12
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    f1 = jnp.asarray(rng.standard_normal((bn, gh, gw_, c)), dt)
    f2 = jnp.asarray(rng.standard_normal((bn, gh, gw_, c)), dt)
    flow = jnp.asarray(rng.standard_normal((bn, gh, gw_, 2)) * 8, jnp.float32)

    build = jax.jit(lambda a, b: DenseCorrPyramid.build(a, b, 4).pyramid)
    pyramid = build(f1, f2)
    pyr = DenseCorrPyramid(list(pyramid), (bn, gh, gw_), (gh, gw_))
    print(
        f"grid {gh}x{gw_} BN={bn}; level shapes:"
        + " ".join(str(tuple(p.shape)) for p in pyr.pyramid),
        flush=True,
    )

    def loop(mode):
        os.environ["TPUFLOW_DENSE_LOOKUP"] = mode

        @jax.jit
        def run(pyramid, flow):
            p = DenseCorrPyramid(list(pyramid), (bn, gh, gw_), (gh, gw_))

            def body(fl, _):
                o1 = p.lookup(fl, r)
                o2 = p.lookup(-fl, r)
                fl = fl + 1e-6 * (o1[..., :2] + o2[..., :2])
                return fl, None

            fl, _ = jax.lax.scan(body, flow, None, length=iters_refine)
            return fl

        return run

    for mode in ("xla", "pallas"):
        run = loop(mode)
        t = timeit(run, pyramid, flow)
        print(f"{mode:7s} 12-iter 2-dir 4-level lookup: {t*1e3:8.1f} ms", flush=True)

    # Numerics: the two paths must agree bitwise.
    os.environ["TPUFLOW_DENSE_LOOKUP"] = "xla"
    a = jax.jit(lambda fl: pyr.lookup(fl, r))(flow)
    os.environ["TPUFLOW_DENSE_LOOKUP"] = "pallas"
    b = jax.jit(lambda fl: pyr.lookup(fl, r))(flow)
    print("max |pallas - xla|:", float(jnp.max(jnp.abs(a - b))), flush=True)


if __name__ == "__main__":
    main()
