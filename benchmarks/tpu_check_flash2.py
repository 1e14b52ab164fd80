#!/usr/bin/env python3
"""Compiled (real Mosaic) FlashCorr2 correctness check on the TPU.

The interpret-mode suite (tests/test_flashcorr2.py) proves numerics;
this proves the kernel COMPILES and matches the XLA dense path through
the actual Mosaic pipeline, at a small shape first (worker-crash
safety) then at the bench-tile L0 shape.  Scalar-only host transfers
(the relay is ~0.1 MB/s).

Usage: timeout 570 python benchmarks/tpu_check_flash2.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".jax_cache",
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tpuflow.core.corr import DenseCorrPyramid, FlashCorr2

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          flush=True)

    def maxdiff(f1, f2, flow, levels, r):
        dp = DenseCorrPyramid.build(f1, f2, levels)
        fc = FlashCorr2.build(f1, f2, levels)
        a = dp.lookup(flow, r)
        b = fc.lookup(flow, r)
        scale = jnp.maximum(jnp.max(jnp.abs(a)).astype(jnp.float32), 1.0)
        return jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))) / scale

    rng = np.random.default_rng(23)
    # On TPU, f32 matmuls run at DEFAULT precision as bf16 passes on the
    # MXU; dense vs flash2 then differ by summation order at bf16-pass
    # granularity (~2e-3 observed).  The f32 EXACTNESS claim is checked
    # under highest precision; bf16 rows run at product precision.
    for name, (bn, lh, lw, c, dt, tol, prec) in {
        "small-f32-highest": (1, 16, 24, 32, jnp.float32, 2e-4, "highest"),
        "small-f32-default": (1, 16, 24, 32, jnp.float32, 1e-2, None),
        "small-bf16": (1, 16, 24, 32, jnp.bfloat16, 3e-2, None),
        "benchtile-bf16": (3, 135, 160, 256, jnp.bfloat16, 3e-2, None),
    }.items():
        f1 = jnp.asarray(rng.normal(size=(bn, lh, lw, c)), dt)
        f2 = jnp.asarray(rng.normal(size=(bn, lh, lw, c)), dt)
        flow = jnp.asarray(
            rng.normal(0, 6, size=(bn, lh, lw, 2)).astype(np.float32)
        )
        import contextlib
        ctx = (jax.default_matmul_precision(prec) if prec
               else contextlib.nullcontext())
        with ctx:
            d = float(
                jax.jit(maxdiff, static_argnums=(3, 4))(f1, f2, flow, 2, 4)
            )
        status = "OK" if d < tol else "FAIL"
        print(f"{name}: rel maxdiff {d:.2e} (tol {tol:g}) {status}", flush=True)
        if d >= tol:
            sys.exit(1)
    print("flash2 compiled-path check: ALL OK", flush=True)


if __name__ == "__main__":
    main()
