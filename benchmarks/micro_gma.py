#!/usr/bin/env python3
"""GMA aggregate timings at the bench tile shape (135x160, BN=3):
materialized probs matmul vs chunked-XLA recompute vs the fused Pallas
flash-attention kernel (gma.flash_aggregate).

Round-2 profiling measured the materialized aggregate at ~23 ms/iteration
(~6x off bandwidth — docs/ROUND2_NOTES.md item 7, benchmarks/profile_sk.py
'Aggregate x12: 0.28s'); the flash kernel recomputes scores in VMEM and
should land near the MXU floor (~2 ms/iteration at this shape).

Timing methodology: the axon relay caches (executable, inputs) pairs, so
repeated identical dispatches measure far above peak — each variant runs
ITERS dependent applications chained through the v input inside one jit.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpuflow.core.gma import flash_aggregate, materialize_attention

B, H, W, D = 3, 135, 160, 128
ITERS = 12


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    q = jnp.asarray(rng.normal(size=(B, H, W, D)) * 0.09, dt)  # pre-scaled
    k = jnp.asarray(rng.normal(size=(B, H, W, D)), dt)
    v0 = jnp.asarray(rng.normal(size=(B, H, W, D)), dt)
    hw = H * W

    def chain(apply):
        def f(vv, s):
            def body(i, acc):
                out = apply(acc)
                return (out * (1.0 + s * (1.0 + i))).astype(dt)
            return jax.lax.fori_loop(0, ITERS, body, vv)
        return jax.jit(f)

    def run(name, apply):
        f = chain(apply)
        try:
            f(v0, jnp.float32(1e-6)).block_until_ready()
            t0 = time.perf_counter()
            f(v0, jnp.float32(3e-6)).block_until_ready()
            dtm = (time.perf_counter() - t0) / ITERS
            print(f"{name}: {dtm*1e3:.2f} ms/apply", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)

    # materialized probs (computed once, outside the timed chain)
    attn = jax.jit(lambda a, b: materialize_attention(a, b, out_dtype=dt))(q, k)
    attn.block_until_ready()

    def apply_mat(vv):
        out = jnp.einsum(
            "bij,bjd->bid", attn, vv.reshape(B, hw, D),
            preferred_element_type=jnp.float32,
        )
        return out.reshape(B, H, W, D)

    def apply_flash(vv):
        return flash_aggregate(q, k, vv)

    run("materialized", apply_mat)
    run("flash", apply_flash)

    # parity: flash vs exact chunked softmax on one application
    exact = jax.jit(apply_mat)(v0)
    fl = jax.jit(apply_flash)(v0)
    err = float(
        jnp.max(jnp.abs(exact.astype(jnp.float32) - fl.astype(jnp.float32)))
    )
    print(f"max |materialized - flash| = {err:.4f} (bf16 probs vs f32 flash)", flush=True)


if __name__ == "__main__":
    main()
