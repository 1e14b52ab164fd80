#!/usr/bin/env python3
"""Sub-component timings for the SK update block at the bench tile shape.

Isolates: GMA Aggregate, the PCBlock conv stack, exact-erf vs tanh GELU,
depthwise super-kernel convs, and the convex upsample — the candidates
for the iteration-loop optimization.
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

    import flax.linen as nn

    from tpuflow.core.gma import Aggregate
    from tpuflow.core.update import upsample_flow_convex

    TH, TW = 1080, 1280
    H8, W8 = TH // 8, TW // 8
    BN = 3
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    print(f"grid {H8}x{W8}, BN={BN}", flush=True)

    def scal(x):
        return jnp.mean(jnp.abs(x)).astype(jnp.float32)

    q = jnp.asarray(rng.standard_normal((BN, H8, W8, 128)), dt)
    k = jnp.asarray(rng.standard_normal((BN, H8, W8, 128)), dt)
    mot = jnp.asarray(rng.standard_normal((BN, H8, W8, 128)), dt)

    # --- GMA aggregate x12 ---
    agg = Aggregate(dtype=dt)
    pa = jax.jit(agg.init)(key, q[:, :16, :16], k[:, :16, :16], mot[:, :16, :16])

    def agg12(pa, q, k, mot):
        def body(m, _):
            return agg.apply(pa, q, k, m) * 0.5, None
        out, _ = jax.lax.scan(body, mot, None, length=12)
        return scal(out)

    print(f"Aggregate x12: {timeit(jax.jit(agg12), pa, q, k, mot):.4f}s", flush=True)

    # --- PCBlock stack (motion encoder + gru + heads, no aggregate) x12 ---
    for approximate in (False, True):
        from tpuflow.core import sk

        orig = sk._gelu
        sk._gelu = lambda x: nn.gelu(x, approximate=approximate)
        try:
            upd = sk.SKUpdateBlockMOF(hidden_dim=128, corr_levels=4, corr_radius=4, dtype=dt)
            corr_feat = jnp.asarray(rng.standard_normal((BN, H8, W8, 2 * 4 * 81)), dt)
            net = jnp.asarray(rng.standard_normal((BN, H8, W8, 128)), dt)
            inp = jnp.asarray(rng.standard_normal((BN, H8, W8, 128)), dt)
            mhs = jnp.zeros((1, BN, H8, W8, 48), dt)
            flow4 = jnp.zeros((BN, H8, W8, 4))
            pu = jax.jit(upd.init, static_argnums=8)(
                key, net[:, :16, :16], mhs[:, :, :16, :16], inp[:, :16, :16],
                corr_feat[:, :16, :16], flow4[:, :16, :16], q[:, :16, :16],
                k[:, :16, :16], 1,
            )

            def upd12(pu, net, mhs, inp, corr_feat, flow4, q, k):
                def body(c, _):
                    n_, m_ = c
                    n2, m2, mask, dflow = upd.apply(pu, n_, m_, inp, corr_feat, flow4, q, k, 1)
                    return (n2, m2), None
                (n2, m2), _ = jax.lax.scan(body, (net, mhs), None, length=12)
                return scal(n2)

            label = "tanh-approx" if approximate else "exact-erf"
            print(
                f"SK update x12 ({label} GELU): "
                f"{timeit(jax.jit(upd12), pu, net, mhs, inp, corr_feat, flow4, q, k):.4f}s",
                flush=True,
            )
        finally:
            sk._gelu = orig

    # --- depthwise 15x15 conv alone x12 (648 channels, the biggest) ---
    x648 = jnp.asarray(rng.standard_normal((BN, H8, W8, 648)), dt)
    dwc = nn.Conv(648, (15, 15), feature_group_count=648, dtype=dt)
    pd = jax.jit(dwc.init)(key, x648[:, :32, :32])

    def dw12(pd, x):
        def body(y, _):
            return dwc.apply(pd, y) * 0.1, None
        out, _ = jax.lax.scan(body, x, None, length=12)
        return scal(out)

    print(f"depthwise 15x15 (648ch) x12: {timeit(jax.jit(dw12), pd, x648):.4f}s", flush=True)

    # --- erf GELU alone x12 on a 972-channel tensor ---
    x972 = jnp.asarray(rng.standard_normal((BN, H8, W8, 972)), dt)

    def gelu12(x):
        def body(y, _):
            return nn.gelu(y, approximate=False) * 1.001, None
        out, _ = jax.lax.scan(body, x, None, length=12)
        return scal(out)

    print(f"erf GELU (972ch) x12: {timeit(jax.jit(gelu12), x972):.4f}s", flush=True)

    def gelu12t(x):
        def body(y, _):
            return nn.gelu(y, approximate=True) * 1.001, None
        out, _ = jax.lax.scan(body, x, None, length=12)
        return scal(out)

    print(f"tanh GELU (972ch) x12: {timeit(jax.jit(gelu12t), x972):.4f}s", flush=True)

    # --- convex upsample (both directions, once) ---
    flow = jnp.zeros((BN, H8, W8, 2))
    mask = jnp.asarray(rng.standard_normal((BN, H8, W8, 64 * 9)), jnp.float32)

    def ups(flow, mask):
        return scal(upsample_flow_convex(flow, mask))

    print(f"convex upsample x1: {timeit(jax.jit(ups), flow, mask):.4f}s", flush=True)


if __name__ == "__main__":
    main()
