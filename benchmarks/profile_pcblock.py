#!/usr/bin/env python3
"""Per-op timings inside PCBlock4 at the bench tile shape (135x160, BN=3).

Separates MXU matmul floor, flax 1x1 convs, depthwise super-kernels, and
assembled PCBlocks so the Pallas-fusion targets are chosen from data, not
guesses (docs/ROUND2_NOTES.md item 1: stack measured ~6x off FLOP floor).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=8):
    # float() forces a device->host transfer of the scalar result: on the
    # axon relay block_until_ready returns before remote execution
    # finishes, so it times dispatch, not compute (all-zero timings).
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
    from tpuflow.core.sk import PCBlock4

    H8, W8, BN = 135, 160, 3
    N = BN * H8 * W8
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    print(f"grid {H8}x{W8}, BN={BN}, N={N}", flush=True)

    def scal(x):
        return jnp.mean(jnp.abs(x)).astype(jnp.float32)

    def rep12(f):
        """12 dependent applications (mirrors the scanned refine loop)."""
        def g(*args):
            def body(y, _):
                return f(*args[:-1], y) * 0.999, None
            out, _ = jax.lax.scan(body, args[-1], None, length=12)
            return scal(out)
        return jax.jit(g)

    # --- raw matmul floor [N, C] @ [C, 1.5C] ---
    for c in (648, 512, 400, 256):
        mid = int(1.5 * c)
        a = jnp.asarray(rng.standard_normal((N, c)), dt)
        w = jnp.asarray(rng.standard_normal((c, mid)), dt)
        t = timeit(rep12(lambda w, a: (a @ w)[:, : a.shape[1]]), w, a)
        fl = 12 * 2 * N * c * mid
        print(f"matmul [N,{c}]@[{c},{mid}] x12: {t:.4f}s  ({fl/t/1e12:.1f} TF/s)", flush=True)

    # --- flax 1x1 conv (NHWC) at the same sizes ---
    for c in (648, 256):
        mid = int(1.5 * c)
        conv = nn.Conv(mid, (1, 1), dtype=dt)
        x = jnp.asarray(rng.standard_normal((BN, H8, W8, c)), dt)
        p = jax.jit(conv.init)(key, x[:, :16, :16])
        t = timeit(rep12(lambda p, x: conv.apply(p, x)[..., : x.shape[-1]]), p, x)
        fl = 12 * 2 * N * c * mid
        print(f"conv1x1 {c}->{mid} x12: {t:.4f}s  ({fl/t/1e12:.1f} TF/s)", flush=True)

    # --- depthwise convs at each PCBlock width ---
    for c, k in ((648, 15), (648, 1), (400, 15), (256, 15), (512, 7), (128, 15)):
        conv = nn.Conv(c, (k, k), feature_group_count=c, dtype=dt)
        x = jnp.asarray(rng.standard_normal((BN, H8, W8, c)), dt)
        p = jax.jit(conv.init)(key, x[:, :32, :32])
        t = timeit(rep12(lambda p, x: conv.apply(p, x)), p, x)
        fl = 12 * 2 * N * c * k * k
        print(f"dw {k}x{k} ({c}ch) x12: {t:.4f}s  ({fl/t/1e12:.2f} TF/s)", flush=True)

    # --- gelu+residual elementwise at 648 ---
    x = jnp.asarray(rng.standard_normal((BN, H8, W8, 648)), dt)
    y = jnp.asarray(rng.standard_normal((BN, H8, W8, 648)), dt)
    t = timeit(rep12(lambda y, x: nn.gelu(x + y, approximate=True)), y, x)
    print(f"gelu(x+y) 648ch x12: {t:.4f}s", flush=True)

    # --- assembled PCBlocks (the six production instances) ---
    specs = [
        ("convc1 648->256", 648, 256, (1, 15)),
        ("convc2 256->192", 256, 192, (1, 15)),
        ("convf2 128->64", 128, 64, (1, 15)),
        ("conv   400->172", 400, 172, (1, 15)),
        ("gru    512->128", 512, 128, (1, 7)),
        ("fhead  128->4", 128, 4, (1, 15)),
    ]
    total = 0.0
    for label, cin, cout, kc in specs:
        blk = PCBlock4(cout, kc, dtype=dt)
        x = jnp.asarray(rng.standard_normal((BN, H8, W8, cin)), dt)
        p = jax.jit(blk.init)(key, x[:, :32, :32])

        def apply12(p, x, blk=blk, cin=cin):
            def body(y, _):
                out = blk.apply(p, y)
                # feed back something of the input width to keep the chain
                return jnp.pad(out, ((0, 0),) * 3 + ((0, cin - out.shape[-1]),))[
                    ..., :cin
                ] * 0.999, None
            out, _ = jax.lax.scan(body, x, None, length=12)
            return scal(out)

        t = timeit(jax.jit(apply12), p, x)
        total += t
        mid = int(1.5 * cin)
        fl = 12 * N * 2 * (cin * mid * 2 + cin * cin + cin * mid + mid * cout
                           + cin * (kc[0] ** 2 + kc[1] ** 2))
        print(f"PCBlock {label} x12: {t:.4f}s  ({fl/t/1e12:.1f} TF/s)", flush=True)
    print(f"PCBlocks sum x12: {total:.4f}s", flush=True)


if __name__ == "__main__":
    main()
