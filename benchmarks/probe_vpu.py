#!/usr/bin/env python3
"""Anchor the VPU rate with known-FLOPs synthetic microkernels (VERDICT r4 #1).

The roofline ledger's entire SK-stack floor rests on one constant: the
VPU rate at which depthwise convs execute.  Round 3 *calibrated* it to
2 TF/s (defined as whatever the measured stack achieved — circular).
This probe derives an empirical rate from first principles:

1. **FMA peak**: a chain of K dependent multiply-adds over a resident
   array, K high enough to be compute-bound (arithmetic intensity
   K/2 FLOP/byte >> machine balance).  Measured in f32 and bf16 — if
   the bf16 rate is ~2x f32, the VPU executes packed-bf16 pairs and
   XLA emits them; if ~1x, bf16 buys bandwidth only and the "packed
   bf16 already emitted" claim (README r4) is false.
2. **Depthwise conv rate**: nn.Conv(C, (k,k), groups=C) at the bench
   geometry for k in {15, 7}, f32 vs bf16, FLOPs = 2*N*C*k^2.  This is
   the rate the SK floor must use (depthwise cannot ride the MXU —
   ROUND3_NOTES par.5).
3. **Shifted-FMA oracle**: the same depthwise math hand-written as
   k^2 roll+fma steps (what an ideal VPU schedule would execute),
   bounding how much of any conv-vs-FMA-peak gap is XLA's conv
   lowering vs physics.

Reference op being floored: the 15x15/7x7 depthwise super-kernels of
PCBlock4_Deep_nopool_res (SKFlow update stack inside the VideoFlow
checkpoints, /root/reference/processing/videoflow_core.py:91-94 tunables).

Writes docs/vpu_probe.json; run on the real chip:

    python benchmarks/probe_vpu.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=8):
    out = fn(*args)
    float(out)  # D2H of the scalar: the only reliable sync on the relay
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters


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

    import flax.linen as nn

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    results = {"device": str(jax.devices()[0])}
    print(f"device: {jax.devices()[0]}", flush=True)

    # --- 1. FMA peak: K fmas per element, fully unrolled in ONE fusion --
    # (a lax.scan carry would round-trip HBM every step and measure
    # bandwidth, not ALUs).  Two independent accumulator chains hide the
    # fma latency; K=256 => 512 FLOP/element, arithmetic intensity ~64
    # FLOP/byte >> machine balance (~0.24 TF/s per GB/s), compute-bound.
    # K high enough that compute time >> the relay's per-dispatch latency
    # (K=256 measured 0.4 "TF/s" — that was dispatch overhead, not ALUs).
    # Pitfalls this version avoids, each measured as a bogus rate:
    # - multiplier/addend must be jit ARGUMENTS: closure-captured scalars
    #   are jaxpr constants the algebraic simplifier folds through;
    # - the multiplier must be exactly representable in bf16 (1.0000001
    #   rounds to 1.0 -> the whole bf16 chain simplified away, "9 TF/s");
    # - 8 independent accumulator chains, or the dependent-fma latency
    #   caps throughput regardless of ALU count.
    K = 4096
    NELEM = 4 * 1024 * 1024
    results["fma"] = {}
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        x0 = jnp.asarray(rng.standard_normal(NELEM), dt)
        a = jnp.asarray(1.00390625, dt)  # 1 + 2^-8: exact in bf16
        b = jnp.asarray(-0.00390625, dt)

        @jax.jit
        def chain(x, a, b):
            ys = [x * jnp.asarray(1.0 + 0.125 * i, x.dtype) for i in range(8)]
            for _ in range(K // 8):
                ys = [y * a + b for y in ys]
            acc = ys[0]
            for y in ys[1:]:
                acc = acc + y
            return jnp.sum(acc[:8].astype(jnp.float32))

        t = timeit(lambda x: chain(x, a, b), x0, iters=16)
        fl = 2 * K * NELEM  # K fmas per element across the 8 chains
        tfs = fl / t / 1e12
        results["fma"][name] = tfs
        print(f"fma chain {name}: {t*1e3:.2f} ms -> {tfs:.2f} TF/s", flush=True)

    # --- 2. depthwise conv rate at the bench geometry ------------------
    # Balanced 1080p tile: grid 135x120 per tile, 2 tiles x 3 interiors
    # batched => BN=6 is the product refine's depthwise batch.
    BN, H8, W8 = 6, 135, 120
    N = BN * H8 * W8
    results["depthwise"] = {}
    for k, c in ((15, 648), (15, 128), (7, 512)):
        for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            conv = nn.Conv(c, (k, k), feature_group_count=c, dtype=dt)
            x = jnp.asarray(rng.standard_normal((BN, H8, W8, c)), dt)
            p = jax.jit(conv.init)(key, x[:, :32, :32])

            @jax.jit
            def rep(p, x, conv=conv):
                def body(y, _):
                    return conv.apply(p, y) * jnp.asarray(0.999, y.dtype), None
                y, _ = jax.lax.scan(body, x, None, length=12)
                return jnp.mean(jnp.abs(y)).astype(jnp.float32)

            t = timeit(rep, p, x, iters=4) / 12
            fl = 2 * N * c * k * k
            tfs = fl / t / 1e12
            results["depthwise"][f"dw{k}x{k}_{c}ch_{name}"] = tfs
            print(
                f"dw {k}x{k} ({c}ch, {name}) [BN={BN} {H8}x{W8}]: "
                f"{t*1e3:.2f} ms/apply -> {tfs:.2f} TF/s",
                flush=True,
            )

    # --- 3. shifted-FMA oracle of the same 15x15 depthwise -------------
    # roll+fma over the k^2 taps: the ideal VPU schedule for this op,
    # modulo the halo (rolls wrap; the conv zero-pads — same FLOPs).
    # Small operand (BN=1, C=128): XLA materializes roll intermediates,
    # so the 648ch version OOMs HBM — the RATE is what we're after.
    k, ck = 15, 128
    Nk = H8 * W8
    results["shifted_fma"] = {}
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        x = jnp.asarray(rng.standard_normal((1, H8, W8, ck)), dt)
        wts = jnp.asarray(rng.standard_normal((k, k, ck)) * 0.01, dt)

        @jax.jit
        def dwfma(w, x):
            acc = jnp.zeros_like(x)
            for dy in range(-(k // 2), k // 2 + 1):
                xs = jnp.roll(x, dy, axis=1)
                for dx in range(-(k // 2), k // 2 + 1):
                    acc = acc + jnp.roll(xs, dx, axis=2) * w[dy + k // 2, dx + k // 2]
            return jnp.mean(jnp.abs(acc)).astype(jnp.float32)

        t = timeit(dwfma, wts, x, iters=8)
        fl = 2 * Nk * ck * k * k
        tfs = fl / t / 1e12
        results["shifted_fma"][name] = tfs
        print(f"shifted-fma dw15 ({ck}ch, {name}): {t*1e3:.2f} ms -> {tfs:.2f} TF/s", flush=True)

    # --- verdict --------------------------------------------------------
    f32, bf16 = results["fma"]["f32"], results["fma"]["bf16"]
    packed = bf16 / max(f32, 1e-9)
    dw_bf16 = max(
        v for kk, v in results["depthwise"].items() if kk.endswith("bf16")
    )
    results["packed_bf16_speedup"] = packed
    results["dw_rate_bf16_tfs_best"] = dw_bf16
    print(
        f"\nverdict: bf16/f32 FMA ratio {packed:.2f} "
        f"({'packed-bf16 REAL' if packed > 1.5 else 'NOT packed — bf16 buys bandwidth only'}); "
        f"best measured bf16 depthwise rate {dw_bf16:.2f} TF/s "
        f"(roofline VPU constant: TPUFLOW_VPU_TFS={dw_bf16:.2f})",
        flush=True,
    )

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "vpu_probe.json",
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
