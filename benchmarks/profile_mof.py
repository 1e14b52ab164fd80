#!/usr/bin/env python3
"""Component timings for the current MOFNet forward on the bench tile shape.

Times (after compile): fnet over T frames, cnet+att over interior frames,
cost-volume build, 12x lookup, 12x SK-update, and the full forward —
for either encoder (ENCODER=cnn|twins env, default cnn).  Identifies which
op bounds bench.py's headline number on the current architecture.

Every timed function reduces to a SCALAR on device (the dev-harness relay
moves ~0.1 MB/s device->host; block_until_ready alone does not serialize
through the tunnel, a scalar fetch does).

Usage: [ENCODER=twins] [TH=1080 TW=1280] python benchmarks/profile_mof.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=4):
    out = fn(*args)  # compile
    float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)  # one scalar fetch serializes the async chain
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
    from tpuflow.core.encoders import make_encoder
    from tpuflow.core.gma import Attention
    from tpuflow.core.mofnet import MOFNet
    from tpuflow.core.sk import SKUpdateBlockMOF

    TH = int(os.environ.get("TH", "1080"))
    TW = int(os.environ.get("TW", "1280"))
    ENC = os.environ.get("ENCODER", "cnn")
    T, B = 5, 1
    N = T - 2
    H8, W8 = TH // 8, TW // 8
    dt = jnp.bfloat16
    print(f"tile {TH}x{TW}, T={T}, B={B}, grid {H8}x{W8}, encoder={ENC}", flush=True)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def scal(x):
        return jnp.mean(jnp.abs(x)).astype(jnp.float32)

    # --- fnet over all T frames ---
    fnet = make_encoder(ENC, 256, "instance", dt)
    frames = jax.device_put(jnp.asarray(rng.random((B * T, TH, TW, 3), dtype=np.float32)))
    pf = jax.jit(fnet.init)(key, jnp.zeros((1, 64, 64, 3)))
    j_fnet = jax.jit(lambda p, x: scal(fnet.apply(p, x)))
    print(f"fnet ({B*T} frames): {timeit(j_fnet, pf, frames):.4f}s", flush=True)

    # --- cnet + att over interior frames ---
    cnet = make_encoder(ENC, 256, "batch", dt)
    pc = jax.jit(cnet.init)(key, jnp.zeros((1, 64, 64, 3)))
    att = Attention(dim=128, dim_head=128, dtype=dt)
    pa = jax.jit(att.init)(key, jnp.zeros((1, 16, 16, 128)))
    interior = frames[: B * N]

    def ctx_path(pc, pa, x):
        c = cnet.apply(pc, x)
        inp = jax.nn.relu(c[..., 128:])
        q, k = att.apply(pa, inp)
        return scal(q) + scal(k) + scal(jnp.tanh(c[..., :128]))

    j_ctx = jax.jit(ctx_path)
    print(f"cnet+att ({B*N} frames): {timeit(j_ctx, pc, pa, interior):.4f}s", flush=True)

    feats = jax.jit(lambda p, x: fnet.apply(p, x))(pf, frames).astype(dt)
    cfull = jax.jit(lambda p, x: cnet.apply(p, x))(pc, interior)
    net = jnp.tanh(cfull[..., :128])
    inp = jax.nn.relu(cfull[..., 128:])
    q, k = jax.jit(lambda p, x: att.apply(p, x))(pa, inp)

    # --- cost-volume build (2 dirs x N frames) ---
    f1 = feats[:N]
    f2 = feats[1 : N + 1]

    def build2(f1, f2):
        a = DenseCorrPyramid.build(f1, f2, 4)
        b_ = DenseCorrPyramid.build(f2, f1, 4)
        return scal(a.pyramid[0]) + scal(b_.pyramid[0])

    print(f"corr build (2 dirs x {N}): {timeit(jax.jit(build2), f1, f2):.4f}s", flush=True)

    # --- 12x lookup (2 dirs; volumes built inside the jit — argument
    # volumes would be COPIED into the loop, doubling HBM) ---
    flow = jnp.zeros((B * N, H8, W8, 2))

    def lookups(f1, f2, flow):
        cf = DenseCorrPyramid.build(f1, f2, 4)
        cb = DenseCorrPyramid.build(f2, f1, 4)

        def body(f, _):
            a = cf.lookup(f[..., :2], 4)
            b_ = cb.lookup(f[..., :2], 4)
            return f + jnp.mean(a, -1, keepdims=True) * 1e-6 + jnp.mean(b_, -1, keepdims=True) * 1e-6, None

        f4 = jnp.concatenate([flow, flow], -1)
        out, _ = jax.lax.scan(body, f4, None, length=12)
        return scal(out)

    print(f"build + lookup x12 (2 dirs): {timeit(jax.jit(lookups), f1, f2, flow):.4f}s", flush=True)

    # --- 12x SK update block (corr input fixed) ---
    upd = SKUpdateBlockMOF(hidden_dim=128, corr_levels=4, corr_radius=4, dtype=dt)
    corr_feat = jnp.zeros((B * N, H8, W8, 2 * 4 * 81), dt)
    mhs = jnp.zeros((B, N, H8, W8, 48), dt)
    flow4 = jnp.zeros((B * N, H8, W8, 4))
    pu = jax.jit(upd.init, static_argnums=8)(
        key,
        net[:, :16, :16], mhs[:, :, :16, :16], inp[:, :16, :16],
        corr_feat[:, :16, :16], flow4[:, :16, :16], q[:, :16, :16], k[:, :16, :16], B,
    )

    def upd12(pu, net, mhs, inp, corr_feat, flow4, q, k):
        def body(c, _):
            n_, m_ = c
            n2, m2, mask, dflow = upd.apply(pu, n_, m_, inp, corr_feat, flow4, q, k, B)
            return (n2, m2), None

        (n2, m2), _ = jax.lax.scan(body, (net, mhs), None, length=12)
        return scal(n2)

    print(
        f"SK update x12: {timeit(jax.jit(upd12), pu, net, mhs, inp, corr_feat, flow4, q, k):.4f}s",
        flush=True,
    )

    # --- full forward ---
    CORR = os.environ.get("CORR", "auto")
    model = MOFNet(dtype=dt, encoder=ENC, corr_impl=CORR)
    windows = jax.device_put(jnp.asarray(rng.random((B, T, TH, TW, 3), dtype=np.float32)))
    pm = jax.jit(model.init)(key, jnp.zeros((1, T, 64, 64, 3)))

    def fwd(pm, windows):
        f, _ = model.apply(pm, windows)
        return scal(f)

    print(f"full MOF forward (12 iters, corr={CORR}): {timeit(jax.jit(fwd), pm, windows, iters=2):.4f}s", flush=True)


if __name__ == "__main__":
    main()
