#!/usr/bin/env python3
"""Full MOF forward timing at a tile shape, with the knobs that matter
for the round-3 perf work:

  ENCODER=twins|cnn  CORR=auto|dense|flash|band  B=1  TH=1080 TW=1280
  SPLIT=1 (encode/refine split jits, the engine's production path)

Prints seconds/window and derived stride-1 frames/s for the shape.
Usage: [knobs] python benchmarks/fwd_tile.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tpuflow.core.mofnet import MOFNet

    TH = int(os.environ.get("TH", "1080"))
    TW = int(os.environ.get("TW", "1280"))
    ENC = os.environ.get("ENCODER", "twins")
    CORR = os.environ.get("CORR", "auto")
    B = int(os.environ.get("B", "1"))
    SPLIT = os.environ.get("SPLIT", "1") != "0"
    ITERS = int(os.environ.get("ITERS", "4"))
    T = 5
    dt = jnp.bfloat16
    print(f"tile {TH}x{TW}, T={T}, B={B}, encoder={ENC}, corr={CORR}, split={SPLIT}", flush=True)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    model = MOFNet(dtype=dt, encoder=ENC, corr_impl=CORR)
    windows = jax.device_put(
        jnp.asarray(rng.random((B, T, TH, TW, 3), dtype=np.float32))
    )
    t0 = time.perf_counter()
    pm = jax.jit(model.init)(key, jnp.zeros((1, T, 64, 64, 3)))
    print(f"init {time.perf_counter()-t0:.1f}s", flush=True)

    def scal(x):
        return jnp.mean(jnp.abs(x)).astype(jnp.float32)

    if SPLIT:
        enc = jax.jit(lambda p, w: model.apply(p, w, method=MOFNet.encode))
        ref = jax.jit(lambda p, s: scal(model.apply(p, s, method=MOFNet.refine)[0]))

        def fwd(p, w):
            return ref(p, enc(p, w))
    else:
        fwd = jax.jit(lambda p, w: scal(model.apply(p, w)[0]))

    t0 = time.perf_counter()
    out = fwd(pm, windows)
    float(out)
    print(f"compile+first {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fwd(pm, windows)
    float(out)
    dtm = (time.perf_counter() - t0) / ITERS
    print(
        f"forward: {dtm:.4f}s/window-batch -> {B/dtm:.3f} windows/s "
        f"(stride-1 frames/s at this tile)",
        flush=True,
    )


if __name__ == "__main__":
    main()
