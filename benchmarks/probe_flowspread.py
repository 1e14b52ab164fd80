#!/usr/bin/env python3
"""Local flow spread in the BENCH regime (random-init MOF, bench tile):
for each pyramid level and each (QTH x QTW) query tile, how many target
rows/cols do the tile's radius-lookup patches span?  This decides
whether a 2D-windowed lookup formulation (per-tile dynamic f2 windows,
shared patch extraction) gets to skip most of the plane in the regime
the driver bench actually measures — chunk gating's round-3 failure
was measured on SYNTHETIC chaos, not on what random-init flows look
like locally.

All statistics reduce on device; only scalars cross the relay.

Usage: [QT=8x32] [TW=1280] python benchmarks/probe_flowspread.py
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
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".jax_cache",
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tpuflow.config import ModelConfig
    from tpuflow.runtime.engine import FlowEngine

    t0 = time.perf_counter()

    def log(m):
        print(f"[+{time.perf_counter() - t0:.0f}s] {m}", file=sys.stderr, flush=True)

    qth, qtw = map(int, os.environ.get("QT", "8x32").split("x"))
    tw = int(os.environ.get("TW", "1280"))
    th, T, r = 1080, 5, 4
    side = 2 * r + 2

    cfg = ModelConfig(
        model="videoflow", architecture="mof", sequence_length=T, corr_impl="auto"
    )
    engine = FlowEngine(cfg)
    engine.load_model("__bench_random_init__")
    rng = np.random.default_rng(0)

    feat_j, enc_j, ref_j = engine._videoflow_stride1_fns(th, tw)
    frames = [
        jnp.asarray(rng.integers(0, 256, (1, th, tw, 3), dtype=np.uint8))
        for _ in range(T)
    ]
    feats = [feat_j(engine.params, f) for f in frames]
    fw = jnp.stack([f[0] for f in feats], axis=1)
    cw = jnp.stack([f[1] for f in feats], axis=1)
    enc = enc_j(engine.params, fw, cw)
    log("encoded; running refine")
    flows_up = ref_j(engine.params, enc)  # [BN, th, tw, 2] fwd (upsampled)

    h8, w8 = th // 8, tw // 8

    @jax.jit
    def spread_stats(flows_up):
        # 1/8-res flow approximation: sample the upsampled field at
        # 8-pixel stride and divide by 8 (exact enough for span stats).
        fl = flows_up[:, ::8, ::8, :] / 8.0  # [BN, h8, w8, 2]
        bn = fl.shape[0]
        ys, xs = jnp.mgrid[0:h8, 0:w8]
        bx = xs[None] + fl[..., 0]
        by = ys[None] + fl[..., 1]
        out = {}
        for lvl in range(4):
            cx = bx / (2.0 ** lvl)
            cy = by / (2.0 ** lvl)
            # Tile the query grid: [BN, nty, QTH, ntx, QTW]
            nty, ntx = h8 // qth, w8 // qtw
            cyt = cy[:, : nty * qth, : ntx * qtw].reshape(bn, nty, qth, ntx, qtw)
            cxt = cx[:, : nty * qth, : ntx * qtw].reshape(bn, nty, qth, ntx, qtw)
            # Patch span per tile (rows): max ceil(cy)+r+1 - min floor(cy)-r
            span_y = (
                jnp.max(jnp.ceil(cyt), axis=(2, 4))
                - jnp.min(jnp.floor(cyt), axis=(2, 4))
            ) + side
            span_x = (
                jnp.max(jnp.ceil(cxt), axis=(2, 4))
                - jnp.min(jnp.floor(cxt), axis=(2, 4))
            ) + side
            qs = jnp.array([0.5, 0.9, 0.99, 1.0])
            out[lvl] = (
                jnp.quantile(span_y.ravel(), qs),
                jnp.quantile(span_x.ravel(), qs),
                jnp.mean((span_y <= 24) & (span_x <= 48)),
                jnp.mean((span_y <= 32) & (span_x <= 64)),
                jnp.mean((span_y <= 48) & (span_x <= 96)),
            )
        return out

    stats = spread_stats(flows_up)
    log("stats computed; fetching scalars")
    print(f"tile {th}x{tw}, query tile {qth}x{qtw}, FINAL-iteration flow:")
    for lvl in range(4):
        sy, sx, f24, f32, f48 = stats[lvl]
        sy = np.asarray(sy)
        sx = np.asarray(sx)
        print(
            f"L{lvl}: span_y p50/p90/p99/max = "
            f"{sy[0]:5.1f}/{sy[1]:5.1f}/{sy[2]:5.1f}/{sy[3]:5.1f}  "
            f"span_x = {sx[0]:5.1f}/{sx[1]:5.1f}/{sx[2]:5.1f}/{sx[3]:5.1f}  "
            f"fit24x48/32x64/48x96 = {float(f24):.3f}/{float(f32):.3f}/{float(f48):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
