#!/usr/bin/env python3
"""In-context refine ablation at the EXACT bench tile shapes: how much of
ref_j (the 12-iteration scanned refine) is the correlation lookup vs the
SK update stack vs glue — measured by stubbing the lookup inside the
real engine-compiled refine, not by isolated micro-kernels (which have
repeatedly disagreed with in-scan costs: layouts, remat and fusion
differ inside the loop).

Variants per tile shape:
  full     — ref_j as the bench runs it
  nolookup — DenseCorrPyramid.lookup stubbed to zeros (keeps the flow
             dependence so the scan structure is unchanged)
lookup share = full - nolookup.

Usage: [TPUFLOW_DENSE_LOOKUP=xla|pallas] [TILES=1280,640]
       python benchmarks/ablate_refine.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=4):
    def sync(o):
        return float(jax.tree.leaves(o)[0].ravel()[0])

    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    sync(o)
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

    import tpuflow.core.corr as corr_mod
    from tpuflow.config import ModelConfig
    from tpuflow.runtime.engine import FlowEngine

    t0g = time.perf_counter()

    def log(m):
        print(f"[+{time.perf_counter() - t0g:.0f}s] {m}", file=sys.stderr, flush=True)

    tiles = [int(x) for x in os.environ.get("TILES", "1280,640").split(",")]
    T = 5
    rng = np.random.default_rng(0)
    results = {}

    for variant in ("full", "nolookup"):
        if variant == "nolookup":
            real = corr_mod.DenseCorrPyramid.lookup

            def stub(self, flow, radius=4, border="zeros"):
                b, h, w, _ = flow.shape
                p = len(self.pyramid) * (2 * radius + 1) ** 2
                return jnp.zeros((b, h, w, p), jnp.float32) + flow[..., :1] * 0

            corr_mod.DenseCorrPyramid.lookup = stub
        try:
            cfg = ModelConfig(
                model="videoflow", architecture="mof", sequence_length=T,
                corr_impl="auto",
            )
            engine = FlowEngine(cfg)
            engine.load_model("__bench_random_init__")
            for tw in tiles:
                th = 1080
                feat_j, enc_j, ref_j = engine._videoflow_stride1_fns(th, tw)
                frame = jnp.asarray(
                    rng.integers(0, 256, (1, th, tw, 3), dtype=np.uint8)
                )
                feats = feat_j(engine.params, frame)
                fw = jnp.stack([feats[0]] * T, axis=1)
                cw = jnp.stack([feats[1]] * T, axis=1)
                enc = enc_j(engine.params, fw, cw)
                log(f"{variant} {th}x{tw}: compiling ref_j")
                t = timeit(lambda e: ref_j(engine.params, e), enc)
                results[(variant, tw)] = t
                print(f"{variant:<9} tile {th}x{tw}: ref_j {t*1e3:7.1f} ms",
                      flush=True)
        finally:
            if variant == "nolookup":
                corr_mod.DenseCorrPyramid.lookup = real

    for tw in tiles:
        f = results.get(("full", tw))
        nl = results.get(("nolookup", tw))
        if f and nl:
            print(
                f"tile {tw}: lookup share {1e3*(f-nl):7.1f} ms, "
                f"SK+glue {1e3*nl:7.1f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
