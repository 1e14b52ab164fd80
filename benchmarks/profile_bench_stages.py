#!/usr/bin/env python3
"""Stage timings of the EXACT bench.py loop: per-frame feature encode
(feat_j), window assembly + corr build (enc_j), and the 12-iteration
refine (ref_j), at both bucketed tile shapes of the 1080p bench.

The bench's steady-state window cost is feat_j (x1 new frame) + enc_j +
ref_j per tile group; this locates the fat between them.

Usage: [CORR=auto|dense|flash2] python benchmarks/profile_bench_stages.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=4):
    # Sync EVERY call (scalar fetch): outputs here can be multi-GB corr
    # pyramids, and letting iters of them pile up in-flight OOMs HBM.
    def sync(o):
        float(jax.tree.leaves(o)[0].ravel()[0])
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn(*args))
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

    from tpuflow.config import ModelConfig
    from tpuflow.runtime.engine import FlowEngine

    CORR = os.environ.get("CORR", "auto")
    T = 5
    cfg = ModelConfig(
        model="videoflow", architecture="mof", sequence_length=T, corr_impl=CORR
    )
    engine = FlowEngine(cfg)
    engine.load_model("__bench_random_init__")
    rng = np.random.default_rng(0)

    for th, tw in ((1080, 1280), (1080, 640)):
        feat_j, enc_j, ref_j = engine._videoflow_stride1_fns(th, tw)
        frame = jnp.asarray(
            rng.integers(0, 256, (1, th, tw, 3), dtype=np.uint8)
        )
        print(f"--- tile {th}x{tw} (corr={CORR}) ---", flush=True)
        t_feat = timeit(lambda f: feat_j(engine.params, f), frame)
        print(f"feat_j (1 frame):        {t_feat*1e3:7.1f} ms", flush=True)

        feats = feat_j(engine.params, frame)
        fw = jnp.stack([feats[0]] * T, axis=1)
        cw = jnp.stack([feats[1]] * T, axis=1)
        t_enc = timeit(lambda a, b: enc_j(engine.params, a, b), fw, cw)
        print(f"enc_j (assembly+build):  {t_enc*1e3:7.1f} ms", flush=True)

        enc = enc_j(engine.params, fw, cw)
        t_ref = timeit(lambda e: ref_j(engine.params, e), enc)
        print(f"ref_j (12-iter refine):  {t_ref*1e3:7.1f} ms", flush=True)
        total = t_feat + t_enc + t_ref
        print(f"steady-state window sum: {total*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
