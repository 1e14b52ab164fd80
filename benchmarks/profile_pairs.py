#!/usr/bin/env python3
"""Stage timings of the PAIR-CACHED bench loop: per-frame feat/prep,
per-pair volume build, and the refine-from-pairs, at both bucketed tile
shapes of the 1080p bench.

Usage: [CORR=auto] [TPUFLOW_DENSE_LOOKUP=auto|xla] python benchmarks/profile_pairs.py
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
        feat_j, prep_j, pair_j, ref_j = engine._videoflow_pair_fns(th, tw)
        frame = jnp.asarray(
            rng.integers(0, 256, (1, th, tw, 3), dtype=np.uint8)
        )
        print(f"--- tile {th}x{tw} (corr={CORR}, lookup={os.environ.get('TPUFLOW_DENSE_LOOKUP', 'auto')}) ---", flush=True)
        t_feat = timeit(lambda f: feat_j(engine.params, f), frame)
        print(f"feat_j (1 frame):        {t_feat*1e3:7.1f} ms", flush=True)

        feats, ctx = feat_j(engine.params, frame)
        t_prep = timeit(lambda c: prep_j(engine.params, c), ctx)
        print(f"prep_j (net/inp/q/k):    {t_prep*1e3:7.1f} ms", flush=True)
        prepared = prep_j(engine.params, ctx)

        t_pair = timeit(lambda a, b: pair_j(engine.params, a, b), feats, feats)
        print(f"pair_j (1 pair build):   {t_pair*1e3:7.1f} ms", flush=True)
        pair = pair_j(engine.params, feats, feats)

        prep3 = (prepared,) * (T - 2)
        cf = (pair,) * (T - 2)
        t_ref = timeit(lambda p3, a, b: ref_j(engine.params, p3, a, b), prep3, cf, cf)
        print(f"ref_j (12-iter refine):  {t_ref*1e3:7.1f} ms", flush=True)
        total = t_feat + t_prep + 2 * t_pair + t_ref
        print(f"steady-state window sum: {total*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
