#!/usr/bin/env python3
"""Ablation: where does the tile-window forward time go?

Variants (full-size MOF unless noted), device-resident, checksum fetch:
  full12      — full forward, 12 iterations
  depth1      — decoder_depth=1 (isolates fixed cost: encoders + volumes)
  nolookup12  — 12 iterations with the correlation lookup stubbed to zeros
                (isolates the lookup's share of per-iteration cost)
  nofusion12  — 12 iterations with temporal fusion stubbed
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

    import tpuflow.core.corr as corr_mod
    import tpuflow.core.mofnet as mof_mod
    from tpuflow.core.mofnet import MOFNet

    S, T = 1280, 5
    rng = np.random.default_rng(0)
    windows = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (1, T, S, S, 3)).astype(np.uint8))
    )

    key = jax.random.PRNGKey(0)
    chk = jax.jit(lambda o: jnp.mean(jnp.abs(o)).astype(jnp.float32))

    def run(label, model, iters=3):
        params = jax.jit(model.init)(key, jnp.zeros((1, T, 64, 64, 3)))

        @jax.jit
        def fwd(p, w):
            f, _ = model.apply(p, w.astype(jnp.float32) / 255.0)
            return f[:, f.shape[1] // 2]

        t0 = time.perf_counter()
        _ = float(chk(fwd(params, windows)))
        print(f"{label:<12} compile+1st: {time.perf_counter() - t0:7.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(params, windows)
        _ = float(chk(out))
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:<12} per-window:  {dt:7.3f}s", flush=True)
        return dt

    kw = dict(dtype=jnp.bfloat16, corr_impl="materialized")

    which = os.environ.get("ABLATE", "full12,depth1,nolookup12").split(",")

    if "full12" in which:
        run("full12", MOFNet(**kw))
    if "depth1" in which:
        run("depth1", MOFNet(decoder_depth=1, **kw))
    if "nolookup12" in which:
        real_lookup = corr_mod.CorrPyramid.lookup

        def stub_lookup(self, flow, radius=4):
            b, h, w, _ = flow.shape
            p = 4 * (2 * radius + 1) ** 2  # corr_levels * window
            return jnp.zeros((b, h, w, p), jnp.float32) + flow[..., :1] * 0
        corr_mod.CorrPyramid.lookup = stub_lookup
        try:
            run("nolookup12", MOFNet(**kw))
        finally:
            corr_mod.CorrPyramid.lookup = real_lookup
    if "nofusion12" in which:
        real_fusion = mof_mod.TemporalFusion.__call__

        def stub_fusion(self, mf, mb):
            b, n, h, w, _ = mf.shape
            return jnp.zeros((b, n, h, w, self.dim), mf.dtype)
        mof_mod.TemporalFusion.__call__ = stub_fusion
        try:
            run("nofusion12", MOFNet(**kw))
        finally:
            mof_mod.TemporalFusion.__call__ = real_fusion


if __name__ == "__main__":
    main()
