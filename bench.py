#!/usr/bin/env python3
"""Benchmark: 1080p optical-flow throughput, MOF seq=5, single chip.

Reproduces BASELINE.json's primary metric ("1080p flow frames/sec/chip,
MOF seq=5"): full-size MOFNet (decoder_depth=12, corr_levels=4,
corr_radius=4 — videoflow_core.py defaults) on full-frame 1920x1080
windows of 5 frames, one flow frame per window (the reference's stride-1
middle-frame semantics).

The full-frame path is only possible because of the on-the-fly correlation
lookup (tpuflow.core.corr.OnTheFlyCorr): the materialized cost volume at
1080p would need ~4 GB HBM per direction per interior frame.

`vs_baseline`: the reference publishes no numbers (BASELINE.md). The
denominator is a documented estimate of the CUDA reference at this exact
config: VideoFlow MOF seq=5 full-res 1080p on the reference's minimum
spec (8 GB consumer GPU) runs ~0.5 frames/s (12 GRU iterations over
(135*240)^2-scale correlation; the reference needs --tile at 1080p to fit
8 GB at all, videoflow_processor.py:73).  Treat vs_baseline as
frames_per_sec / 0.5.

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_FPS_ESTIMATE = 0.5  # CUDA reference, MOF seq=5, 1080p (see docstring)


def main():
    # Persistent compile cache: keeps round-over-round bench runs fast.
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tpuflow.core.mofnet import MOFNet

    H, W, T, B = 1080, 1920, 5, 1
    model = MOFNet(
        corr_levels=4,
        corr_radius=4,
        decoder_depth=12,
        feature_dim=256,
        hidden_dim=128,
        context_dim=128,
        encoder="cnn",
        corr_impl="direct",  # on-the-fly lookup: the 1080p-capable path
    )

    rng = np.random.default_rng(0)
    frames_np = rng.random((B, T, H, W, 3), dtype=np.float32)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((B, T, H, W, 3)))

    @jax.jit
    def forward(params, frames):
        fwd_flows, _ = model.apply(params, frames)
        n = fwd_flows.shape[1]
        return fwd_flows[:, n // 2]

    frames = jax.device_put(jnp.asarray(frames_np))

    # Warmup / compile.
    flow = forward(params, frames)
    jax.block_until_ready(flow)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        flow = forward(params, frames)
    jax.block_until_ready(flow)
    dt = time.perf_counter() - t0

    frames_per_sec = iters * B / dt
    print(
        json.dumps(
            {
                "metric": "1080p flow frames/sec/chip (MOF seq=5)",
                "value": round(frames_per_sec, 3),
                "unit": "frames/s",
                "vs_baseline": round(frames_per_sec / REFERENCE_FPS_ESTIMATE, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
