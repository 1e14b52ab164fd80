#!/usr/bin/env python3
"""Benchmark: 1080p optical-flow throughput, MOF seq=5, single chip.

Reproduces BASELINE.json's primary metric ("1080p flow frames/sec/chip,
MOF seq=5") using the same regime the reference uses at 1080p: tile-mode
1280x1280 (the reference requires --tile at this resolution to fit its
8 GB minimum-spec GPU, README troubleshooting + videoflow_processor.py:73).
Full-size MOFNet (decoder_depth=12, corr_levels=4, corr_radius=4 —
videoflow_core.py defaults), bf16 compute, materialized correlation
pyramids (one MXU matmul per volume), tiles batched through one compiled
forward, hard-paste assembly — end-to-end per frame including host
window/tile assembly.

`vs_baseline`: the reference publishes no numbers (BASELINE.md).  The
denominator is a documented estimate of the CUDA reference at this exact
config on its minimum spec (8 GB consumer GPU): ~0.5 frames/s for MOF
seq=5 tiled 1080p (12 GRU iterations x 2 tiles x all-pairs correlation
volumes per neighbor).  vs_baseline = frames_per_sec / 0.5.

Prints exactly one JSON line.
"""

import json
import os
import time

import numpy as np

REFERENCE_FPS_ESTIMATE = 0.5  # CUDA reference, MOF seq=5, tiled 1080p


def main():
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tpuflow.config import ModelConfig
    from tpuflow.runtime.engine import FlowEngine

    H, W, T = 1080, 1920, 5
    N_FRAMES = 8

    import sys

    def log(msg):
        print(f"[bench +{time.perf_counter() - t_start:.1f}s] {msg}", file=sys.stderr, flush=True)

    t_start = time.perf_counter()
    cfg = ModelConfig(model="videoflow", architecture="mof", sequence_length=T)
    engine = FlowEngine(cfg)
    log("initializing params (64x64 jitted init)")
    engine.load_model("__bench_random_init__")
    log("params ready")

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (H, W, 3), dtype=np.uint8) for _ in range(N_FRAMES)]

    log("warmup frame (compiles the 1280x1280 tile forward)")
    _ = engine.compute_flow_tiled(frames, 2, tile_batch=1)
    log("warmup done; timing")

    iters = 4
    t0 = time.perf_counter()
    for i in range(iters):
        flow = engine.compute_flow_tiled(frames, 2 + (i % 3), tile_batch=1)
        log(f"frame {i + 1}/{iters}")
    dt = time.perf_counter() - t0
    assert np.isfinite(flow).all()

    frames_per_sec = iters / dt
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
