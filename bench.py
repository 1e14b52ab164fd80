#!/usr/bin/env python3
"""Benchmark: 1080p optical-flow throughput, MOF seq=5, single chip.

Reproduces BASELINE.json's primary metric ("1080p flow frames/sec/chip,
MOF seq=5") in the regime the reference itself uses at 1080p: tile mode
(it needs --tile to fit its 8 GB minimum-spec GPU).  Full-size MOFNet —
decoder_depth=12, corr_levels=4, corr_radius=4 (videoflow_core.py
defaults) — bf16 compute, gather-free dense correlation lookup, tiles
computed at their ACTUAL bucketed shapes (1280x1080 + 640x1080 per
1920x1080 frame, like the reference's shrunken edge tiles).

HEADLINE metric semantics = the reference's own: stride-1, middle-frame
flow per window (videoflow_core.py:193-195) — one full window pass per
output frame.  The engine's stride-interior mode (every interior frame
kept, (T-2)x fewer passes) is reported on stderr as a secondary number
but NOT used for the headline, since its outputs are not
frame-for-frame identical to the reference's.

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
    from tpuflow.runtime.tiles import (
        calculate_tile_grid,
        extract_tile_group,
        group_tiles_by_shape,
    )
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

    # One compiled forward per tile shape group: 1280x1080 + 640x1080
    # (the reference's shrunken edge tiles, videoflow_processor.py:112-120).
    groups = []
    for (th, tw), idxs in group_tiles_by_shape(tiles_info).items():
        tiles = extract_tile_group(frames[win], tiles_info, idxs, overlap=0)
        dev = jax.device_put(jnp.asarray(tiles))
        fwd = engine._videoflow_forward_all(th, tw)
        groups.append((fwd, dev, th, tw))
        log(f"tile group {len(idxs)}x {th}x{tw} uploaded ({tiles.nbytes / 1e6:.0f} MB)")

    @jax.jit
    def checksum(parts):
        return sum(jnp.mean(jnp.abs(p)).astype(jnp.float32) for p in parts)

    def one_window():
        return [fwd(engine.params, dev) for fwd, dev, _, _ in groups]

    log("warmup (compiles one forward per tile shape)")
    outs = one_window()
    chk = float(checksum(outs))
    assert np.isfinite(chk), chk
    frames_per_window = T - 2
    assert outs[0].shape[1] == frames_per_window
    log(f"warmup done (checksum {chk:.4f}); timing")

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        outs = one_window()
    # One scalar fetch serializes the async chain.
    chk = float(checksum(outs))
    dt = time.perf_counter() - t0
    assert np.isfinite(chk)

    stride1_fps = iters / dt  # reference semantics: 1 output frame / window
    interior_fps = iters * frames_per_window / dt
    log(
        f"{iters} window passes in {dt:.3f}s -> stride-1 (reference parity) "
        f"{stride1_fps:.3f} frames/s; stride-interior mode {interior_fps:.3f} frames/s"
    )

    print(
        json.dumps(
            {
                "metric": "1080p flow frames/sec/chip (MOF seq=5, stride-1 reference semantics)",
                "value": round(stride1_fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(stride1_fps / REFERENCE_FPS_ESTIMATE, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
