#!/usr/bin/env python3
"""Benchmark: 1080p optical-flow throughput, MOF seq=5, single chip.

Reproduces BASELINE.json's primary metric ("1080p flow frames/sec/chip,
MOF seq=5") in the regime the reference itself uses at 1080p: tile mode
(it needs --tile to fit its 8 GB minimum-spec GPU).  Full-size MOFNet —
decoder_depth=12, corr_levels=4, corr_radius=4 (videoflow_core.py
defaults) — bf16 compute, gather-free dense correlation lookup.  Tile
geometry is the engine's product default: the BALANCED layout (two
uniform 960x1080 tiles per 1920x1080 frame = one shape group, one
batched trio per window; runtime/tiles.py).  Set
TPUFLOW_TILE_LAYOUT=reference to measure the reference's own grid
(1280x1080 + 640x1080 shrunken-edge tiles, two shape groups).

HEADLINE metric semantics = the reference's own: stride-1, middle-frame
flow per window (videoflow_core.py:193-195) — one full window pass per
output frame, measured over the engine's feature-cached product loop
(per-frame encoder features computed once, windows assembled from the
rolling cache — identical outputs to the reference's per-window
recompute up to float reassociation).

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

    # Sweep knobs (defaults = the measured product configuration):
    #   BENCH_CORR  = auto|dense|flash|flash2|band   correlation impl
    #   BENCH_WB    = windows per device dispatch (stride-1 batching)
    #   BENCH_PAIRS = 1 -> pair-cached loop (measured SLOWER: 0.41 vs
    #                 0.64 f/s, docs/ROUND4_NOTES.md — per-pair batch-1
    #                 lookups cost more than the volume rebuild they
    #                 save; kept for sweeps)
    CORR = os.environ.get("BENCH_CORR", "auto")
    WB = int(os.environ.get("BENCH_WB", "1"))
    PAIRS = os.environ.get("BENCH_PAIRS", "0") == "1" and WB == 1

    cfg = ModelConfig(
        model="videoflow", architecture="mof", sequence_length=T,
        corr_impl=CORR,
    )
    engine = FlowEngine(cfg)
    log("initializing params")
    engine.load_model("__bench_random_init__")

    # Host-side tile/window assembly once (the product path does this per
    # frame; it's host numpy, microseconds at these sizes).
    rng = np.random.default_rng(0)
    n_frames = T + 11
    frames = rng.integers(0, 256, (n_frames, H, W, 3), dtype=np.uint8)
    from tpuflow.runtime.tiles import resolve_tile_layout

    # Same layout resolution as the engine's product loop (balanced by
    # default: two uniform 960x1080 tiles = one shape group, one batched
    # trio; TPUFLOW_TILE_LAYOUT=reference measures the reference grid).
    _, _, _, _, tiles_info = calculate_tile_grid(
        W, H, TILE, layout=resolve_tile_layout()
    )
    wb_fit = engine._clamp_window_batch(WB, T, group_tiles_by_shape(tiles_info))
    if wb_fit != WB:
        log(f"BENCH_WB={WB} clamped to {wb_fit} (dense volumes must fit HBM)")
        WB = wb_fit

    # Feature-cached stride-1 loop exactly as the product tile path runs
    # it (engine.compute_flows_tiled_stride1): per-frame encoder features
    # are computed once and windows assemble from the rolling cache;
    # flows reduce to a checksum on device (see DEVICE THROUGHPUT note).
    # BENCH_PAIRS=1 additionally caches context prep per frame and
    # correlation volumes per frame PAIR (engine._stride1_pairs_loop).
    groups = []
    for (th, tw), idxs in group_tiles_by_shape(tiles_info).items():
        fns = (
            engine._videoflow_pair_fns(th, tw)
            if PAIRS
            else engine._videoflow_stride1_fns(th, tw)
        )
        per_frame = [
            jax.device_put(
                jnp.asarray(extract_tile_group(frames[f : f + 1], tiles_info, idxs, 0)[:, 0])
            )
            for f in range(n_frames)
        ]
        groups.append((fns, per_frame, th, tw))
        log(f"tile group {len(idxs)}x {th}x{tw} uploaded")

    @jax.jit
    def checksum(parts):
        return sum(jnp.mean(jnp.abs(p)).astype(jnp.float32) for p in parts)

    iters = 8
    start_idx = T // 2  # first centered window
    feat_caches = [dict() for _ in groups]
    pair_caches = [dict() for _ in groups]

    def one_window_wb1(i):
        # Steady state per window+group: 1 feat_j+prep_j (new frame),
        # 2 pair_j (new interior's fwd/bwd volumes), 1 ref_j.
        outs = []
        win = centered_window_indices(n_frames, i, T)
        fwd_keys = [(win[p], win[p + 1]) for p in range(1, T - 1)]
        bwd_keys = [(win[p], win[p - 1]) for p in range(1, T - 1)]
        for (fns, per_frame, th, tw), fc, pc in zip(
            groups, feat_caches, pair_caches
        ):
            feat_j, prep_j, pair_j, ref_j = fns
            for f in dict.fromkeys(win):
                if f not in fc:
                    feats, ctx = feat_j(engine.params, per_frame[f])
                    fc[f] = (feats, prep_j(engine.params, ctx))
            for key in dict.fromkeys(fwd_keys + bwd_keys):
                if key not in pc:
                    pc[key] = pair_j(engine.params, fc[key[0]][0], fc[key[1]][0])
            # Exact eviction (pair volumes are ~1.5 GB each at the
            # 1280-tile; a lax age threshold OOMs HBM).
            needed_pairs = set(fwd_keys) | set(bwd_keys)
            for f in [f for f in fc if f not in set(win)]:
                del fc[f]
            for key in [key for key in pc if key not in needed_pairs]:
                del pc[key]
            prepared = tuple(fc[win[p]][1] for p in range(1, T - 1))
            cf = tuple(pc[key] for key in fwd_keys)
            cb = tuple(pc[key] for key in bwd_keys)
            outs.append(ref_j(engine.params, prepared, cf, cb))
        return outs

    def one_window_trio(i, wb):
        # The product default: window(-batched) dispatch, windows stack
        # along the tile-group batch dim INSIDE enc_j (per-frame cached
        # features passed as a tuple — no eager stack/concat dispatches
        # in the steady-state loop, matching the engine's product path).
        outs = []
        wins = [centered_window_indices(n_frames, i + k, T) for k in range(wb)]
        for (fns, per_frame, th, tw), cache in zip(groups, feat_caches):
            feat_j, enc_j, ref_j = fns
            for f in dict.fromkeys(f for win in wins for f in win):
                if f not in cache:
                    cache[f] = feat_j(engine.params, per_frame[f])
            for f in [f for f in cache if f < i - T]:
                del cache[f]
            fw = tuple(cache[f][0] for win in wins for f in win)
            cw = tuple(cache[f][1] for win in wins for f in win)
            outs.append(ref_j(engine.params, enc_j(engine.params, fw, cw)))
        return outs

    def one_window(i, wb=1):
        if PAIRS:
            return one_window_wb1(i)
        return one_window_trio(i, wb)

    log(f"warmup (compiles features/assembly/refine per tile shape; WB={WB}, corr={CORR})")
    outs = one_window(start_idx, WB)
    chk = float(checksum(outs))
    assert np.isfinite(chk), chk
    log(f"warmup done (checksum {chk:.4f}); timing")

    # Reset caches so the timed loop pays the steady-state cost (one new
    # frame's features per window), exactly like a long clip.
    for c in feat_caches:
        c.clear()
    one_window(start_idx, WB)  # reprime caches for start_idx's window

    t0 = time.perf_counter()
    for j in range(0, iters, WB):
        outs = one_window(start_idx + 1 + j, WB)
    chk = float(checksum(outs))
    dt = time.perf_counter() - t0
    assert np.isfinite(chk)

    stride1_fps = iters / dt  # reference semantics: 1 output frame / window
    loop_name = "pair-cached" if PAIRS else "feature-cached"
    log(
        f"{iters} stride-1 windows in {dt:.3f}s -> {stride1_fps:.3f} frames/s "
        f"({loop_name} product loop, {WB}/dispatch)"
    )

    # Second scoreboard line (VERDICT r4 #9): stride-INTERIOR semantics.
    # The refine computes ALL T-2 interior flows per window pass anyway
    # (the reference throws away all but the middle one,
    # videoflow_core.py:193-195); advancing windows by T-2 keeps every
    # interior and divides the pass count by T-2.  Identical model math,
    # TPU-first output semantics — reported alongside, NEVER as the
    # headline (the mandate metric stays the reference's own stride-1).
    # BENCH_INTERIOR=0 skips the extra compile.
    interior_fps = None
    if os.environ.get("BENCH_INTERIOR", "1") == "1" and not PAIRS:
        from tpuflow.core.padding import pad_dims

        t_int = T - 2
        ref_alls = []
        for (fns, per_frame, th, tw), _cache in zip(groups, feat_caches):
            pt, pb, pl, pr = pad_dims(th, tw, 8)
            ref_alls.append(
                jax.jit(
                    lambda p, e, pt=pt, pl=pl, th=th, tw=tw: (
                        engine.model.apply(p, e, method="refine")[0][
                            :, :, pt : pt + th, pl : pl + tw
                        ]
                    )
                )
            )

        def one_window_interior(i):
            outs = []
            win = centered_window_indices(n_frames, i, T)
            for (fns, per_frame, th, tw), cache, ref_all in zip(
                groups, feat_caches, ref_alls
            ):
                feat_j, enc_j, _ = fns
                for f in dict.fromkeys(win):
                    if f not in cache:
                        cache[f] = feat_j(engine.params, per_frame[f])
                for f in [f for f in cache if f < i - T]:
                    del cache[f]
                fw = tuple(cache[f][0] for f in win)
                cw = tuple(cache[f][1] for f in win)
                outs.append(ref_all(engine.params, enc_j(engine.params, fw, cw)))
            return outs

        log("stride-interior scoreboard: warmup")
        for c in feat_caches:
            c.clear()
        outs = one_window_interior(start_idx)
        chk = float(checksum(outs))
        assert np.isfinite(chk), chk
        n_win = 3
        t0 = time.perf_counter()
        for j in range(n_win):
            outs = one_window_interior(start_idx + 1 + j * t_int)
        chk = float(checksum(outs))
        dt_int = time.perf_counter() - t0
        assert np.isfinite(chk)
        interior_fps = n_win * t_int / dt_int
        log(
            f"{n_win} stride-{t_int} windows ({n_win * t_int} interior "
            f"frames) in {dt_int:.3f}s -> {interior_fps:.3f} frames/s"
        )

    result = {
        "metric": "1080p flow frames/sec/chip (MOF seq=5, stride-1 reference semantics)",
        "value": round(stride1_fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(stride1_fps / REFERENCE_FPS_ESTIMATE, 2),
    }
    if interior_fps is not None:
        # Same window pass, every interior kept (TPU-first semantics) —
        # informational; the mandate metric above stays stride-1.
        result["stride_interior_fps"] = round(interior_fps, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
