#!/usr/bin/env python3
"""Per-stage roofline ledger for the bench headline (VERDICT r3 #9).

For each bucketed tile shape of the 1080p stride-1 bench this measures
the three steady-state jits (feat_j / enc_j / ref_j), pulls XLA's own
cost analysis (flops + bytes accessed), and computes floors:

- memory floor  = bytes accessed / HBM bandwidth
- compute floor = depthwise-conv FLOPs at the VPU rate (they cannot
  ride the MXU -- docs/ROUND3_NOTES.md par.5) + all other FLOPs at the
  MXU rate
- structural floor = max(memory, compute) per stage, plus the analytic
  dense-lookup volume-stream term for ref_j (each direction's grouped
  pyramid is re-streamed through VMEM once per refinement iteration).

Tile shapes come from the engine's ACTUAL resolved layout (balanced
2x 960x1080 by default; TPUFLOW_TILE_LAYOUT=reference measures the
reference grid) with per-shape-group multiplicity, so the ledger models
the geometry the headline runs.  It prints a markdown table and writes
docs/roofline_r5.json so the README ledger is regenerable from one
command:

    python benchmarks/roofline_ledger.py

Peak rates are TPU v5e datasheet / calibrated values (see constants).
Reference loop being measured against: the CUDA reference recomputes
this full window pass per output frame (videoflow_processor semantics);
BASELINE.md puts it at ~0.5 f/s on its design GPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# TPU v5e single chip. MXU: 197 TF/s bf16. HBM: 819 GB/s.
# VPU: empirical depthwise-conv rates, anchored by benchmarks/probe_vpu.py
# (known-FLOPs synthetic depthwise microkernels measured on-device in
# bf16 and f32 — the packed-bf16 question, VERDICT r4 #1; answer: no
# packed-bf16 exists on this chip, ALU peak 4.69 TF/s in BOTH dtypes,
# and XLA's depthwise lowering achieves 2.0-2.9 TF/s of it).  The ledger
# reads docs/vpu_probe.json when present and floors the 15x15 planes at
# the measured dw15 rate and the GRU 7x7 planes at the measured dw7
# rate; TPUFLOW_VPU_TFS=<rate> overrides both with one number (the old
# round-3 single-rate calibration was 2 TF/s).
MXU_FLOPS = 197e12
HBM_BW = 819e9


def _vpu_rates():
    """(dw15_rate, dw7_rate, source) in FLOP/s."""
    env = os.environ.get("TPUFLOW_VPU_TFS")
    if env:
        r = float(env) * 1e12
        return r, r, f"TPUFLOW_VPU_TFS={env}"
    probe = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "vpu_probe.json",
    )
    if os.path.exists(probe):
        with open(probe) as f:
            p = json.load(f)
        dw = p.get("depthwise", {})
        dw15 = dw.get("dw15x15_648ch_bf16")
        dw7 = dw.get("dw7x7_512ch_bf16")
        if dw15 and dw7:
            return dw15 * 1e12, dw7 * 1e12, "docs/vpu_probe.json (on-device)"
    return 2e12, 2e12, "round-3 calibration fallback (probe missing)"

# SK depthwise channel-plane inventory per refinement iteration
# (ROUND3_NOTES par.5): 15x15 convs over ~1560 planes + the GRU's 7x7
# over 512, per interior frame per direction-merged update.
DW15_PLANES = 1560
DW7_PLANES = 512


def timeit(fn, *args, iters=4):
    def sync(o):
        float(jax.tree.leaves(o)[0].ravel()[0])

    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn(*args))
    return (time.perf_counter() - t0) / iters


def cost_analysis(jitted, *args):
    """(flops, bytes accessed) from XLA's compiled cost analysis."""
    c = jitted.lower(*args).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


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
    from tpuflow.core import corr as corrmod
    from tpuflow.core.padding import pad_dims
    from tpuflow.runtime.engine import FlowEngine
    from tpuflow.runtime.tiles import (
        calculate_tile_grid,
        group_tiles_by_shape,
        resolve_tile_layout,
    )

    T = 5
    iters = 12
    interiors = T - 2
    W, H, TILE = 1920, 1080, 1280
    layout = resolve_tile_layout()
    _, _, _, _, tiles_info = calculate_tile_grid(W, H, TILE, layout=layout)
    shape_groups = group_tiles_by_shape(tiles_info)
    cfg = ModelConfig(
        model="videoflow", architecture="mof", sequence_length=T, corr_impl="auto"
    )
    engine = FlowEngine(cfg)
    engine.load_model("__bench_random_init__")
    rng = np.random.default_rng(0)

    vpu15, vpu7, vpu_src = _vpu_rates()
    ledger = {
        "layout": layout,
        "tiles": [],
        "rates": {
            "mxu": MXU_FLOPS,
            "hbm": HBM_BW,
            "vpu_dw15": vpu15,
            "vpu_dw7": vpu7,
            "vpu_source": vpu_src,
        },
    }
    window_ms = 0.0
    floor_ms = 0.0
    print(
        f"layout={layout}: "
        + ", ".join(f"{len(v)}x {th}x{tw}" for (th, tw), v in shape_groups.items())
    )

    for (th, tw), idxs in shape_groups.items():
        ntiles = len(idxs)  # tiles per dispatch (the group batches them)
        feat_j, enc_j, ref_j = engine._videoflow_stride1_fns(th, tw)
        frame = jnp.asarray(
            rng.integers(0, 256, (ntiles, th, tw, 3), dtype=np.uint8)
        )
        pt, pb, pl, pr = pad_dims(th, tw, 8)
        h8, w8 = (th + pt + pb) // 8, (tw + pl + pr) // 8
        grid = h8 * w8 * ntiles

        t_feat = timeit(lambda f: feat_j(engine.params, f), frame)
        feats = feat_j(engine.params, frame)
        fw = jnp.stack([feats[0]] * T, axis=1)
        cw = jnp.stack([feats[1]] * T, axis=1)
        t_enc = timeit(lambda a, b: enc_j(engine.params, a, b), fw, cw)
        enc = enc_j(engine.params, fw, cw)
        t_ref = timeit(lambda e: ref_j(engine.params, e), enc)

        fl_feat, by_feat = cost_analysis(feat_j, engine.params, frame)
        fl_enc, by_enc = cost_analysis(enc_j, engine.params, fw, cw)
        fl_ref, by_ref = cost_analysis(ref_j, engine.params, enc)

        # Analytic structural terms for the refine.
        vol_bytes = corrmod.dense_volume_bytes(h8, w8)  # one direction, BN=1
        lookup_stream = ntiles * 2 * interiors * iters * vol_bytes / HBM_BW
        dw15_flops = grid * DW15_PLANES * 15 * 15 * 2 * interiors * iters
        dw7_flops = grid * DW7_PLANES * 7 * 7 * 2 * interiors * iters
        dw_flops = dw15_flops + dw7_flops
        sk_vpu = dw15_flops / vpu15 + dw7_flops / vpu7
        mxu_rest = max(fl_ref - dw_flops, 0.0) / MXU_FLOPS

        stages = {
            "feat_j": {
                "measured_ms": t_feat * 1e3,
                "flops": fl_feat,
                "bytes": by_feat,
                "floor_ms": max(fl_feat / MXU_FLOPS, by_feat / HBM_BW) * 1e3,
                "floor_basis": "max(MXU flops, HBM bytes)",
            },
            "enc_j": {
                "measured_ms": t_enc * 1e3,
                "flops": fl_enc,
                "bytes": by_enc,
                "floor_ms": max(fl_enc / MXU_FLOPS, by_enc / HBM_BW) * 1e3,
                "floor_basis": "max(MXU flops, HBM bytes)",
            },
            "ref_j": {
                "measured_ms": t_ref * 1e3,
                "flops": fl_ref,
                "bytes": by_ref,
                "floor_ms": max(by_ref / HBM_BW, sk_vpu + mxu_rest + lookup_stream)
                * 1e3,
                "floor_basis": "SK depthwise at VPU + rest at MXU + 12x2dir volume restream",
                "components_ms": {
                    "sk_depthwise_vpu": sk_vpu * 1e3,
                    "lookup_volume_stream": lookup_stream * 1e3,
                    "mxu_rest": mxu_rest * 1e3,
                    "hbm_bytes_floor": by_ref / HBM_BW * 1e3,
                },
            },
        }
        tile_meas = sum(s["measured_ms"] for s in stages.values())
        tile_floor = sum(s["floor_ms"] for s in stages.values())
        window_ms += tile_meas
        floor_ms += tile_floor
        ledger["tiles"].append(
            {"tile": f"{ntiles}x {th}x{tw}", "grid": [h8, w8], "ntiles": ntiles,
             "stages": stages, "measured_ms": tile_meas, "floor_ms": tile_floor}
        )

        print(f"\n### tile group {ntiles}x {th}x{tw} (grid {h8}x{w8})\n", flush=True)
        print("| stage | measured ms | floor ms | ratio | basis |")
        print("|---|---|---|---|---|")
        for name, s in stages.items():
            r = s["measured_ms"] / max(s["floor_ms"], 1e-9)
            print(
                f"| {name} | {s['measured_ms']:.1f} | {s['floor_ms']:.1f} "
                f"| {r:.1f}x | {s['floor_basis']} |"
            )
        c = stages["ref_j"]["components_ms"]
        print(
            f"  ref_j floor components (ms): SK-VPU {c['sk_depthwise_vpu']:.0f}, "
            f"lookup restream {c['lookup_volume_stream']:.0f}, "
            f"MXU rest {c['mxu_rest']:.0f}, "
            f"(pure-bytes floor {c['hbm_bytes_floor']:.0f})"
        )

    ledger["window_measured_ms"] = window_ms
    ledger["window_floor_ms"] = floor_ms
    ledger["fps_measured"] = 1e3 / window_ms
    ledger["fps_ceiling"] = 1e3 / floor_ms
    print(
        f"\nsteady-state window: measured {window_ms:.0f} ms -> "
        f"{1e3 / window_ms:.2f} f/s; structural floor {floor_ms:.0f} ms -> "
        f"ceiling {1e3 / floor_ms:.2f} f/s (stride-1 reference semantics)"
    )

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "roofline_r5.json"
        if layout == "balanced"
        else f"roofline_r5_{layout}.json",
    )
    with open(out, "w") as f:
        json.dump(ledger, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
