#!/usr/bin/env python3
"""Ground-truth device-time attribution for the bench refine via a real
XLA profiler trace (jax.profiler -> chrome trace JSON -> aggregate).

Answers what the stub-ablation probes could not (zero-stubs change the
compiled program): where ref_j's wall time actually goes, fusion by
fusion, on the real chip.

Usage: [TW=1280] [NT=1] [STAGE=ref] python benchmarks/profile_trace.py
  STAGE: ref (default) | enc | feat
  NT: tiles per dispatch (the balanced product layout batches NT=2
      960x1080 tiles through one trio; TW=960 NT=2 is the headline
      configuration)
Prints top device ops by total time plus a category rollup
(convolution / lookup-select einsums / elementwise fusion / copies).
"""

import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def capture(stage: str, tw: int, nt: int, logdir: str) -> None:
    from tpuflow.config import ModelConfig
    from tpuflow.runtime.engine import FlowEngine

    th, T = 1080, 5
    cfg = ModelConfig(
        model="videoflow", architecture="mof", sequence_length=T, corr_impl="auto"
    )
    engine = FlowEngine(cfg)
    engine.load_model("__bench_random_init__")
    rng = np.random.default_rng(0)

    feat_j, enc_j, ref_j = engine._videoflow_stride1_fns(th, tw)
    frames = [
        jnp.asarray(rng.integers(0, 256, (nt, th, tw, 3), dtype=np.uint8))
        for _ in range(T)
    ]
    feats = [feat_j(engine.params, f) for f in frames]
    fw = jnp.stack([f[0] for f in feats], axis=1)
    cw = jnp.stack([f[1] for f in feats], axis=1)
    enc = enc_j(engine.params, fw, cw)
    jax.block_until_ready(enc)

    def run():
        if stage == "feat":
            return feat_j(engine.params, frames[0])
        if stage == "enc":
            return enc_j(engine.params, fw, cw)
        return ref_j(engine.params, enc)

    jax.block_until_ready(run())  # warm
    t0 = time.perf_counter()
    jax.block_until_ready(run())
    print(f"steady-state {stage} wall: {time.perf_counter() - t0:.3f}s", flush=True)

    with jax.profiler.trace(logdir):
        for _ in range(2):
            jax.block_until_ready(run())


def load_trace(logdir: str) -> dict:
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {logdir}")
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
        return json.load(f)


CATS = [
    ("conv", re.compile(r"convolution|conv_general", re.I)),
    ("matmul/einsum", re.compile(r"\bdot\b|dot_general|einsum", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("dynamic-slice/update", re.compile(r"dynamic.?(update.?)?slice|gather|scatter", re.I)),
]


def categorize(name: str, long_name: str) -> str:
    s = f"{name} {long_name}"
    for cat, pat in CATS:
        if pat.search(s):
            return cat
    if name.startswith("fusion") or "fusion" in name:
        return "elementwise-fusion"
    return "other"


def main() -> None:
    stage = os.environ.get("STAGE", "ref")
    tw = int(os.environ.get("TW", "1280"))
    nt = int(os.environ.get("NT", "1"))
    logdir = os.environ.get("LOGDIR", f"/tmp/jaxtrace_{stage}_{tw}x{nt}")
    if not os.environ.get("PARSE_ONLY"):
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
        capture(stage, tw, nt, logdir)

    data = load_trace(logdir)
    events = data.get("traceEvents", [])
    # Find the device track: pid whose process_name metadata mentions TPU.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pid_names.items() if re.search(r"TPU|device", n, re.I)}
    print(f"process tracks: {pid_names}", flush=True)

    agg = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if name.startswith("$"):  # track annotations
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        args = e.get("args", {}) or {}
        long_name = args.get("long_name", "") or args.get("tf_op", "")
        key = re.sub(r"\.\d+", "", name)  # fusion.123 -> fusion
        it = agg.setdefault(name, [0.0, 0, long_name])
        it[0] += dur
        it[1] += 1
        total += dur

    n_runs = 2
    print(f"\ntotal device time: {total / 1e3 / n_runs:.1f} ms per {stage} call")
    cat_tot = {}
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f"\ntop ops (per call, {stage}):")
    for name, (dur, cnt, long_name) in rows[:40]:
        cat = categorize(name, long_name)
        cat_tot[cat] = cat_tot.get(cat, 0.0) + dur
        ln = (long_name or "")[:140]
        print(f"{dur / 1e3 / n_runs:9.2f} ms  x{cnt // n_runs:<4d} {name[:40]:40s} {ln}")
    for name, (dur, cnt, long_name) in rows[40:]:
        cat = categorize(name, long_name)
        cat_tot[cat] = cat_tot.get(cat, 0.0) + dur
    print("\ncategory rollup (per call):")
    for cat, dur in sorted(cat_tot.items(), key=lambda kv: -kv[1]):
        print(f"{dur / 1e3 / n_runs:9.2f} ms  {cat}")


if __name__ == "__main__":
    main()
