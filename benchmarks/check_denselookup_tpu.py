#!/usr/bin/env python3
"""On-device pallas-vs-xla dense-lookup check: timing + numerics diff
at a bench tile grid.  Usage: [GRID=135x80] [BN=3] python benchmarks/check_denselookup_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tpuflow.core.corr import DenseCorrPyramid

    def log(m):
        print(f"[+{time.perf_counter() - t0:.0f}s] {m}", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    gh, gw_ = map(int, os.environ.get("GRID", "135x80").split("x"))
    bn = int(os.environ.get("BN", "3"))
    c, r = 256, 4
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.standard_normal((bn, gh, gw_, c)), jnp.bfloat16)
    f2 = jnp.asarray(rng.standard_normal((bn, gh, gw_, c)), jnp.bfloat16)
    flow = jnp.asarray(rng.standard_normal((bn, gh, gw_, 2)) * 8, jnp.float32)
    pyramid = jax.jit(lambda a, b: DenseCorrPyramid.build(a, b, 4).pyramid)(f1, f2)
    jax.block_until_ready(pyramid)
    log("volume built")
    outs = {}
    for mode in ("pallas", "xla"):
        os.environ["TPUFLOW_DENSE_LOOKUP"] = mode

        # Volumes must be jit ARGUMENTS: closing over them bakes them in
        # as constants and the compile constant-folds for tens of minutes.
        def run(fl, *levels):
            pyr = DenseCorrPyramid(list(levels), (bn, gh, gw_), (gh, gw_))
            return pyr.lookup(fl, r)

        f = jax.jit(run)
        o = f(flow, *pyramid)
        o.block_until_ready()
        log(f"{mode} compiled")
        t1 = time.perf_counter()
        for _ in range(8):
            o = f(flow, *pyramid)
        o.block_until_ready()
        outs[mode] = o
        print(
            f"grid {gh}x{gw_} BN={bn} {mode:6s}: "
            f"{(time.perf_counter() - t1) / 8 * 1e3:7.2f} ms/call",
            flush=True,
        )
    d = jnp.max(jnp.abs(outs["xla"] - outs["pallas"]))
    nz = jnp.sum((outs["xla"] != outs["pallas"]).astype(jnp.int32))
    print(f"max|xla-pallas| = {float(d):.6f}  ndiff = {int(nz)} / {outs['xla'].size}")

    if "--mesh" in sys.argv:
        # Real-Mosaic half of the shard_map validation (VERDICT r4 #5;
        # CPU interpret half: tests/test_sharding.py).  A 1-device TPU
        # mesh exercises the actual custom call INSIDE shard_map —
        # proving the wrap compiles and stays exact on hardware.
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
        os.environ["TPUFLOW_DENSE_LOOKUP"] = "pallas"

        def run_mesh(fl, *levels):
            pyr = DenseCorrPyramid(list(levels), (bn, gh, gw_), (gh, gw_))
            return pyr.lookup(fl, r, mesh=mesh)

        o = jax.jit(run_mesh)(flow, *pyramid)
        o.block_until_ready()
        dz = jnp.max(jnp.abs(o - outs["pallas"]))
        print(
            f"shard_map(1-dev TPU mesh) vs plain pallas: "
            f"max|diff| = {float(dz):.6f} (expect 0.0)"
        )


if __name__ == "__main__":
    main()
