#!/usr/bin/env python3
"""Component timings for the 1280x1280 tile forward on the current device.

Times (after compile): feature/context encoders, cost-volume build,
one pyramid lookup, one full refinement iteration, full MOF forward.
Identifies which op bounds the bench number.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x[..., :1, :1]) if hasattr(x, "shape") and x.ndim >= 2 else x, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        # Force a host read to defeat async dispatch on the tunnel.
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf).ravel()[0]
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

    from tpuflow.core.corr import CorrPyramid
    from tpuflow.core.encoders import BasicEncoder
    from tpuflow.core.mofnet import MOFNet
    from tpuflow.core.update import UpdateBlock

    S = int(os.environ.get("TILE", "1280"))
    T = 5
    H8 = W8 = S // 8
    print(f"tile {S}x{S}, T={T}, grid {H8}x{W8}")

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # --- feature encoder over all T frames ---
    enc = BasicEncoder(output_dim=256, dtype=jnp.bfloat16)
    frames = jnp.asarray(rng.random((T, S, S, 3), dtype=np.float32))
    pe = jax.jit(enc.init)(key, jnp.zeros((1, 64, 64, 3)))  # tiny jitted init
    f_enc = jax.jit(lambda p, x: enc.apply(p, x))
    print(f"fnet (T={T} frames): {timeit(f_enc, pe, frames):.4f}s")

    feats = f_enc(pe, frames)

    # --- cost-volume build (3 interior x 2 directions) ---
    f1 = jnp.broadcast_to(feats[2][None], (3, H8, W8, 256)).astype(jnp.bfloat16)
    f2 = jnp.broadcast_to(feats[3][None], (3, H8, W8, 256)).astype(jnp.bfloat16)

    def build2(f1, f2):
        a = CorrPyramid.build(f1, f2, 4)
        b = CorrPyramid.build(f2, f1, 4)
        return a.pyramid + b.pyramid

    j_build = jax.jit(build2)
    print(f"corr build (2 dirs x 3 frames): {timeit(j_build, f1, f2):.4f}s")

    pyr = j_build(f1, f2)

    # --- one lookup over the pyramid (both directions) ---
    flow = jnp.zeros((3, H8, W8, 2))

    def do_lookup(pyr, flow):
        cp = CorrPyramid(list(pyr[:4]), (3, H8, W8), (H8, W8))
        cp2 = CorrPyramid(list(pyr[4:]), (3, H8, W8), (H8, W8))
        return cp.lookup(flow, 4), cp2.lookup(flow, 4)

    j_lookup = jax.jit(do_lookup)
    print(f"lookup (2 dirs, r=4, L=4): {timeit(j_lookup, pyr, flow):.4f}s")

    # --- one update block step (both directions) ---
    upd = UpdateBlock(128, dtype=jnp.bfloat16)
    corr_feat = j_lookup(pyr, flow)[0].astype(jnp.bfloat16)
    h = jnp.zeros((3, H8, W8, 128), jnp.bfloat16)
    inp = jnp.zeros((3, H8, W8, 128), jnp.bfloat16)
    extra = jnp.zeros((3, H8, W8, 128), jnp.bfloat16)
    pu = jax.jit(upd.init)(
        key,
        h[:, :8, :8], inp[:, :8, :8], corr_feat[:, :8, :8],
        flow[:, :8, :8], extra[:, :8, :8],
    )  # tiny jitted init

    def do_update(pu, h, inp, corr_feat, flow, extra):
        a = upd.apply(pu, h, inp, corr_feat, flow, extra)
        b = upd.apply(pu, h, inp, corr_feat, flow, extra)
        return a[0], b[0]

    j_upd = jax.jit(do_update)
    print(f"update block (2 dirs): {timeit(j_upd, pu, h, inp, corr_feat, flow, extra):.4f}s")

    # --- full forward ---
    model = MOFNet(dtype=jnp.bfloat16, corr_impl="materialized")
    windows = jnp.asarray(rng.random((1, T, S, S, 3), dtype=np.float32))
    pm = jax.jit(model.init)(key, jnp.zeros((1, T, 64, 64, 3)))  # tiny init

    def fwd(pm, windows):
        f, _ = model.apply(pm, windows)
        return f[:, f.shape[1] // 2]

    j_fwd = jax.jit(fwd)
    print(f"full MOF forward (12 iters): {timeit(j_fwd, pm, windows, iters=2):.4f}s")


if __name__ == "__main__":
    main()
