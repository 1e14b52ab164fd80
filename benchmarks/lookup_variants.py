#!/usr/bin/env python3
"""Perf experiment: correlation-lookup formulations at the bench tile shape.

Times ONE direction x 12 iterations of the full 4-level pyramid lookup for
several formulations (numerics checked elsewhere; this is a speed race):

  v1  current DenseCorrPyramid.lookup (one-hot row matmul + one-hot col matmul)
  v2  bilinear folded into row/col selects (9-wide outputs, one less stage)
  v3  v2 + diagonal-batched column contraction (14 queries share one MXU
      matmul; block-diagonal extraction by einsum)
  v4  row gather via take_along_axis (contiguous gw rows) + folded col matmul
  v5  v4 rows + diagonal-batched columns

Run: python benchmarks/lookup_variants.py
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
    float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters


H8, W8 = 135, 160
BN = 3
N = BN * H8 * W8
R = 4
SIDE = 2 * R + 2  # 10
S9 = 2 * R + 1    # 9


def level_dims(lvl):
    lh, lw = H8, W8
    for _ in range(lvl):
        lh, lw = lh // 2, lw // 2
    return lh, lw


def coords(flow, lvl):
    """Shared per-level coordinate math: returns patch origins and fractions."""
    ys, xs = jnp.mgrid[0:H8, 0:W8]
    base_x = (xs.astype(jnp.float32)[None] + flow[..., 0]).reshape(N)
    base_y = (ys.astype(jnp.float32)[None] + flow[..., 1]).reshape(N)
    cx = base_x / (2.0 ** lvl)
    cy = base_y / (2.0 ** lvl)
    fx0 = jnp.floor(cx)
    fy0 = jnp.floor(cy)
    return (
        fx0.astype(jnp.int32) - R,
        fy0.astype(jnp.int32) - R,
        cx - fx0,
        cy - fy0,
    )


def make_pyramid(key):
    """Grouped [N, nh, g*lw] volumes like DenseCorrPyramid."""
    from tpuflow.core.corr import choose_group

    vols, metas = [], []
    for lvl in range(4):
        lh, lw = level_dims(lvl)
        g = choose_group(lh, lw, jnp.bfloat16)
        nh = -(-lh // g)
        key, k2 = jax.random.split(key)
        vols.append(jax.random.normal(k2, (N, nh, g * lw), jnp.bfloat16))
        metas.append((lh, lw, g, nh))
    return vols, metas


# ---------------------------------------------------------------------------
# v1: the production lookup
def v1(vols, metas, flow):
    from tpuflow.core.corr import DenseCorrPyramid

    cp = DenseCorrPyramid(list(vols), (BN, H8, W8), (H8, W8))
    return cp.lookup(flow, R)


# ---------------------------------------------------------------------------
def _folded_selects(px, py, wx, wy, lh, lw, g, nh, dtype):
    """Row select one-hot [N, SIDE, nh] (+ phase), and the FOLDED column
    matrix Cb [N, S9, g*lw]: x-bilinear weights with zero-border masks."""
    jj = jnp.arange(SIDE, dtype=jnp.int32)
    yraw = py[:, None] + jj[None, :]
    rr = jnp.clip(yraw, 0, lh - 1)
    hk = rr // g
    pk = rr % g

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, SIDE, nh), 2)
    Rsel = (hk[:, :, None] == row_iota).astype(dtype)

    j9 = jnp.arange(S9, dtype=jnp.int32)
    x0 = px[:, None] + j9[None, :]          # left corner column (unclamped)
    c0 = jnp.clip(x0, 0, lw - 1)
    c1 = jnp.clip(x0 + 1, 0, lw - 1)
    v0 = ((x0 >= 0) & (x0 < lw)).astype(jnp.float32)
    v1_ = ((x0 + 1 >= 0) & (x0 + 1 < lw)).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, g * lw), 2)
    col = lane % lw
    w0 = ((1 - wx)[:, None] * v0)[:, :, None]
    w1 = (wx[:, None] * v1_)[:, :, None]
    Cb = (
        w0 * (col == c0[:, :, None]).astype(jnp.float32)
        + w1 * (col == c1[:, :, None]).astype(jnp.float32)
    ).astype(dtype)
    return Rsel, pk, yraw, Cb


def _rows_to_bands(vol, Rsel, pk, lw):
    """One-hot row matmul + phase mask -> [N, SIDE, gw] f32."""
    bands = jnp.einsum("nsh,nhw->nsw", Rsel, vol, preferred_element_type=jnp.float32)
    gw = vol.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, gw), 2)
    return bands * (lane // lw == pk[:, :, None])


def _row_bilinear(bands, yraw, wy, lh):
    """[N, SIDE, X] -> [N, S9, X] with y-bilinear + zero-border row masks."""
    vr = ((yraw >= 0) & (yraw < lh)).astype(jnp.float32)
    b = bands * vr[:, :, None]
    return b[:, :-1] * (1 - wy)[:, None, None] + b[:, 1:] * wy[:, None, None]


def v2_level(vol, meta, flow, lvl):
    lh, lw, g, nh = meta
    px, py, wx, wy = coords(flow, lvl)
    Rsel, pk, yraw, Cb = _folded_selects(px, py, wx, wy, lh, lw, g, nh, vol.dtype)
    bands = _rows_to_bands(vol, Rsel, pk, lw)
    patch = jnp.einsum(
        "nsw,ncw->nsc", bands.astype(vol.dtype), Cb, preferred_element_type=jnp.float32
    )  # [N, SIDE, S9]
    out = _row_bilinear(patch, yraw, wy, lh)  # [N, S9, S9]
    return out.swapaxes(1, 2).reshape(BN, H8, W8, S9 * S9)


def v2(vols, metas, flow):
    return jnp.concatenate(
        [v2_level(v, m, flow, l) for l, (v, m) in enumerate(zip(vols, metas))], -1
    )


def v3_level(vol, meta, flow, lvl, Q=14):
    lh, lw, g, nh = meta
    px, py, wx, wy = coords(flow, lvl)
    Rsel, pk, yraw, Cb = _folded_selects(px, py, wx, wy, lh, lw, g, nh, vol.dtype)
    bands = _rows_to_bands(vol, Rsel, pk, lw)          # [N, SIDE, gw] f32
    bands = _row_bilinear(bands, yraw, wy, lh)         # [N, S9, gw]
    gw = vol.shape[2]
    nb = N // Q
    A = bands.astype(vol.dtype).reshape(nb, Q * S9, gw)
    C = Cb.reshape(nb, Q * S9, gw)
    big = jnp.einsum("nag,nbg->nab", A, C, preferred_element_type=jnp.float32)
    big = big.reshape(nb, Q, S9, Q, S9)
    diag = jnp.einsum("nqyqx->nqyx", big)              # block-diagonal extract
    return diag.reshape(N, S9, S9).swapaxes(1, 2).reshape(BN, H8, W8, S9 * S9)


def v3(vols, metas, flow):
    return jnp.concatenate(
        [v3_level(v, m, flow, l) for l, (v, m) in enumerate(zip(vols, metas))], -1
    )


def v4_level(vol, meta, flow, lvl):
    lh, lw, g, nh = meta
    px, py, wx, wy = coords(flow, lvl)
    Rsel, pk, yraw, Cb = _folded_selects(px, py, wx, wy, lh, lw, g, nh, vol.dtype)
    jj = jnp.arange(SIDE, dtype=jnp.int32)
    rr = jnp.clip(py[:, None] + jj[None, :], 0, lh - 1)
    hk = rr // g
    gw = vol.shape[2]
    rows = jnp.take_along_axis(vol, hk[:, :, None].astype(jnp.int32), axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, gw), 2)
    bands = rows.astype(jnp.float32) * (lane // lw == (rr % g)[:, :, None])
    patch = jnp.einsum(
        "nsw,ncw->nsc", bands.astype(vol.dtype), Cb, preferred_element_type=jnp.float32
    )
    out = _row_bilinear(patch, py[:, None] + jj[None, :], wy, lh)
    return out.swapaxes(1, 2).reshape(BN, H8, W8, S9 * S9)


def v4(vols, metas, flow):
    return jnp.concatenate(
        [v4_level(v, m, flow, l) for l, (v, m) in enumerate(zip(vols, metas))], -1
    )


def v5_level(vol, meta, flow, lvl, Q=14):
    lh, lw, g, nh = meta
    px, py, wx, wy = coords(flow, lvl)
    _, pk, yraw, Cb = _folded_selects(px, py, wx, wy, lh, lw, g, nh, vol.dtype)
    jj = jnp.arange(SIDE, dtype=jnp.int32)
    rr = jnp.clip(py[:, None] + jj[None, :], 0, lh - 1)
    hk = rr // g
    gw = vol.shape[2]
    rows = jnp.take_along_axis(vol, hk[:, :, None].astype(jnp.int32), axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, gw), 2)
    bands = rows.astype(jnp.float32) * (lane // lw == (rr % g)[:, :, None])
    bands = _row_bilinear(bands, yraw, wy, lh)         # [N, S9, gw]
    nb = N // Q
    A = bands.astype(vol.dtype).reshape(nb, Q * S9, gw)
    C = Cb.reshape(nb, Q * S9, gw)
    big = jnp.einsum("nag,nbg->nab", A, C, preferred_element_type=jnp.float32)
    big = big.reshape(nb, Q, S9, Q, S9)
    diag = jnp.einsum("nqyqx->nqyx", big)
    return diag.reshape(N, S9, S9).swapaxes(1, 2).reshape(BN, H8, W8, S9 * S9)


def v5(vols, metas, flow):
    return jnp.concatenate(
        [v5_level(v, m, flow, l) for l, (v, m) in enumerate(zip(vols, metas))], -1
    )


def main():
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    key = jax.random.PRNGKey(0)
    vols, metas = make_pyramid(key)
    flow0 = jax.random.normal(jax.random.PRNGKey(1), (BN, H8, W8, 2)) * 3.0

    variants = {"v1": v1, "v2": v2, "v3": v3, "v4": v4, "v5": v5}
    only = os.environ.get("VARIANTS")
    for name, fn in variants.items():
        if only and name not in only.split(","):
            continue

        def run12(vols, flow, fn=fn):
            def body(f, _):
                o = fn(vols, metas, flow)
                return f + jnp.mean(o, -1, keepdims=True) * 1e-6, None

            out, _ = jax.lax.scan(body, flow, None, length=12)
            return jnp.mean(jnp.abs(out)).astype(jnp.float32)

        try:
            t = timeit(jax.jit(run12), vols, flow0)
            print(f"{name}: {t:.4f}s / 12 iters (1 dir)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

    # numerics cross-check (v1 as oracle)
    o1 = jax.jit(lambda v, f: v1(v, metas, f))(vols, flow0)
    for name, fn in variants.items():
        if name == "v1" or (only and name not in only.split(",")):
            continue
        o = jax.jit(lambda v, f, fn=fn: fn(v, metas, f))(vols, flow0)
        err = float(jnp.max(jnp.abs(o - o1)))
        print(f"{name} max|err| vs v1: {err:.5f}", flush=True)


if __name__ == "__main__" and not os.environ.get("SIM_MODEL"):
    main()


def sim_model():
    """Reproduce the in-model regime: volumes for BOTH directions built
    inside the jit from feature maps, then a 12-iteration scan of v1
    lookups — isolates the HBM-pressure compression effect."""
    from tpuflow.core.corr import DenseCorrPyramid

    key = jax.random.PRNGKey(0)
    f1 = jax.random.normal(key, (BN, H8, W8, 256), jnp.bfloat16)
    f2 = jax.random.normal(jax.random.PRNGKey(2), (BN, H8, W8, 256), jnp.bfloat16)
    flow0 = jax.random.normal(jax.random.PRNGKey(1), (BN, H8, W8, 2)) * 3.0

    def run12(f1, f2, flow):
        cf = DenseCorrPyramid.build(f1, f2, 4)
        cb = DenseCorrPyramid.build(f2, f1, 4)

        def body(f, _):
            a = cf.lookup(f, R)
            b_ = cb.lookup(f, R)
            return f + jnp.mean(a, -1, keepdims=True) * 1e-6 + jnp.mean(b_, -1, keepdims=True) * 1e-6, None

        out, _ = jax.lax.scan(body, flow, None, length=12)
        return jnp.mean(jnp.abs(out)).astype(jnp.float32)

    t = timeit(jax.jit(run12), f1, f2, flow0)
    print(f"sim-model (2-dir build-inside + scan): {t:.4f}s / 12 iters", flush=True)


if os.environ.get("SIM_MODEL"):
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
        )
    except Exception:
        pass
    sim_model()
    sys.exit(0)
