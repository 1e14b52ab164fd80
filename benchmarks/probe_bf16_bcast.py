#!/usr/bin/env python3
"""Mosaic probe: which forms of 'compare a bf16 lane-vector broadcast
across sublanes' compile?  (The i32 form compiles; the bf16 form hit
'Invalid relayout: ... replicated in destination' on v5e.)

V=direct   mask = (mat == vec[None, :])
V=bcast    mask = (mat == jnp.broadcast_to(vec2d, mat.shape))
V=arith    mask = relu(1 - |mat - vec[None, :]|)   (integer-exact)
V=matmul   vecmat = ones[[n],1] @ vec[1,m] (K=1 MXU replicate), compare 2D
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, M = 128, 256


def kernel(v_ref, x_ref, o_ref, *, variant):
    iota = jax.lax.broadcasted_iota(jnp.int32, (N, M), 1).astype(jnp.bfloat16)
    if variant == "direct":
        vec = v_ref[0, 0, :]
        mask = (iota == vec[None, :]).astype(jnp.bfloat16)
    elif variant == "bcast":
        vec2d = v_ref[0, 0:1, :]
        mask = (iota == jnp.broadcast_to(vec2d, (N, M))).astype(jnp.bfloat16)
    elif variant == "arith":
        vec = v_ref[0, 0, :]
        d = jnp.abs(iota - vec[None, :])
        mask = jnp.maximum(jnp.asarray(1.0, jnp.bfloat16) - d, 0)
    elif variant == "matmul":
        ones = jnp.ones((1, N), jnp.bfloat16)
        vm = jax.lax.dot_general(
            ones, v_ref[0, 0:1, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        mask = (iota == vm).astype(jnp.bfloat16)
    o_ref[0] = jax.lax.dot_general(
        mask, x_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


def main():
    v = jnp.asarray(np.arange(M) % 7, jnp.bfloat16).reshape(1, 1, M)
    v = jnp.broadcast_to(v, (1, 16, M))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, M, 128)),
                    jnp.bfloat16)
    for variant in ("direct", "bcast", "arith", "matmul"):
        try:
            out = pl.pallas_call(
                functools.partial(kernel, variant=variant),
                out_shape=jax.ShapeDtypeStruct((1, N, 128), jnp.bfloat16),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(v, x)
            print(f"{variant}: OK sum={float(jnp.sum(out.astype(jnp.float32))):.2f}",
                  flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"{variant}: FAIL {msg}", flush=True)


if __name__ == "__main__":
    main()
