#!/usr/bin/env python3
"""Environment smoke test: device visibility + matmul sanity
(the reference's check_cuda.py:1-17, TPU edition)."""

import jax
import jax.numpy as jnp

print(f"JAX version: {jax.__version__}")
devices = jax.devices()
print(f"Devices: {devices}")
print(f"Default backend: {jax.default_backend()}")

for d in devices:
    try:
        stats = d.memory_stats()
        if stats and stats.get("bytes_limit"):
            print(
                f"  {d}: {stats.get('bytes_in_use', 0) / 1024**2:.0f}"
                f" / {stats['bytes_limit'] / 1024**2:.0f} MB HBM"
            )
    except Exception:
        pass

x = jnp.ones((1024, 1024), jnp.bfloat16)
y = (x @ x).block_until_ready()
print(f"matmul OK: {y.shape} {y.dtype}, sum={float(jnp.sum(y.astype(jnp.float32))):.0f}")
