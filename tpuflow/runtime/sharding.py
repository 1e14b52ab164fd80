"""Device-mesh sharding: DP over frames/windows/tiles, spatial sharding.

The reference is strictly single-process single-GPU with no collectives
(SURVEY §2.4, §5.8).  This module is the capability the rebuild adds:

- `make_mesh`: 1D/2D meshes over available devices ('data' for
  frame/window/tile batches, 'spatial' for intra-frame sharding).
- `shard_batch_forward`: jit a window->flow forward with the batch axis
  sharded over 'data'; XLA inserts zero collectives in steady state
  (each device computes disjoint frames — the embarrassingly-parallel
  structure SURVEY §3.1 notes).
- `train_step`: supervised EPE training step (grads psum over 'data' via
  jit+sharding), exercised by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Tuple[str, ...] = ("data",)
) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if len(axis_names) == 1:
        return Mesh(devices, axis_names)
    # 2D mesh: put the larger factor on 'data'.
    d = int(np.floor(np.sqrt(n)))
    while n % d:
        d -= 1
    return Mesh(devices.reshape(n // d, d), axis_names)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard dim 0 over `axis`, replicate the rest."""
    spec = [axis] + [None] * (ndim - 1)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_forward(fn, mesh: Mesh, batch_ndim: int):
    """jit `fn(params, batch)` with batch dim 0 sharded over 'data' and
    params replicated.  Per-device compute is independent — collectives
    appear only if fn itself reduces across the batch."""
    return jax.jit(
        fn,
        in_shardings=(replicated(mesh), batch_sharding(mesh, batch_ndim)),
        out_shardings=batch_sharding(mesh, batch_ndim),
    )


def spatial_sharding(mesh: Mesh, ndim: int, h_axis: int) -> NamedSharding:
    """Shard a spatial (height) dim over 'spatial', dim 0 over 'data'."""
    spec = [None] * ndim
    spec[0] = "data"
    spec[h_axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def shard_spatial_forward(fn, mesh: Mesh, batch_ndim: int, h_axis: int):
    """jit `fn(params, frames)` with frames' HEIGHT dim sharded over
    'spatial' (and dim 0 over 'data') — SPMD spatial partitioning of ONE
    frame across devices (SURVEY §5.8b's latency-oriented mode).

    Unlike DP (embarrassingly parallel), this makes XLA insert real
    collectives: convolution halo exchanges at shard edges and
    all-gathers for the all-pairs correlation contraction (each query
    row correlates with the WHOLE target plane) — all riding ICI on
    hardware.  Numerics match the unsharded forward (SPMD partitioning
    is value-preserving; float reassociation only).
    """
    return jax.jit(
        fn,
        in_shardings=(
            replicated(mesh),
            spatial_sharding(mesh, batch_ndim, h_axis),
        ),
        out_shardings=replicated(mesh),
    )


# ---------------------------------------------------------------------------
# Training (supervised EPE), DP-sharded
# ---------------------------------------------------------------------------
def epe_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean end-point error."""
    return jnp.mean(jnp.sqrt(jnp.sum((pred - target) ** 2, axis=-1) + 1e-8))


def make_train_step(model, optimizer: optax.GradientTransformation):
    """Returns train_step(params, opt_state, windows, target_flows) ->
    (params, opt_state, loss).  Data-parallel when jitted with the batch
    sharded: jax.grad's mean over batch inserts the psum."""

    def loss_fn(params, windows, targets):
        fwd_flows, bwd_flows = model.apply(params, windows)
        n = fwd_flows.shape[1]
        pred = fwd_flows[:, n // 2]
        return epe_loss(pred, targets)

    def train_step(params, opt_state, windows, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, windows, targets)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def shard_train_step(train_step, mesh: Mesh):
    """jit the train step over the mesh: params/opt-state replicated,
    batch inputs sharded over 'data'."""
    repl = replicated(mesh)
    data5 = batch_sharding(mesh, 5)  # windows [B, T, H, W, 3]
    data4 = batch_sharding(mesh, 4)  # targets [B, H, W, 2]
    return jax.jit(
        train_step,
        in_shardings=(repl, repl, data5, data4),
        out_shardings=(repl, repl, repl),
    )
