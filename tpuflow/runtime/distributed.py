"""Multi-host distributed execution (SURVEY §5.8's plan, item c).

The reference is single-process/single-GPU; its only inter-process
transport is pickle temp files for MemFlow isolation
(memflow_loader.py:65-66).  The tpu-native equivalent scales over hosts
with JAX's distributed runtime:

- `init_distributed` wraps `jax.distributed.initialize` (coordinator +
  process id/count, from args or the standard env vars), turning
  `jax.devices()` into the GLOBAL device list so `make_mesh` spans hosts
  and `jit` inserts cross-host collectives over ICI/DCN automatically.
- `host_frame_range` / `host_window_range` give each host its own
  contiguous frame slice of the video (host-LOCAL decode: no host ships
  pixels to another; the only cross-host traffic is whatever collective
  the model itself needs, which for DP inference is none).
- `gather_host_results` is the result path: flows computed on a host
  stay on that host; rank 0 needs only completion flags, which ride a
  tiny `psum` — consistent with the cache-directory layout where each
  host writes its own disjoint `.flo` range (pipeline/cache.py).

Tested with real multi-process CPU JAX (two spawned processes, one
device each, 2-device global mesh) in tests/test_distributed.py — the
same code path a TPU pod slice takes, minus the ICI.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Tuple[int, ...]] = None,
) -> bool:
    """Initialize the JAX distributed runtime; returns True if multi-
    process mode is active.

    Args may come from the environment (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID — the names jax.distributed itself
    honors) — explicit args win.  Single-process (num_processes absent
    or 1) is a no-op: the default local runtime is already correct.
    """
    num_processes = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "1")
    )
    if num_processes <= 1:
        if coordinator_address is not None or process_id not in (None, 0):
            # A coordinator/rank without a process count means a
            # mis-launched pod: silently running single-host would have
            # EVERY host compute the full video and race on the cache.
            raise ValueError(
                "init_distributed: coordinator_address/process_id given "
                f"but num_processes={num_processes} — set num_processes "
                "(or JAX_NUM_PROCESSES) to the pod size"
            )
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=list(local_device_ids) if local_device_ids else None,
    )
    return True


def host_frame_range(
    total_frames: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> Tuple[int, int]:
    """This host's contiguous [lo, hi) slice of the video's frames.

    Remainder frames go to the leading hosts (sizes differ by at most
    one); every frame belongs to exactly one host.
    """
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    if not 0 <= p < n:
        raise ValueError(f"process_index {p} out of range for {n} processes")
    base, rem = divmod(total_frames, n)
    lo = p * base + min(p, rem)
    hi = lo + base + (1 if p < rem else 0)
    return lo, hi


def host_window_range(
    total_frames: int,
    sequence_length: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    context: Optional[Tuple[int, int]] = None,
) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """((decode_lo, decode_hi), (out_lo, out_hi)) for stride-1 window
    inference: the host OWNS output flows [out_lo, out_hi) but must
    DECODE surrounding context too — decode stays host-local, outputs
    stay disjoint.

    `context` overrides the (left, right) context frame counts; default
    is seq//2 each side (the centered-window need).  MemFlow streams
    pass a LARGER left context (the memory warm-up prefix,
    FlowPipeline.compute_flows_distributed): the memory ring carries
    state from the video start, so a host must replay enough preceding
    frames for its first owned output's memory to converge to the
    single-host stream's.
    """
    out_lo, out_hi = host_frame_range(total_frames, process_index, process_count)
    half = sequence_length // 2
    left, right = context if context is not None else (half, half)
    dec_lo = max(0, out_lo - left)
    dec_hi = min(total_frames, out_hi + right)
    return (dec_lo, dec_hi), (out_lo, out_hi)


def gather_host_results(local_done: int) -> int:
    """Total completed frames across hosts (one scalar allreduce).

    Flow tensors never cross hosts — each host persists its own range to
    the shared cache directory; only this completion count is exchanged.
    """
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import numpy as np

    devs = np.asarray(jax.devices())
    mesh = Mesh(devs, ("hosts",))
    n = len(devs)

    # One value per device (this host's devices carry local_done on the
    # first local device, zero elsewhere) -> global sum.
    local = np.zeros((len(jax.local_devices()),), np.int32)
    local[0] = local_done
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("hosts")), local, (n,)
    )
    total = jax.jit(
        jnp.sum, out_shardings=NamedSharding(mesh, P())
    )(arr)
    return int(total)
