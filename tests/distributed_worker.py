"""Worker for tests/test_distributed.py: one process of a 2-process CPU
JAX distributed run.  Not a pytest module (no test_ prefix).

argv: coordinator_address num_processes process_id total_frames seq_len out_json
"""

import json
import os
import sys


def main():
    coord, nproc, pid, total, seq, out_path = sys.argv[1:7]
    nproc, pid, total, seq = int(nproc), int(pid), int(total), int(seq)

    # Force the host CPU backend BEFORE touching devices (the dev-harness
    # sitecustomize force-registers the TPU plugin; see tests/conftest.py).
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tpuflow.runtime.distributed import (
        gather_host_results,
        host_window_range,
        init_distributed,
    )

    active = init_distributed(coord, nproc, pid)
    assert active, "init_distributed returned False for a 2-process run"
    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc  # global device view

    (dec_lo, dec_hi), (out_lo, out_hi) = host_window_range(total, seq)

    # "Decode" only the host-local range and "compute" its output count.
    local_frames = list(range(dec_lo, dec_hi))
    assert out_lo >= dec_lo and out_hi <= dec_hi
    local_done = out_hi - out_lo

    total_done = gather_host_results(local_done)

    with open(out_path, "w") as f:
        json.dump(
            {
                "process_id": pid,
                "decode": [dec_lo, dec_hi],
                "out": [out_lo, out_hi],
                "decoded_n": len(local_frames),
                "total_done": total_done,
                "global_devices": len(jax.devices()),
            },
            f,
        )
    print("worker", pid, "ok", flush=True)


if __name__ == "__main__":
    main()
