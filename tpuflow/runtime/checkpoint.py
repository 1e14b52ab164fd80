"""Native JAX checkpoint format (msgpack) for converted weights.

The reference only ever loads torch `.pth` files (videoflow_core.py:
104-110, memflow_loader.py:53).  tpuflow adds a NATIVE format so the
(torch-dependent, name-table-mediated) conversion runs once:

    params = load_torch_checkpoint_as_params("MOF_sintel.pth", engine)
    save_params("MOF_sintel.msgpack", params)
    # later / on hosts without torch:
    engine.load_model("MOF_sintel.msgpack")

Format: the raw byte magic b"tpuflow-params-v1\\n" followed by the
flax.serialization msgpack of the param pytree — a truncated or foreign
file fails loudly on the magic check instead of deserializing garbage.
SURVEY §5.4 (checkpoint/resume): this complements the per-frame flow
cache (data-side resume) with a model-side native checkpoint.
"""

from __future__ import annotations

import os
from typing import Any

from flax import serialization

_MAGIC = b"tpuflow-params-v1\n"

NATIVE_SUFFIXES = (".msgpack", ".tpuflow")


def is_native_checkpoint(path: str) -> bool:
    return os.path.splitext(path)[1].lower() in NATIVE_SUFFIXES


def save_params(path: str, params: Any) -> None:
    """Serialize a param pytree (atomic write: temp file + rename)."""
    blob = _MAGIC + serialization.to_bytes(params)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_params(path: str, target: Any) -> Any:
    """Deserialize into the structure of `target` (an initialized param
    tree — shapes/dtypes are validated leaf-by-leaf by flax)."""
    with open(path, "rb") as f:
        blob = f.read()
    if not blob.startswith(_MAGIC):
        raise ValueError(
            f"{path} is not a tpuflow native checkpoint (bad header); "
            "torch .pth files go through runtime/convert.py instead"
        )
    return serialization.from_bytes(target, blob[len(_MAGIC):])


def main(argv=None) -> int:
    """One-shot conversion: torch .pth -> native checkpoint.

    python -m tpuflow.runtime.checkpoint IN.pth OUT.msgpack \
        [--model videoflow|memflow] [--architecture mof|bof]
        [--encoder twins|cnn] [--stage sintel|things|kitti]
    """
    import argparse

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--model", default="videoflow", choices=["videoflow", "memflow"])
    p.add_argument("--architecture", default="mof", choices=["mof", "bof"])
    p.add_argument("--encoder", default="twins", choices=["twins", "cnn"])
    p.add_argument("--stage", default="sintel", choices=["sintel", "things", "kitti"])
    args = p.parse_args(argv)
    if not is_native_checkpoint(args.dst):
        p.error(
            f"dst must end in one of {NATIVE_SUFFIXES} — engine.load_model "
            "routes by suffix, so any other extension would be (mis)read "
            "as a torch checkpoint later"
        )

    from ..config import ModelConfig, memflow_stage_cfg
    from .engine import FlowEngine

    kw = {}
    if args.model == "memflow":
        kw.update(memflow_stage_cfg(args.stage))
    cfg = ModelConfig(
        model=args.model, architecture=args.architecture,
        encoder=args.encoder, stage=args.stage, **kw,
    )
    engine = FlowEngine(cfg)
    loaded = engine.load_model(args.src)
    save_params(args.dst, engine.params)
    print(f"converted {loaded} -> {args.dst}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
