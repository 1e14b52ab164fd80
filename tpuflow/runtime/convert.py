"""PyTorch checkpoint -> JAX params conversion.

The reference loads `.pth` checkpoints with DataParallel-prefix stripping
(videoflow_core.py:104-110; MemFlow via cfg.restore_ckpt,
memflow_loader.py:53).  This module provides:

- `load_torch_state_dict`: read a .pth into numpy arrays (torch is a
  CPU-only, offline dependency here), stripping `module.` prefixes.
- Layout converters: torch conv OIHW -> flax HWIO, linear [out,in] ->
  [in,out], per-channel norm params passthrough.
- `map_state_dict_to_params`: fill a flax param tree from a flat torch
  dict via a name-mapping function + shape check, reporting
  matched/missing keys.  Exact upstream name tables require the real
  checkpoints (absent from the snapshot — .MISSING_LARGE_BLOBS); the
  mapping function is pluggable so the table can be finalized against a
  live checkpoint without touching the machinery.
- `params_to_torch_style` (inverse) used to round-trip-test the machinery.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Optional, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    if any(k.startswith("module.") for k in ckpt):
        ckpt = {k.replace("module.", "", 1): v for k, v in ckpt.items()}
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in ckpt.items()}


def torch_conv_to_flax(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def flax_conv_to_torch(w: np.ndarray) -> np.ndarray:
    """HWIO -> OIHW."""
    return np.transpose(w, (3, 2, 0, 1))


def torch_linear_to_flax(w: np.ndarray) -> np.ndarray:
    """[out, in] -> [in, out]."""
    return np.transpose(w)


def flatten_params(params, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(params, dict):
        for k, v in params.items():
            out.update(flatten_params(v, f"{prefix}/{k}" if prefix else k))
    else:
        out[prefix] = np.asarray(params)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]):
    tree: Dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def params_to_torch_style(params) -> Dict[str, np.ndarray]:
    """Inverse mapping (testing aid): flax tree -> torch-style flat dict
    with torch layouts and dotted names (kernel->weight, scale->weight)."""
    flat = flatten_params(params)
    out = {}
    for key, val in flat.items():
        parts = key.split("/")
        leaf = parts[-1]
        name = ".".join(parts[:-1])
        if leaf == "kernel":
            if val.ndim == 4:
                out[f"{name}.weight"] = flax_conv_to_torch(val)
            else:
                out[f"{name}.weight"] = np.transpose(val)
        elif leaf == "scale":
            out[f"{name}.weight"] = val
        elif leaf == "bias":
            out[f"{name}.bias"] = val
        else:
            out[f"{name}.{leaf}" if name else leaf] = val
    return out


def default_name_map(torch_key: str) -> Tuple[str, str]:
    """torch dotted name -> (flax path prefix, leaf kind).

    leaf kind: 'kernel' (conv/linear weight), 'scale' (norm weight),
    'bias', or 'raw'."""
    if torch_key.endswith(".weight"):
        return torch_key[: -len(".weight")].replace(".", "/"), "weight"
    if torch_key.endswith(".bias"):
        return torch_key[: -len(".bias")].replace(".", "/"), "bias"
    return torch_key.replace(".", "/"), "raw"


# ---------------------------------------------------------------------------
# VideoFlow (MOF/BOF) name table
# ---------------------------------------------------------------------------
# Upstream checkpoint layout: MOFNet attributes fnet/cnet (twins_svt_large
# wrapper with an inner `.svt`), att (GMA Attention), update_block
# (SKUpdateBlock6_Deep_nopoolres_AllDecoder2) — loaded by the reference at
# videoflow_core.py:101-110 after `module.` stripping.  The flax tree
# mirrors these names (core/mofnet.py, core/sk.py, core/gma.py,
# core/encoders.py); what remains is the mechanical dotted->slashed
# rewrite plus indexed-submodule flattening below.

# Checkpoint tensors that have no counterpart in the inference net, by
# design (counted separately, not as conversion failures):
VIDEOFLOW_IGNORE = (
    r"^(fnet|cnet)\.svt\.(blocks|patch_embeds|pos_block|pos_drops)\.[23]\.",  # twins stages 3-4 (unused: forward stops at layer=2)
    r"^(fnet|cnet)\.svt\.(head|norm)\.",       # classifier head
    r"^att\.pos_emb\.",                        # RelPosEmb (position_only=False config: content-only attention)
    r"\.num_batches_tracked$",
    r"^update_block\.aggregator\.pos_emb\.",
)


def _rewrite_videoflow_key(k: str) -> str:
    """Dotted torch module path -> dotted path matching the flax tree."""
    k = re.sub(r"^(fnet|cnet)\.svt\.", r"\1.", k)
    k = re.sub(r"\.patch_embeds\.(\d+)\.", r".patch_embeds_\1.", k)
    k = re.sub(r"\.pos_block\.(\d+)\.proj\.0\.", r".pos_block_\1.proj_0.", k)
    k = re.sub(r"\.blocks\.(\d+)\.(\d+)\.", r".blocks_\1_\2.", k)
    k = re.sub(r"\.conv_list\.(\d+)\.", r".conv_list_\1.", k)
    k = re.sub(r"\.(ffn1|ffn2)\.(\d+)\.", r".\1_\2.", k)
    k = re.sub(r"\.mask\.(\d+)\.", r".mask_\1.", k)
    k = re.sub(r"\.layer(\d+)\.(\d+)\.", r".layer\1_\2.", k)  # BasicEncoder
    # The update block lives inside the scanned iteration module.
    k = re.sub(r"^update_block\.", "iteration.update_block.", k)
    return k


def videoflow_name_map(torch_key: str) -> Tuple[str, str]:
    """Name map for MOF/BOF `.pth` state dicts (see module docstring)."""
    k = _rewrite_videoflow_key(torch_key)
    if k.endswith(".init_hidden_state"):
        # Channel-vector learned init: torch channels-second, flax last.
        return k.replace(".", "/"), "learned_init"
    return default_name_map(k)


def map_state_dict_to_params(
    state_dict: Dict[str, np.ndarray],
    params,
    name_map: Callable[[str], Tuple[str, str]] = default_name_map,
    strict: bool = False,
):
    """Fill the flax tree from a torch state dict.

    Weights are layout-converted by rank (4D conv OIHW->HWIO, 2D linear
    transpose); 'weight' resolves to 'kernel' or 'scale' depending on
    which leaf exists at the target path.  Mapped paths resolve with or
    without the tree's top-level scope (flax init trees root at
    'params/'; torch state dicts do not).  Returns (new_params, report)."""
    flat = flatten_params(params)
    new_flat = dict(flat)
    matched, missing = [], []

    # Top-level scopes of the target tree ('params', 'batch_stats', ...):
    # name maps may emit scope-free paths.
    roots = {k.split("/")[0] for k in flat}

    def resolve(key: str) -> Optional[str]:
        if key in flat:
            return key
        for r in roots:
            if f"{r}/{key}" in flat:
                return f"{r}/{key}"
        return None

    for tkey, tval in state_dict.items():
        path, kind = name_map(tkey)
        if kind == "weight":
            for leaf, conv in (
                ("kernel", None),
                ("scale", None),
            ):
                fkey = resolve(f"{path}/{leaf}")
                if fkey is not None:
                    if leaf == "kernel" and tval.ndim == 4:
                        val = torch_conv_to_flax(tval)
                    elif leaf == "kernel" and tval.ndim == 2:
                        val = torch_linear_to_flax(tval)
                    else:
                        val = tval
                    if val.shape != flat[fkey].shape:
                        missing.append((tkey, f"shape {val.shape} vs {flat[fkey].shape}"))
                        break
                    new_flat[fkey] = val.astype(flat[fkey].dtype)
                    matched.append(tkey)
                    break
            else:
                missing.append((tkey, "no kernel/scale leaf"))
        elif kind == "learned_init":
            # Channel-vector learned init (all other dims are 1): torch
            # stores it channels-second (e.g. (1, 1, C, 1, 1)), flax
            # channels-last — a reshape is the exact mapping.
            fkey = resolve(path)
            if fkey is not None and flat[fkey].size == tval.size:
                new_flat[fkey] = tval.reshape(flat[fkey].shape).astype(flat[fkey].dtype)
                matched.append(tkey)
            else:
                missing.append((tkey, "not found" if fkey is None else "size"))
        else:
            fkey = resolve(f"{path}/{kind}" if kind != "raw" else path)
            if fkey is not None and flat[fkey].shape == tval.shape:
                new_flat[fkey] = tval.astype(flat[fkey].dtype)
                matched.append(tkey)
            else:
                missing.append((tkey, "not found" if fkey is None else "shape"))

    report = {
        "matched": len(matched),
        "unmatched": missing,
        "total_torch": len(state_dict),
        "total_flax": len(flat),
    }
    if strict and missing:
        raise ValueError(f"Unmatched checkpoint keys: {missing[:10]} (+{len(missing)-10 if len(missing)>10 else 0})")
    return unflatten_params(new_flat), report


def describe_state_dict(state_dict: Dict[str, np.ndarray], max_rows: int = 0) -> str:
    """Human-readable shape report of a torch state dict, grouped by the
    first name component — the converter doubles as an architecture-spec
    extractor for the checkpoint-only upstream nets (SURVEY §7.3 item 1)."""
    groups: Dict[str, list] = {}
    for k, v in state_dict.items():
        groups.setdefault(k.split(".")[0], []).append((k, tuple(v.shape)))
    lines = []
    total = 0
    for g in sorted(groups):
        n_params = sum(int(np.prod(s)) for _, s in groups[g])
        total += n_params
        lines.append(f"[{g}] {len(groups[g])} tensors, {n_params / 1e6:.2f}M params")
        rows = groups[g] if not max_rows else groups[g][:max_rows]
        for k, s in rows:
            lines.append(f"  {k:<60} {s}")
    lines.append(f"TOTAL: {total / 1e6:.2f}M params, {len(state_dict)} tensors")
    return "\n".join(lines)


def suggest_mapping(
    state_dict: Dict[str, np.ndarray], params
) -> Dict[str, Optional[str]]:
    """Greedy shape-based mapping proposal: torch key -> flax path.

    Each torch tensor is matched to an unclaimed flax leaf whose
    (layout-converted) shape matches, preferring candidates that share
    name tokens.  A starting point for hand-finishing the exact table
    against a live checkpoint — NOT used for automatic loading."""
    flat = flatten_params(params)
    claimed = set()
    out: Dict[str, Optional[str]] = {}

    def tokens(s: str) -> set:
        return set(s.replace(".", "/").replace("_", "/").lower().split("/"))

    for tkey, tval in state_dict.items():
        shapes = {tuple(tval.shape)}
        if tval.ndim == 4:
            shapes.add(torch_conv_to_flax(tval).shape)
        if tval.ndim == 2:
            shapes.add(tuple(reversed(tval.shape)))
        candidates = [
            fk for fk, fv in flat.items()
            if fk not in claimed and tuple(fv.shape) in shapes
        ]
        if not candidates:
            out[tkey] = None
            continue
        tk = tokens(tkey)
        best = max(candidates, key=lambda fk: len(tk & tokens(fk)))
        claimed.add(best)
        out[tkey] = best
    return out


def load_torch_checkpoint_as_params(path: str, engine, min_match: float = 0.95) -> Dict:
    """Engine hook: torch .pth -> engine's param tree.

    Hard-fails when fewer than `min_match` of the checkpoint tensors map
    into the param tree — a low match rate means the model would silently
    run on (mostly) random weights while reporting the checkpoint as
    loaded.  Tensors matching the model family's IGNORE patterns
    (deliberately unused by inference, e.g. twins stages 3-4) are dropped
    from the denominator but listed in the report."""
    state_dict = load_torch_state_dict(path)
    if engine.config.model == "memflow":
        try:
            from .convert_memflow import MEMFLOW_IGNORE as ignore
            from .convert_memflow import memflow_name_map as name_map
        except ImportError:  # MemFlow table ships separately
            name_map, ignore = default_name_map, ()
    else:
        name_map, ignore = videoflow_name_map, VIDEOFLOW_IGNORE
    ignored = {k for k in state_dict if any(re.search(p, k) for p in ignore)}
    state_dict = {k: v for k, v in state_dict.items() if k not in ignored}
    params = engine.init_params()
    new_params, report = map_state_dict_to_params(state_dict, params, name_map)
    report["ignored"] = len(ignored)
    if ignored:
        print(f"[convert] {len(ignored)} checkpoint tensors unused by inference (by design)")
    rate = report["matched"] / max(1, report["total_torch"])
    print(
        f"[convert] {report['matched']}/{report['total_torch']} checkpoint "
        f"tensors mapped into {report['total_flax']} param leaves"
    )
    if rate < min_match:
        raise ValueError(
            f"Checkpoint conversion matched only {report['matched']}/"
            f"{report['total_torch']} tensors ({rate:.1%} < {min_match:.0%}) "
            f"for {path}. First unmatched: {report['unmatched'][:5]}. "
            "Refusing to run on partially-random weights."
        )
    if report["unmatched"]:
        print(f"[convert] unmatched (within tolerance): {report['unmatched'][:5]}")
    return new_params
