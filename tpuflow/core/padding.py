"""Pad-to-multiple utilities (the reference's InputPadder contract).

The upstream nets require H, W divisible by 8 (RAFT-family 1/8-resolution
feature grids); the reference pads with replicate mode and crops the output
back (used at videoflow_core.py:182-191, memflow_inference_isolated.py:87-89).

JAX needs static shapes under jit, so padding doubles as shape bucketing:
`pad_to_bucket` rounds H, W up to a configurable quantum (default 64) so a
small set of compiled shapes covers arbitrary video sizes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def pad_dims(ht: int, wd: int, multiple: int = 8, mode: str = "sintel") -> Tuple[int, int, int, int]:
    """Compute (pad_top, pad_bottom, pad_left, pad_right).

    'sintel' mode splits padding evenly top/bottom; other modes put all
    height padding on top (RAFT InputPadder semantics)."""
    pad_ht = (((ht // multiple) + 1) * multiple - ht) % multiple
    pad_wd = (((wd // multiple) + 1) * multiple - wd) % multiple
    if mode == "sintel":
        return pad_ht // 2, pad_ht - pad_ht // 2, pad_wd // 2, pad_wd - pad_wd // 2
    return pad_ht, 0, pad_wd // 2, pad_wd - pad_wd // 2


class InputPadder:
    """Pads [..., H, W] images to a multiple of `multiple` with replicate
    edges; `unpad` crops back.  Shape-compatible with the reference's
    upstream InputPadder (SURVEY §2.2)."""

    def __init__(self, dims: Sequence[int], multiple: int = 8, mode: str = "sintel"):
        self.ht, self.wd = int(dims[-2]), int(dims[-1])
        self.pt, self.pb, self.pl, self.pr = pad_dims(self.ht, self.wd, multiple, mode)

    @property
    def padded_shape(self) -> Tuple[int, int]:
        return self.ht + self.pt + self.pb, self.wd + self.pl + self.pr

    def pad(self, *inputs):
        out = []
        for x in inputs:
            pad_width = [(0, 0)] * (x.ndim - 2) + [(self.pt, self.pb), (self.pl, self.pr)]
            out.append(jnp.pad(x, pad_width, mode="edge"))
        return out[0] if len(out) == 1 else out

    def unpad(self, x):
        return x[..., self.pt : self.pt + self.ht, self.pl : self.pl + self.wd]


def bucket_shape(ht: int, wd: int, quantum: int = 64) -> Tuple[int, int]:
    """Round (H, W) up to the bucket quantum. Keeps the set of jit-compiled
    shapes small across videos (SURVEY §7.3 item 3)."""
    bh = int(np.ceil(ht / quantum)) * quantum
    bw = int(np.ceil(wd / quantum)) * quantum
    return bh, bw
