"""Tile-mode machinery: grid math, batched extraction, paste/blend.

Grid layout parity with videoflow_processor.py:73-110 — fixed square
tiles (default 1280), row-major, edge tiles shrink, no overlap, and the
paste is a hard overwrite (videoflow_processor.py:277).

TPU-first difference (SURVEY §7.4): tiles become a *batch axis* — all
tiles of a window are padded to the full tile size (edge-replicate, which
also feeds the model valid pixels instead of zeros) and stacked, so one
batched forward replaces the reference's per-tile Python loop.  Optional
`overlap` adds halo context and blends seams with a linear feather
(reference behavior = overlap 0).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np


@dataclass(frozen=True)
class TileInfo:
    x: int
    y: int
    width: int
    height: int
    col: int
    row: int


def calculate_tile_grid(
    width: int, height: int, tile_size: int = 1280
) -> Tuple[int, int, int, int, List[dict]]:
    """(tile_w, tile_h, cols, rows, tiles_info) with dict entries matching
    the reference's keys (videoflow_processor.py:73-110)."""
    cols = int(np.ceil(width / tile_size))
    rows = int(np.ceil(height / tile_size))
    tiles_info = []
    for row in range(rows):
        for col in range(cols):
            x = col * tile_size
            y = row * tile_size
            tiles_info.append(
                {
                    "x": x,
                    "y": y,
                    "width": min(tile_size, width - x),
                    "height": min(tile_size, height - y),
                    "col": col,
                    "row": row,
                }
            )
    return tile_size, tile_size, cols, rows, tiles_info


def extract_tile(frame: np.ndarray, tile_info: dict) -> np.ndarray:
    """Crop without padding (videoflow_processor.py:112-120)."""
    x, y = tile_info["x"], tile_info["y"]
    w, h = tile_info["width"], tile_info["height"]
    return frame[y : y + h, x : x + w]


def extract_tile_batch(
    frames: np.ndarray, tiles_info: List[dict], tile_size: int, overlap: int = 0
) -> np.ndarray:
    """Stack every tile of every window frame into one batch.

    frames: [T, H, W, C] (one window).  Returns
    [num_tiles, T, tile_size(+2*overlap), tile_size(+2*overlap), C] with
    edge-replicate padding for shrunken edge tiles / halos, so shapes are
    static regardless of grid position."""
    t, H, W, c = frames.shape
    size = tile_size + 2 * overlap
    out = np.empty((len(tiles_info), t, size, size, c), dtype=frames.dtype)
    for i, info in enumerate(tiles_info):
        x0 = info["x"] - overlap
        y0 = info["y"] - overlap
        x1 = info["x"] + tile_size + overlap
        y1 = info["y"] + tile_size + overlap
        sx0, sy0 = max(0, x0), max(0, y0)
        sx1, sy1 = min(W, x1), min(H, y1)
        crop = frames[:, sy0:sy1, sx0:sx1]
        pad = (
            (0, 0),
            (sy0 - y0, y1 - sy1),
            (sx0 - x0, x1 - sx1),
            (0, 0),
        )
        out[i] = np.pad(crop, pad, mode="edge")
    return out


def paste_tile_flows(
    tile_flows: np.ndarray,
    tiles_info: List[dict],
    width: int,
    height: int,
    tile_size: int,
    overlap: int = 0,
) -> np.ndarray:
    """Assemble per-tile flows [num_tiles, size, size, 2] into a full
    [H, W, 2] canvas.

    overlap == 0 reproduces the reference's hard paste
    (videoflow_processor.py:277).  With overlap > 0, halo regions blend
    with a linear feather weight so seams vanish."""
    if overlap == 0:
        full = np.zeros((height, width, 2), dtype=np.float32)
        for flow, info in zip(tile_flows, tiles_info):
            x, y, w, h = info["x"], info["y"], info["width"], info["height"]
            full[y : y + h, x : x + w] = flow[:h, :w]
        return full

    size = tile_size + 2 * overlap
    acc = np.zeros((height, width, 2), dtype=np.float32)
    wacc = np.zeros((height, width, 1), dtype=np.float32)

    ramp = np.minimum(np.arange(size) + 1, np.arange(size)[::-1] + 1).astype(np.float32)
    ramp = np.minimum(ramp, overlap + 1) / (overlap + 1)
    feather = ramp[:, None] * ramp[None, :]

    for flow, info in zip(tile_flows, tiles_info):
        x0 = info["x"] - overlap
        y0 = info["y"] - overlap
        # Valid region of this padded tile inside the canvas.
        sx0, sy0 = max(0, x0), max(0, y0)
        sx1 = min(width, info["x"] + info["width"] + overlap)
        sy1 = min(height, info["y"] + info["height"] + overlap)
        fy0, fx0 = sy0 - y0, sx0 - x0
        fy1, fx1 = fy0 + (sy1 - sy0), fx0 + (sx1 - sx0)
        wpatch = feather[fy0:fy1, fx0:fx1, None]
        acc[sy0:sy1, sx0:sx1] += flow[fy0:fy1, fx0:fx1] * wpatch
        wacc[sy0:sy1, sx0:sx1] += wpatch

    return acc / np.maximum(wacc, 1e-6)
