"""EPE parity vs reference-produced flow caches (SURVEY §7.3 item 7).

The driver's accuracy metric is "EPE delta vs reference cache" — golden
`.npz`/`.flo` flows produced by the CUDA reference.  Checkpoints are
absent from this snapshot, so parity can only be evaluated when BOTH are
provided:

  TPUFLOW_GOLDEN_CACHE   -> a `<video>_flow_cache_*` directory written by
                            the reference
  TPUFLOW_GOLDEN_VIDEO   -> the corresponding input video
  (optional) VideoFlow_ckpt/ / MemFlow_ckpt/ with the matching weights

When the env vars are unset these tests skip.  The cache-dir name encodes
every parameter needed to reproduce the run
(storage/filename_generator.py:151-213) — parsed here so the engine is
configured identically.
"""

import os
import re

import numpy as np
import pytest

GOLDEN_CACHE = os.environ.get("TPUFLOW_GOLDEN_CACHE")
GOLDEN_VIDEO = os.environ.get("TPUFLOW_GOLDEN_VIDEO")

pytestmark = pytest.mark.skipif(
    not (GOLDEN_CACHE and os.path.isdir(GOLDEN_CACHE) and GOLDEN_VIDEO and os.path.exists(GOLDEN_VIDEO or "")),
    reason="golden cache/video not provided (TPUFLOW_GOLDEN_CACHE / TPUFLOW_GOLDEN_VIDEO)",
)


def parse_cache_dir_name(name: str) -> dict:
    """Invert generate_cache_directory's naming
    (`{video}_flow_cache_{model...}_{seqL}_{startS}_{framesN}[_fast][_tile]`)."""
    m = re.search(
        r"_flow_cache_(?P<model>videoflow|memflow)_(?P<rest>.+?)_seq(?P<seq>\d+)"
        r"_start(?P<start>\d+)_frames(?P<frames>\d+)(?P<fast>_fast)?(?P<tile>_tile)?$",
        name,
    )
    if not m:
        raise ValueError(f"Unrecognized cache dir name: {name}")
    out = {
        "model": m.group("model"),
        "sequence_length": int(m.group("seq")),
        "start_frame": int(m.group("start")),
        "frames": int(m.group("frames")),
        "fast": bool(m.group("fast")),
        "tile": bool(m.group("tile")),
    }
    rest = m.group("rest").split("_")
    if out["model"] == "videoflow":
        out["architecture"], out["dataset"], out["variant"] = rest[0], rest[1], rest[2]
    else:
        out["dataset"] = rest[0]
    return out


def test_epe_vs_golden_cache(monkeypatch):
    from tpuflow.config import ModelConfig
    from tpuflow.pipeline.cache import FlowCacheManager
    from tpuflow.pipeline.video_io import FrameExtractor
    from tpuflow.runtime.engine import FlowEngine

    params = parse_cache_dir_name(os.path.basename(GOLDEN_CACHE.rstrip("/")))
    mgr = FlowCacheManager()
    n = params["frames"]
    ok, fmt, missing = mgr.check_cache_exists(GOLDEN_CACHE, n)
    if not ok:
        n = n - len(missing)
        assert n > 0, "golden cache empty"

    cfg = ModelConfig(
        model=params["model"],
        architecture=params.get("architecture", "mof"),
        dataset=params.get("dataset", "sintel"),
        variant=params.get("variant", "standard"),
        stage=params.get("dataset", "sintel"),
        fast_mode=params["fast"],
        sequence_length=params["sequence_length"],
    )
    engine = FlowEngine(cfg)
    try:
        engine.load_model()
        weights_available = True
    except FileNotFoundError:
        engine.load_model(allow_random_init=True)
        weights_available = False
    except ValueError as e:
        # The converter hard-fails on low name-table match rate
        # (runtime/convert.py) — degrade informatively rather than
        # erroring the driver-facing EPE harness.
        pytest.skip(f"checkpoint present but conversion failed: {e}")

    extractor = FrameExtractor(GOLDEN_VIDEO, fast_mode=params["fast"])
    frames, _, _, _, _ = extractor.extract_frames(
        max_frames=n, start_frame=params["start_frame"], progress=False
    )
    n = min(n, len(frames))

    # Golden caches were produced with the reference's tile geometry —
    # pin it so the EPE threshold measures model numerics, not the
    # balanced layout's moved seam lines (ADVICE r4).
    monkeypatch.setenv("TPUFLOW_TILE_LAYOUT", "reference")

    sample = list(range(0, n, max(1, n // 8)))[:8]
    epes = []
    for i in sample:
        golden = mgr.load_cached_flow(GOLDEN_CACHE, i)
        if params["tile"]:
            ours = engine.compute_flow_tiled(frames, i)
        else:
            ours = engine.compute_flow(frames, i)
        assert ours.shape == golden.shape, (ours.shape, golden.shape)
        epes.append(float(np.mean(np.sqrt(((ours - golden) ** 2).sum(-1)))))

    mean_epe = float(np.mean(epes))
    print(f"EPE vs golden cache over {len(sample)} frames: {mean_epe:.4f} "
          f"(weights {'loaded' if weights_available else 'RANDOM - shape parity only'})")
    if weights_available:
        assert mean_epe < 1.0, f"EPE {mean_epe} exceeds parity threshold"
