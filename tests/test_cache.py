"""Cache layer tests: .flo byte layout, .npz keys, LOD invariants,
cache completeness probing.  Oracles are direct transcriptions of the
reference formulas (storage/cache_manager.py)."""

import os
import struct

import numpy as np
import pytest

from tpuflow.pipeline.cache import FlowCacheManager, FlowFileHandler, LODGenerator


def _reference_lods(flow, num_lods=5):
    """Oracle: per-pixel weighted-average loop exactly as
    cache_manager.py:77-161 computes it."""
    lods = [flow]
    current = flow.copy()
    for _ in range(1, num_lods):
        h, w = current.shape[:2]
        pad_h = 1 if (h % 2) else 0
        pad_w = 1 if (w % 2) else 0
        if pad_h or pad_w:
            weight = np.pad(
                np.ones((h, w), np.float32), ((0, pad_h), (0, pad_w)), constant_values=0
            )
            current = np.pad(current, ((0, pad_h), (0, pad_w), (0, 0)), constant_values=0)
            h, w = current.shape[:2]
        else:
            weight = np.ones((h, w), np.float32)
        nh, nw = h // 2, w // 2
        out = np.zeros((nh, nw, 2), np.float32)
        for y in range(nh):
            for x in range(nw):
                fb = current[y * 2 : y * 2 + 2, x * 2 : x * 2 + 2]
                wb = weight[y * 2 : y * 2 + 2, x * 2 : x * 2 + 2]
                tw = wb.sum()
                if tw > 0:
                    out[y, x, 0] = (fb[:, :, 0] * wb).sum() / tw * 0.5
                    out[y, x, 1] = (fb[:, :, 1] * wb).sum() / tw * 0.5
        lods.append(out)
        current = out
    return lods


def test_flo_roundtrip(tmp_path, random_flow):
    path = str(tmp_path / "a.flo")
    FlowFileHandler.save_flow_flo(random_flow, path)
    loaded = FlowFileHandler.load_flow_flo(path)
    np.testing.assert_array_equal(loaded, random_flow.astype(np.float32))


def test_flo_byte_layout(tmp_path):
    flow = np.arange(2 * 3 * 2, dtype=np.float32).reshape(2, 3, 2)
    path = str(tmp_path / "b.flo")
    FlowFileHandler.save_flow_flo(flow, path)
    raw = open(path, "rb").read()
    assert raw[:4] == b"PIEH"
    assert struct.unpack("<I", raw[4:8])[0] == 3  # width
    assert struct.unpack("<I", raw[8:12])[0] == 2  # height
    assert raw[12:] == flow.tobytes()


def test_flo_bad_magic(tmp_path):
    path = str(tmp_path / "bad.flo")
    open(path, "wb").write(b"XXXX" + b"\x00" * 16)
    with pytest.raises(ValueError):
        FlowFileHandler.load_flow_flo(path)


def test_npz_keys(tmp_path, random_flow):
    mgr = FlowCacheManager()
    cache_dir = str(tmp_path / "cache")
    mgr.save_flow_to_cache(random_flow, cache_dir, 3, save_format="npz")
    data = FlowFileHandler.load_flow_npz(os.path.join(cache_dir, "flow_frame_000003.npz"))
    assert set(data.keys()) >= {"flow", "frame_idx", "shape", "dtype"}
    np.testing.assert_array_equal(data["flow"], random_flow.astype(np.float32))
    assert int(data["frame_idx"]) == 3


def test_lods_match_reference_even_dims(rng):
    flow = rng.normal(0, 5, size=(16, 24, 2)).astype(np.float32)
    ours = LODGenerator.generate_lods(flow, 5)
    oracle = _reference_lods(flow, 5)
    assert len(ours) == len(oracle) == 5
    for a, b in zip(ours, oracle):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_lods_match_reference_odd_dims(rng):
    flow = rng.normal(0, 5, size=(13, 17, 2)).astype(np.float32)
    ours = LODGenerator.generate_lods(flow, 5)
    oracle = _reference_lods(flow, 5)
    for a, b in zip(ours, oracle):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_lod_constant_field_preserved():
    # A constant flow field must stay constant and halve per level.
    flow = np.full((32, 32, 2), 8.0, np.float32)
    lods = LODGenerator.generate_lods(flow, 4)
    for i, lod in enumerate(lods):
        np.testing.assert_allclose(lod, 8.0 * 0.5**i, rtol=1e-6)


def test_cache_exists_probe(tmp_path, random_flow):
    mgr = FlowCacheManager()
    cache_dir = str(tmp_path / "cache")

    ok, fmt, missing = mgr.check_cache_exists(cache_dir, 3)
    assert not ok and fmt is None and missing == [0, 1, 2]

    mgr.save_flow_to_cache(random_flow, cache_dir, 0)
    mgr.save_flow_to_cache(random_flow, cache_dir, 2)
    ok, fmt, missing = mgr.check_cache_exists(cache_dir, 3)
    assert not ok and fmt is None and missing == [1]

    mgr.save_flow_to_cache(random_flow, cache_dir, 1)
    ok, fmt, missing = mgr.check_cache_exists(cache_dir, 3)
    assert ok and fmt == "npz" and missing == []


def test_cache_load_auto_and_flo(tmp_path, random_flow):
    mgr = FlowCacheManager()
    cache_dir = str(tmp_path / "cache")
    mgr.save_flow_to_cache(random_flow, cache_dir, 0, save_format="both")
    a = mgr.load_cached_flow(cache_dir, 0, "auto")
    b = mgr.load_cached_flow(cache_dir, 0, "flo")
    c = mgr.load_cached_flow(cache_dir, 0, "npz")
    np.testing.assert_array_equal(a, c)
    np.testing.assert_array_equal(b, c)


def test_lod_files_and_probe(tmp_path, random_flow):
    mgr = FlowCacheManager()
    cache_dir = str(tmp_path / "cache")
    mgr.save_flow_to_cache(random_flow, cache_dir, 0)
    assert not mgr.check_flow_lods_exist(cache_dir, 1)
    mgr.generate_lods_for_cache(cache_dir, 1, progress=False)
    assert mgr.check_flow_lods_exist(cache_dir, 1)
    lod2 = mgr.load_flow_lod(cache_dir, 0, 2)
    assert lod2.shape == (random_flow.shape[0] // 4, random_flow.shape[1] // 4, 2)


def test_lod_cache_statistics(tmp_path, random_flow, capsys):
    """The per-level LOD audit (flow_processor.py:229-408 parity): counts,
    coverage, dimensions, missing frames, size distribution."""
    mgr = FlowCacheManager()
    cache_dir = str(tmp_path / "cache")
    for i in range(3):
        mgr.save_flow_to_cache(random_flow, cache_dir, i)
    mgr.generate_lods_for_cache(cache_dir, 3, progress=False)
    # Knock out one LOD file to exercise the problem-frame paths.
    import os

    os.remove(os.path.join(cache_dir, "flow_frame_000001_lod3.npz"))

    s = mgr.lod_cache_statistics(cache_dir, 3)
    assert s["total_files"] == 14
    assert s["frames_complete"] == 2
    assert s["frames_partial"] == 1
    assert s["levels"][3]["missing_frames"] == [1]
    assert s["problematic"] == [1]
    h, w = random_flow.shape[:2]
    assert s["levels"][0]["dimensions"] == {(w, h)}
    assert s["levels"][1]["dimensions"] == {((w + 1) // 2, (h + 1) // 2)}
    assert s["size_min"] <= s["size_median"] <= s["size_max"]

    report = mgr.print_lod_cache_statistics(cache_dir, 3)
    out = capsys.readouterr().out
    assert "--- LOD Cache Statistics ---" in out
    assert "Completion rate: 66.7%" in out
    assert "Files found: 2/3" in out
    assert "Missing frames: 1" in out
    assert "Problematic Frames" in out
    assert "Size Distribution:" in out
    assert report["total_files"] == 14


def test_lod_statistics_empty_dir(tmp_path, capsys):
    mgr = FlowCacheManager()
    out_stats = mgr.print_lod_cache_statistics(str(tmp_path / "nope"), 4)
    assert out_stats == {}
    assert "no LOD data available" in capsys.readouterr().out
