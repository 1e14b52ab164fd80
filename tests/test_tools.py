"""Tests for the visualizer core and GUI launcher logic (headless)."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tpuflow.pipeline.cache import FlowCacheManager
from tpuflow.tools.gui import (
    GuiSettings,
    build_command,
    cache_status,
    preview_cache_path,
    preview_output_path,
)
from tpuflow.tools.visualizer import FlowInspector


@pytest.fixture(scope="module")
def video_with_cache(tmp_path_factory):
    """Synthetic video + a complete flow cache with reference layout."""
    d = tmp_path_factory.mktemp("viz")
    path = str(d / "clip.avi")
    n, w, h = 5, 64, 48
    fourcc = cv2.VideoWriter_fourcc(*"MJPG")
    out = cv2.VideoWriter(path, fourcc, 10.0, (w, h))
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    for i in range(n):
        frame = np.roll(base, i * 2, axis=1)
        out.write(frame)
    out.release()

    cache_dir = str(d / "clip_flow_cache_videoflow_mof_sintel_standard_seq5_start0_frames5")
    mgr = FlowCacheManager()
    for i in range(n):
        flow = np.full((h, w, 2), [-2.0, 0.0], np.float32)
        mgr.save_flow_to_cache(flow, cache_dir, i)
    return path, cache_dir, n


def test_inspector_loads_and_analyzes(video_with_cache):
    path, cache_dir, n = video_with_cache
    insp = FlowInspector(path, cache_dir, max_frames=n)
    assert len(insp.flow_files) == n
    assert len(insp.frames) >= n + 1

    q = insp.quality_map(0)
    assert q.shape == (48, 64, 3) and q.dtype == np.uint8

    t = insp.turbulence_map(0)
    assert t.shape == (48, 64, 3)

    fx, fy = insp.sample_flow(0, 30, 20)
    assert (fx, fy) == (-2.0, 0.0)

    # LODs were generated during preload.
    assert (0, 4) in insp.lod_cache

    stats = insp.cache_statistics()
    assert stats["frames"] == n
    assert stats["complete_lods"]


def test_inspector_pixel_analysis(video_with_cache):
    path, cache_dir, n = video_with_cache
    insp = FlowInspector(path, cache_dir, max_frames=n)
    res = insp.analyze_pixel(0, 30, 20)
    assert "coarse" in res
    assert res["coarse"]["flow"].shape == (2,)


def test_inspector_correct_range_writes_corrected_dir(video_with_cache):
    path, cache_dir, n = video_with_cache
    insp = FlowInspector(path, cache_dir, max_frames=n)
    results = insp.correct_range(0, 2, progress=False)
    corrected_dir = cache_dir + "_corrected"
    assert os.path.isdir(corrected_dir)
    for r in results:
        assert os.path.exists(r["path"])


def test_find_flow_files_excludes_lods(video_with_cache):
    path, cache_dir, n = video_with_cache
    files = FlowInspector.find_flow_files(cache_dir)
    assert len(files) == n
    assert not any("_lod" in f for f in files)


# ---------------------------------------------------------------------------
# GUI launcher core
# ---------------------------------------------------------------------------
def test_build_command_defaults_minimal():
    s = GuiSettings(input="a.mp4", output="out")
    cmd = build_command(s, python="py")
    assert cmd[:3] == ["py", "-m", "tpuflow.tools.cli"]
    assert "--fast" not in cmd and "--frames" not in cmd


def test_build_command_full():
    s = GuiSettings(
        input="a.mp4", output="out", fast=True, tile=True, taa=True,
        frames=50, sequence_length=3, model="memflow", stage="kitti",
        flow_format="hsv", save_flow="both",
    )
    cmd = build_command(s, python="py")
    for part in ["--fast", "--tile", "--taa", "--frames", "50",
                 "--sequence-length", "3", "--model", "memflow",
                 "--stage", "kitti", "--flow-format", "hsv",
                 "--save-flow", "both"]:
        assert part in cmd


def test_settings_roundtrip(tmp_path):
    p = str(tmp_path / "settings.json")
    s = GuiSettings(input="x.mp4", frames=42, tile=True)
    s.save(p)
    loaded = GuiSettings.load(p)
    assert loaded.input == "x.mp4" and loaded.frames == 42 and loaded.tile


def test_settings_load_ignores_unknown(tmp_path):
    p = str(tmp_path / "settings.json")
    json.dump({"input": "y.mp4", "bogus_key": 1}, open(p, "w"))
    loaded = GuiSettings.load(p)
    assert loaded.input == "y.mp4"


def test_preview_paths_match_pipeline(video_with_cache):
    path, cache_dir, n = video_with_cache
    s = GuiSettings(input=path, output="results", frames=5)
    assert preview_output_path(s).endswith("clip_5f_30fps_MJPG.avi")
    assert preview_cache_path(s) == cache_dir.replace("frames5", "frames5")


def test_cache_status_states(video_with_cache, tmp_path):
    path, cache_dir, n = video_with_cache
    s = GuiSettings(input=path, frames=n, use_flow_cache=cache_dir)
    state, detail = cache_status(s)
    assert state == "complete"

    s2 = GuiSettings(input=path, frames=n, use_flow_cache=str(tmp_path / "none"))
    assert cache_status(s2)[0] == "none"

    s3 = GuiSettings(input=path, frames=n + 3, use_flow_cache=cache_dir)
    assert cache_status(s3)[0] == "partial"


def test_inspector_detail_analysis(video_with_cache):
    path, cache_dir, n = video_with_cache
    insp = FlowInspector(path, cache_dir, max_frames=n)
    d = insp.detail_analysis(0, 30, 20, patch=16)
    assert d["source_patch"].shape == (16, 16, 3)
    assert d["target_patch"].shape == (16, 16, 3)
    assert d["corrected_patch"].shape == (16, 16, 3)
    assert 0.0 <= d["corrected_similarity"] <= 1.0
    assert d["pixel"] == (30, 20)
    # The synthetic clip rolls by exactly the cached flow, so the
    # flow-displaced target patch matches the source patch up to MJPG
    # compression noise.
    diff = np.abs(
        d["source_patch"].astype(np.int16) - d["target_patch"].astype(np.int16)
    )
    assert diff.mean() < 8.0, diff.mean()


def test_inspector_consistency_check(video_with_cache):
    # The single-pixel path IS the batched kernel with N=1, so the check
    # must come back consistent (flow_visualizer.py:940-959 parity).
    path, cache_dir, n = video_with_cache
    insp = FlowInspector(path, cache_dir, max_frames=n)
    res = insp.consistency_check(0, 30, 20)
    assert res["consistent"], res


def test_inspector_deferred_quality(video_with_cache):
    path, cache_dir, n = video_with_cache
    insp = FlowInspector(path, cache_dir, max_frames=n)
    assert insp.quality_map_cached(0) is None
    got = {}
    t = insp.compute_quality_async(0, on_ready=lambda i, q: got.setdefault(i, q))
    assert t is not None
    t.join(timeout=120)
    assert 0 in got and got[0].shape == (48, 64, 3)
    # Second request is served synchronously from the cache.
    assert insp.quality_map_cached(0) is not None
    insp.compute_quality_async(0, on_ready=lambda i, q: got.setdefault("again", q))
    assert "again" in got


def test_video_preview_core(video_with_cache):
    """load_video_preview: first frame + metadata (VideoThread parity,
    gui_runner.py:87-109)."""
    from tpuflow.tools.gui import load_video_preview

    path, _, n = video_with_cache
    p = load_video_preview(path)
    assert p.total_frames == n
    assert p.fps == pytest.approx(10.0)
    assert p.frame.shape == (48, 64, 3)
    assert p.frame.dtype == np.uint8


def test_video_preview_async(video_with_cache):
    import threading

    from tpuflow.tools.gui import load_video_preview_async

    path, _, n = video_with_cache
    done = threading.Event()
    got = {}

    def on_loaded(p):
        got["p"] = p
        done.set()

    t = load_video_preview_async(path, on_loaded)
    assert done.wait(10.0)
    t.join(5.0)
    assert got["p"].total_frames == n


def test_video_preview_async_error():
    import threading

    from tpuflow.tools.gui import load_video_preview_async

    done = threading.Event()
    errs = []

    def on_error(e):
        errs.append(e)
        done.set()

    load_video_preview_async(
        "/nonexistent/nope.avi", lambda p: None, on_error
    )
    assert done.wait(10.0)
    assert errs and isinstance(errs[0], Exception)


def test_process_runner_streams_lines():
    """ProcessRunner: streamed stdout+stderr lines and exit code
    (ProcessThread parity, gui_runner.py:111-139)."""
    import sys

    from tpuflow.tools.gui import ProcessRunner

    lines, finished = [], []
    code = "import sys\nfor i in range(5): print('line', i)\nprint('err', file=sys.stderr)\nsys.exit(3)"
    r = ProcessRunner(
        [sys.executable, "-c", code], lines.append, finished.append
    ).start()
    rc = r.wait(30.0)
    assert rc == 3 and finished == [3]
    assert [f"line {i}" for i in range(5)] == lines[:5]
    assert "err" in lines  # stderr merged into the stream


def test_process_runner_bad_command_surfaces_error():
    from tpuflow.tools.gui import ProcessRunner

    lines, finished = [], []
    r = ProcessRunner(["/nonexistent/binary"], lines.append, finished.append).start()
    rc = r.wait(30.0)
    assert rc == 1 and finished == [1]
    assert lines and lines[0].startswith("Error: ")


def test_process_runner_stop():
    import sys
    import time

    from tpuflow.tools.gui import ProcessRunner

    lines = []
    r = ProcessRunner(
        [sys.executable, "-c", "import time; print('up', flush=True); time.sleep(60)"],
        lines.append,
    ).start()
    deadline = time.time() + 10
    while "up" not in lines and time.time() < deadline:
        time.sleep(0.05)
    r.stop()
    rc = r.wait(15.0)
    assert rc is not None and rc != 0
