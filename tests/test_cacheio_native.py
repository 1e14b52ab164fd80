"""Native cache-IO runtime tests (skipped when g++ is unavailable)."""

import numpy as np
import pytest

from tpuflow.pipeline.cache import FlowFileHandler, LODGenerator
from tpuflow.runtime import cacheio


pytestmark = pytest.mark.skipif(
    not cacheio.available(), reason="native cacheio not buildable"
)


def test_native_flo_roundtrip(tmp_path, random_flow):
    path = str(tmp_path / "n.flo")
    cacheio.write_flo(path, random_flow)
    loaded = cacheio.read_flo(path)
    np.testing.assert_array_equal(loaded, random_flow.astype(np.float32))


def test_native_flo_matches_python_bytes(tmp_path, random_flow):
    p_native = str(tmp_path / "a.flo")
    p_python = str(tmp_path / "b.flo")
    cacheio.write_flo(p_native, random_flow)
    FlowFileHandler.save_flow_flo(random_flow, p_python)
    assert open(p_native, "rb").read() == open(p_python, "rb").read()


def test_native_reads_python_file(tmp_path, random_flow):
    path = str(tmp_path / "c.flo")
    FlowFileHandler.save_flow_flo(random_flow, path)
    np.testing.assert_array_equal(cacheio.read_flo(path), random_flow)


def test_native_lods_match_python(rng):
    flow = rng.normal(0, 5, size=(37, 53, 2)).astype(np.float32)
    native = cacheio.lod_pyramid(flow, 5)
    python = LODGenerator.generate_lods(flow, 5)
    assert len(native) == len(python)
    for a, b in zip(native, python):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_async_writer(tmp_path, rng):
    flows = [rng.normal(size=(32, 40, 2)).astype(np.float32) for _ in range(16)]
    with cacheio.AsyncFloWriter(n_threads=4) as writer:
        for i, f in enumerate(flows):
            writer.write(str(tmp_path / f"flow_{i:03d}.flo"), f)
        assert writer.flush() == 0
    for i, f in enumerate(flows):
        loaded = cacheio.read_flo(str(tmp_path / f"flow_{i:03d}.flo"))
        np.testing.assert_array_equal(loaded, f)


def test_async_writer_error_counting(tmp_path, rng):
    flow = rng.normal(size=(8, 8, 2)).astype(np.float32)
    with cacheio.AsyncFloWriter(n_threads=1) as writer:
        writer.write(str(tmp_path / "nonexistent_dir" / "x.flo"), flow)
        assert writer.flush() == 1
