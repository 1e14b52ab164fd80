"""FlowPipeline data-parallel wiring test (8 virtual CPU devices)."""

import jax
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tpuflow.config import PipelineConfig
from tpuflow.tools.pipeline import FlowPipeline

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


@needs_8
def test_pipeline_creates_mesh_engine(tmp_path):
    path = str(tmp_path / "clip.avi")
    out = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (64, 48))
    for i in range(6):
        out.write(np.full((48, 64, 3), i * 30, np.uint8))
    out.release()

    config = PipelineConfig(input=path, frames=6, data_parallel=8, allow_random_init=True)
    pipe = FlowPipeline(config)
    assert pipe.engine.mesh is not None
    assert pipe.engine.mesh.shape["data"] == 8

    # data_parallel=1 keeps a single-device engine.
    pipe1 = FlowPipeline(PipelineConfig(input=path, frames=6, allow_random_init=True))
    assert pipe1.engine.mesh is None
