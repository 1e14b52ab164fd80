"""Legacy-API compatibility layer tests."""

import numpy as np
import pytest

from tpuflow.compat import MemFlowInference, VideoFlowInference, VideoFlowProcessor
from tpuflow.config import ModelConfig
from tpuflow.runtime.engine import FlowEngine


def tiny_engine(model="videoflow", seq=3):
    cfg = ModelConfig(model=model, sequence_length=seq, encoder="cnn")
    for k, v in dict(decoder_depth=1, corr_levels=2, corr_radius=2,
                     feature_dim=32, hidden_dim=16, context_dim=16).items():
        object.__setattr__(cfg, k, v)
    return FlowEngine(cfg)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(9)
    return [rng.integers(0, 256, (32, 40, 3), dtype=np.uint8) for _ in range(6)]


def test_videoflow_inference_api(frames):
    inf = VideoFlowInference(sequence_length=3, engine=tiny_engine(), allow_random_init=True)
    assert not inf.is_model_loaded()
    inf.load_model()
    assert inf.is_model_loaded()

    flow = inf.compute_optical_flow(frames, 2)
    assert flow.shape == (32, 40, 2)

    # Legacy attrs exist (flow_inference.py:66-72).
    assert inf.model is not None
    assert inf.cfg is not None
    assert inf.core is inf.engine

    info = inf.get_model_info()
    assert info["status"] == "loaded"
    assert info["processor_type"] == "VideoFlowInference"


def test_prepare_frame_sequence_contract(frames):
    inf = VideoFlowInference(sequence_length=3, engine=tiny_engine(), allow_random_init=True)
    batch = inf.prepare_frame_sequence(frames, 2)
    assert batch.shape == (1, 3, 3, 32, 40)  # [1, T, 3, H, W]
    assert batch.dtype == np.float32
    assert 0.0 <= batch.min() and batch.max() <= 1.0


def test_tile_grid_and_validation(frames):
    inf = VideoFlowInference(engine=tiny_engine())
    tw, th, cols, rows, tiles = inf.calculate_tile_grid(100, 60, 64)
    assert (cols, rows) == (2, 1)
    tile = inf.extract_tile(frames[0], tiles[0])
    assert tile.shape == (32, 40, 3)

    with pytest.raises(ValueError):
        inf.validate_frames([], 0)
    with pytest.raises(ValueError):
        inf.validate_frames(frames, 99)
    with pytest.raises(ValueError):
        inf.set_sequence_length(11)


def test_tiled_dispatch(frames):
    inf = VideoFlowInference(sequence_length=3, tile_mode=False, engine=tiny_engine(), allow_random_init=True)
    inf.load_model()
    a = inf.compute_optical_flow_tiled(frames, 2)
    inf.set_tile_mode(True)
    b = inf.compute_optical_flow_tiled(frames, 2)
    # Frames smaller than the tile size: both paths identical.
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_memflow_inference_api(frames):
    inf = MemFlowInference(sequence_length=3, engine=tiny_engine("memflow"), allow_random_init=True)
    inf.load_model()
    flow = inf.compute_optical_flow(frames, 3)
    assert flow.shape == (32, 40, 2)
    flows = inf.stream_flows(frames[:4])
    assert flows.shape == (4, 32, 40, 2)
    batch = inf.prepare_frame_sequence(frames, 3)
    assert batch.shape[1] == 3  # trailing window length


def test_processor_alias():
    assert VideoFlowProcessor is VideoFlowInference
