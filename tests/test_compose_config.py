"""VideoComposer + PipelineConfig unit tests."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tpuflow.config import ModelConfig, PipelineConfig
from tpuflow.pipeline.compose import VideoComposer, create_side_by_side, create_video_grid


@pytest.fixture
def composer():
    return VideoComposer()


@pytest.fixture
def frame(rng):
    return rng.integers(0, 256, (60, 80, 3), dtype=np.uint8)


def test_text_overlay_changes_pixels(composer, frame):
    out = composer.add_text_overlay(frame, "Hello", "top-left")
    assert out.shape == frame.shape
    assert not np.array_equal(out, frame)
    # Original untouched (copy semantics).
    assert frame.sum() != 0


def test_text_overlay_positions(composer, frame):
    for pos in ["top-left", "top-right", "bottom-left", "bottom-right", (5, 30)]:
        out = composer.add_text_overlay(frame, "x", pos)
        assert out.shape == frame.shape


def test_side_by_side_horizontal(composer, frame):
    out = composer.create_side_by_side(frame, frame.copy())
    assert out.shape == (60, 160, 3)  # double width


def test_side_by_side_flow_only_vertical(composer, frame):
    out = composer.create_side_by_side(frame, frame.copy(), flow_only=True)
    assert out.shape == (120, 80, 3)  # stacked


def test_side_by_side_taa_grid(composer, frame):
    taa = frame.astype(np.float32)
    out = composer.create_side_by_side(
        frame, frame.copy(), taa_frame=taa, taa_simple_frame=taa
    )
    assert out.shape == (120, 160, 3)  # 2x2 grid


def test_side_by_side_single_taa(composer, frame):
    out = composer.create_side_by_side(frame, frame.copy(), taa_frame=frame.astype(np.float32))
    assert out.shape == (60, 240, 3)  # triple width


def test_side_by_side_resizes_flow(composer, frame):
    small_flow = np.zeros((30, 40, 3), np.uint8)
    out = composer.create_side_by_side(frame, small_flow)
    assert out.shape == (60, 160, 3)


def test_video_grid(composer, frame):
    frames = {"A": frame, "B": frame, "Flow Viz": frame, "TAA-x": frame.astype(np.float32)}
    out = composer.create_video_grid(frames, (2, 2), target_aspect=160 / 130)
    assert out is not None
    assert out.shape[1] == 160  # cols * w
    assert out.shape[0] == int(160 / (160 / 130))
    assert composer.create_video_grid({}, (1, 1)) is None


def test_video_grid_too_tall_for_aspect_does_not_crash(composer, frame):
    # 2 rows of 60 exceed a 16:9 canvas of width 160 — cells that do not
    # fit are skipped (the reference's guard underflows into a numpy
    # broadcast error here).
    out = composer.create_video_grid({"A": frame, "B": frame}, (2, 1), 16 / 9)
    assert out.shape == (int(80 / (16 / 9)), 80, 3)


def test_module_level_helpers(frame):
    assert create_side_by_side(frame, frame).shape == (60, 160, 3)
    assert create_video_grid({"A": frame}, (1, 1)).shape[1] == 80


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------
def test_model_config_memflow_seq_floor():
    cfg = PipelineConfig(model="memflow", sequence_length=1)
    assert cfg.model_config().sequence_length == 2


def test_pipeline_config_replace():
    c = PipelineConfig(frames=10)
    c2 = c.replace(frames=20, tile=True)
    assert c.frames == 10 and c2.frames == 20 and c2.tile


def test_fast_mode_immutable_overrides():
    cfg = ModelConfig(fast_mode=True)
    assert (cfg.decoder_depth, cfg.corr_levels, cfg.corr_radius) == (6, 3, 3)
    slow = ModelConfig(fast_mode=False)
    assert (slow.decoder_depth, slow.corr_levels, slow.corr_radius) == (12, 4, 4)
