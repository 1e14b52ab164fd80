"""End-to-end CLI/pipeline tests on a tiny synthetic video."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tpuflow.config import ModelConfig, PipelineConfig
from tpuflow.runtime.engine import FlowEngine
from tpuflow.tools.cli import args_to_config, build_parser
from tpuflow.tools.pipeline import FlowPipeline, create_difference_overlay


def make_synthetic_video(path: str, n=8, w=64, h=48, fps=10.0):
    """Moving white square on a gradient background."""
    fourcc = cv2.VideoWriter_fourcc(*"MJPG")
    out = cv2.VideoWriter(path, fourcc, fps, (w, h))
    assert out.isOpened()
    for i in range(n):
        frame = np.zeros((h, w, 3), np.uint8)
        frame[:, :, 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        x = 4 + i * 3
        frame[10:20, x : x + 10] = 255
        out.write(frame)
    out.release()
    return path


def tiny_engine(model="videoflow", seq=3):
    cfg = ModelConfig(model=model, sequence_length=seq, encoder="cnn")
    for k, v in dict(
        decoder_depth=2, corr_levels=2, corr_radius=2,
        feature_dim=64, hidden_dim=32, context_dim=32,
    ).items():
        object.__setattr__(cfg, k, v)
    return FlowEngine(cfg)


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    d = tmp_path_factory.mktemp("video")
    return make_synthetic_video(str(d / "clip.avi"))


def test_cli_parser_reference_flags():
    # Every reference flag parses with its default
    # (flow_processor.py:1272-1332).
    args = build_parser().parse_args([])
    assert args.frames == 1000
    assert args.flow_format == "gamedev"
    assert args.sequence_length == 5
    assert args.motion_vectors_clamp_range == 32.0
    assert args.model == "videoflow"
    assert args.vf_architecture == "mof"
    args = build_parser().parse_args(
        ["--tile", "--fast", "--taa", "--flow-only", "--model", "memflow",
         "--stage", "kitti", "--save-flow", "both", "--uncompressed"]
    )
    cfg = args_to_config(args)
    assert cfg.tile and cfg.fast and cfg.taa and cfg.flow_only
    assert cfg.model == "memflow" and cfg.stage == "kitti"
    assert cfg.save_flow == "both" and cfg.uncompressed


def test_pipeline_end_to_end(video, tmp_path):
    out_dir = str(tmp_path / "results")
    os.makedirs(out_dir)
    config = PipelineConfig(
        input=video, output=out_dir, frames=6, sequence_length=3,
        no_autoplay=True, skip_lods=True, allow_random_init=True, batch_frames=2,
    )
    pipe = FlowPipeline(config, engine=tiny_engine())
    out_path = pipe.process_video()

    assert os.path.exists(out_path)
    assert out_path.endswith("clip_6f_30fps_MJPG.avi") or out_path.endswith(".avi")

    # Cache must exist with reference layout.
    cache_dir = pipe.cache_dir_for(video, 0, 6)
    assert os.path.isdir(cache_dir)
    assert os.path.exists(os.path.join(cache_dir, "flow_frame_000000.npz"))
    assert os.path.exists(os.path.join(cache_dir, "flow_frame_000005.npz"))

    # Output video is readable and has 6 frames at 2x width.
    cap = cv2.VideoCapture(out_path)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 6
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 128
    cap.release()


def test_pipeline_cache_reuse(video, tmp_path, capsys):
    out_dir = str(tmp_path / "results")
    os.makedirs(out_dir)
    config = PipelineConfig(
        input=video, output=out_dir, frames=4, sequence_length=3,
        no_autoplay=True, skip_lods=True, allow_random_init=True,
    )
    pipe = FlowPipeline(config, engine=tiny_engine())
    pipe.process_video()

    cache_dir = pipe.cache_dir_for(video, 0, 4)
    flow0 = pipe.cache_manager.load_cached_flow(cache_dir, 0)

    # Second run must hit the cache (engine never loads) and print the
    # LOD cache audit (flow_processor.py:850 parity).
    config2 = config.replace(skip_lods=False)
    pipe2 = FlowPipeline(config2, engine=tiny_engine())
    capsys.readouterr()
    pipe2.process_video()
    out = capsys.readouterr().out
    assert not pipe2.engine.is_model_loaded()
    assert "--- LOD Cache Statistics ---" in out
    assert "Completion rate: 100.0%" in out
    np.testing.assert_array_equal(
        flow0, pipe2.cache_manager.load_cached_flow(cache_dir, 0)
    )


def test_pipeline_taa_mode(video, tmp_path):
    out_dir = str(tmp_path / "taa")
    os.makedirs(out_dir)
    config = PipelineConfig(
        input=video, output=out_dir, frames=4, sequence_length=3,
        taa=True, no_autoplay=True, skip_lods=True, allow_random_init=True,
    )
    pipe = FlowPipeline(config, engine=tiny_engine())
    out_path = pipe.process_video()
    cap = cv2.VideoCapture(out_path)
    # 2x2 TAA grid: double width, double height (flow_processor.py:903-908).
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 128
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == 96
    cap.release()


def test_pipeline_flow_only_mode(video, tmp_path):
    out_dir = str(tmp_path / "fo")
    os.makedirs(out_dir)
    config = PipelineConfig(
        input=video, output=out_dir, frames=4, sequence_length=3,
        flow_only=True, no_autoplay=True, skip_lods=True, allow_random_init=True,
    )
    pipe = FlowPipeline(config, engine=tiny_engine())
    out_path = pipe.process_video()
    cap = cv2.VideoCapture(out_path)
    # Vertical stack: same width, double height.
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 64
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == 96
    cap.release()


def test_pipeline_use_flow_cache_error(video, tmp_path):
    config = PipelineConfig(
        input=video, output=str(tmp_path), frames=4,
        use_flow_cache=str(tmp_path / "nonexistent"),
        no_autoplay=True, skip_lods=True, allow_random_init=True,
    )
    pipe = FlowPipeline(config, engine=tiny_engine())
    with pytest.raises(SystemExit):
        pipe.process_video()


def test_pipeline_memflow_stream(video, tmp_path):
    out_dir = str(tmp_path / "mf")
    os.makedirs(out_dir)
    config = PipelineConfig(
        input=video, output=out_dir, frames=5, sequence_length=3,
        model="memflow", no_autoplay=True, skip_lods=True, allow_random_init=True,
    )
    pipe = FlowPipeline(config, engine=tiny_engine(model="memflow"))
    out_path = pipe.process_video()
    assert os.path.exists(out_path)
    cache_dir = pipe.cache_dir_for(video, 0, 5)
    assert "memflow" in os.path.basename(cache_dir)
    assert os.path.exists(os.path.join(cache_dir, "flow_frame_000004.npz"))


def test_output_path_is_cache_dir(video, tmp_path):
    """An output path that is itself a complete flow cache becomes the
    cache source; the video lands next to it (flow_processor.py:806-820)."""
    cache_dir = str(tmp_path / "existing_cache")
    from tpuflow.pipeline.cache import FlowCacheManager

    mgr = FlowCacheManager()
    for i in range(4):
        mgr.save_flow_to_cache(np.zeros((48, 64, 2), np.float32), cache_dir, i)

    config = PipelineConfig(
        input=video, output=cache_dir, frames=4, sequence_length=3,
        no_autoplay=True, skip_lods=True, allow_random_init=True,
    )
    pipe = FlowPipeline(config, engine=tiny_engine())
    out_path = pipe.process_video()
    assert out_path.endswith("existing_cache_taa_output.avi")
    assert os.path.exists(out_path)
    assert not pipe.engine.is_model_loaded()  # flows came from the cache


def test_difference_overlay_colors():
    # Levels [0.1, 0.5, 1.0, 2.0, 4.0] -> green/yellow/orange/red/magenta
    # (flow_processor.py:518-533).  Probe pixels away from the legend band.
    # Tall image so probe pixels stay clear of the legend band.
    a = np.zeros((120, 40, 2), np.float32)
    b = np.zeros((120, 40, 2), np.float32)
    b[:30, :, 0] += 0.05    # |err| = 0.05 <= 0.1 -> green
    b[30:60, :, 0] += 1.5   # 1.0 < |err| <= 2.0 -> red
    b[60:90, :, 0] += 9.0   # |err| > 2.0 -> magenta
    overlay = create_difference_overlay(a, b)
    assert tuple(overlay[5, 35]) == (0, 255, 0)
    assert tuple(overlay[45, 35]) == (255, 0, 0)
    assert tuple(overlay[75, 35]) == (255, 0, 255)


def test_show_tiles_report(video, capsys):
    from tpuflow.tools.cli import show_tiles_report

    config = PipelineConfig(input=video, show_tiles=True)
    show_tiles_report(config)
    out = capsys.readouterr().out
    assert "1 tiles" in out or "tiles" in out
