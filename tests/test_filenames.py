"""Golden string tests for filename/cache-dir contracts.

Expected values derived from /root/reference/storage/filename_generator.py
semantics (13-100, 151-213)."""

import os

from tpuflow.pipeline.filenames import (
    generate_cache_directory,
    generate_output_filename,
)


def test_output_filename_defaults():
    name = generate_output_filename("/videos/clip.mp4")
    assert name == "clip_30fps_MJPG.avi"


def test_output_filename_full():
    name = generate_output_filename(
        "/videos/clip.mp4",
        start_frame=10,
        max_frames=100,
        fast_mode=True,
        tile_mode=True,
        taa=True,
        fps=24.0,
    )
    assert name == "clip_f10_100f_fast_tile_taa_24fps_MJPG.avi"


def test_output_filename_flow_only_gamedev():
    name = generate_output_filename("/v/x.mov", flow_only=True)
    assert name == "x_gamedev_30fps_MJPG.avi"


def test_output_filename_flow_only_motion_vectors():
    name = generate_output_filename(
        "/v/x.mov",
        flow_only=True,
        flow_format="motion-vectors-rg8",
        motion_vectors_clamp_range=64.0,
    )
    assert name == "x_motion_vectors_rg8_64_30fps_MJPG.avi"


def test_output_filename_time_based_uncompressed():
    name = generate_output_filename(
        "/v/x.mov", start_time=1.5, duration=2.0, uncompressed=True
    )
    assert name == "x_1.5s_2.0s_30fps_uncompressed_I420.avi"


def test_cache_directory_videoflow():
    path = generate_cache_directory(
        "/videos/clip.mp4",
        start_frame=0,
        max_frames=1000,
        sequence_length=5,
        fast_mode=False,
        tile_mode=False,
        model="videoflow",
        dataset="sintel",
        architecture="mof",
        variant="standard",
    )
    assert path == os.path.join(
        "/videos", "clip_flow_cache_videoflow_mof_sintel_standard_seq5_start0_frames1000"
    )


def test_cache_directory_memflow_fast_tile():
    path = generate_cache_directory(
        "/videos/clip.mp4",
        start_frame=7,
        max_frames=50,
        sequence_length=3,
        fast_mode=True,
        tile_mode=True,
        model="memflow",
        dataset="things",
    )
    assert path == os.path.join(
        "/videos", "clip_flow_cache_memflow_things_seq3_start7_frames50_fast_tile"
    )
