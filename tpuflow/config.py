"""Unified configuration for the tpuflow pipeline.

The reference splits configuration across three uncoordinated systems
(argparse CLI at flow_processor.py:1272-1332, yacs model cfg mutated at
videoflow_core.py:76-94, and QSettings in gui_runner.py:648-776).  Here a
single frozen dataclass carries everything; the cache-affecting subset is
exposed via :meth:`PipelineConfig.cache_key` which reproduces the
reference's cache-directory contract (storage/filename_generator.py:151-213,
README partition of cache-affecting vs cosmetic flags).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


# Fast-mode model overrides, mirroring videoflow_core.py:91-94.
FAST_DECODER_DEPTH = 6
FAST_CORR_LEVELS = 3
FAST_CORR_RADIUS = 3

DEFAULT_DECODER_DEPTH = 12
DEFAULT_CORR_LEVELS = 4
DEFAULT_CORR_RADIUS = 4

# Fixed square tile size used by tile mode (videoflow_processor.py:73-110).
TILE_SIZE = 1280

# Per-stage MemFlow model cfg (reference: configs/{stage}_memflownet.py
# consumed via memflow_loader.py:43-50; the inference path gates rotary
# position encoding on cfg.rope — memflow_inference_isolated.py:105
# `add_pe=('rope' in cfg and cfg.rope)`).  The upstream MemFlowNet
# configs (arXiv:2404.04808 §3.2's RoPE-equipped memory attention)
# enable rope for all released stages; the table keeps the gate explicit
# so a differing live checkpoint cfg maps in one edit.
MEMFLOW_STAGE_CFG = {
    "sintel": {"use_rope": True},
    "things": {"use_rope": True},
    "kitti": {"use_rope": True},
}


def memflow_stage_cfg(stage: str) -> dict:
    if stage not in MEMFLOW_STAGE_CFG:
        raise ValueError(
            f"Unknown MemFlow stage {stage!r} (expected one of "
            f"{sorted(MEMFLOW_STAGE_CFG)})"
        )
    return MEMFLOW_STAGE_CFG[stage]


@dataclass(frozen=True)
class ModelConfig:
    """Model-architecture configuration (reference: yacs cfg usage at
    videoflow_core.py:76-94, memflow_loader.py:43-50)."""

    model: str = "videoflow"           # 'videoflow' | 'memflow'
    architecture: str = "mof"          # 'mof' | 'bof' (videoflow only)
    dataset: str = "sintel"            # 'sintel' | 'things' | 'kitti'
    variant: str = "standard"          # 'standard' | 'noise'
    stage: str = "sintel"              # memflow training stage
    fast_mode: bool = False
    sequence_length: int = 5

    # Feature/context encoder backbone: 'twins' (Twins-SVT, the upstream
    # checkpoint-parity architecture — videoflow_core.py:101-110 builds the
    # net whose fnet/cnet are twins_svt_large, requirements.txt:13 pins
    # timm for it) or 'cnn' (RAFT BasicEncoder — lighter, NOT
    # weight-compatible with the released checkpoints).
    encoder: str = "twins"

    # Architecture hyper-parameters (RAFT/SKFlow family defaults).
    decoder_depth: int = DEFAULT_DECODER_DEPTH
    corr_levels: int = DEFAULT_CORR_LEVELS
    corr_radius: int = DEFAULT_CORR_RADIUS
    feature_dim: int = 256
    context_dim: int = 128
    hidden_dim: int = 128
    # memflow memory buffer capacity (frames of motion features kept).
    memory_capacity: int = 8
    use_rope: bool = False

    # Correlation implementation (core/corr.py make_corr): 'auto' picks
    # per-shape; 'flash' routes level 0 through the fused Pallas
    # recompute-on-lookup kernel (kernels/flashcorr.py — TPU only);
    # 'dense' | 'gather' | 'direct' force the XLA paths.
    corr_impl: str = "auto"

    def __post_init__(self):
        if self.fast_mode:
            # Mirror the reference's fast-mode overrides
            # (videoflow_core.py:91-94).
            object.__setattr__(self, "decoder_depth", FAST_DECODER_DEPTH)
            object.__setattr__(self, "corr_levels", FAST_CORR_LEVELS)
            object.__setattr__(self, "corr_radius", FAST_CORR_RADIUS)

    @property
    def checkpoint_filename(self) -> str:
        """Checkpoint naming contract (videoflow_core.py:79-85,
        flow_processor.py:66-67)."""
        if self.model == "videoflow":
            arch = self.architecture.upper()
            if self.variant == "noise" and self.dataset == "things":
                return f"{arch}_{self.dataset}_288960noise.pth"
            return f"{arch}_{self.dataset}.pth"
        return f"MemFlowNet_{self.stage}.pth"

    @property
    def checkpoint_path(self) -> str:
        if self.model == "videoflow":
            return f"VideoFlow_ckpt/{self.checkpoint_filename}"
        return f"MemFlow_ckpt/{self.checkpoint_filename}"


@dataclass(frozen=True)
class PipelineConfig:
    """Full pipeline configuration — the analogue of the reference CLI
    namespace (flow_processor.py:1272-1332)."""

    input: str = ""
    output: str = "results"
    device: str = "auto"               # 'auto' | 'tpu' | 'cpu'
    frames: int = 1000
    start_frame: int = 0
    start_time: Optional[float] = None
    duration: Optional[float] = None
    fast: bool = False
    flow_only: bool = False
    taa: bool = False
    flow_input: Optional[str] = None
    flow_format: str = "gamedev"
    motion_vectors_clamp_range: float = 32.0
    tile: bool = False
    sequence_length: int = 5
    save_flow: Optional[str] = None    # 'flo' | 'npz' | 'both'
    force_recompute: bool = False
    use_flow_cache: Optional[str] = None
    interactive: bool = False
    show_tiles: bool = False
    no_autoplay: bool = True
    skip_lods: bool = False
    uncompressed: bool = False
    model: str = "videoflow"
    model_path: Optional[str] = None
    stage: str = "sintel"
    vf_dataset: str = "sintel"
    vf_architecture: str = "mof"
    vf_variant: str = "standard"
    # tpu-native extensions (not in the reference CLI)
    encoder: str = "twins"             # 'twins' (upstream parity) | 'cnn'
    allow_random_init: bool = False    # run without a checkpoint (garbage flows)
    batch_frames: int = 1              # windows batched per device step
    tile_overlap: int = 0              # optional halo blend (0 = reference hard paste)
    data_parallel: int = 1             # devices to shard frames over
    stride_mode: str = "center"        # 'center' (reference parity) |
                                       # 'interior' (keep all interior flows,
                                       # (T-2)x fewer forward passes)

    def model_config(self) -> ModelConfig:
        kw = {}
        if self.model == "memflow":
            # Stage cfg (rope gate) — memflow_inference_isolated.py:105.
            kw.update(memflow_stage_cfg(self.stage))
        return ModelConfig(
            model=self.model,
            architecture=self.vf_architecture,
            dataset=self.vf_dataset,
            variant=self.vf_variant,
            stage=self.stage,
            encoder=self.encoder,
            fast_mode=self.fast,
            sequence_length=max(2, self.sequence_length)
            if self.model == "memflow"
            else self.sequence_length,
            **kw,
        )

    def replace(self, **kw) -> "PipelineConfig":
        return dataclasses.replace(self, **kw)
