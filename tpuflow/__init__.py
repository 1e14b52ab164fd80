"""tpuflow — a TPU-native video optical-flow framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
IvanPopov/video-flow-ml (a PyTorch/CUDA video optical-flow pipeline):

- JAX/flax reimplementations of the VideoFlow MOF/BOF (ICCV 2023) and
  MemFlow (CVPR 2024) optical-flow networks (reference loads them from
  pinned submodules: /root/reference/processing/videoflow_core.py:28,
  memflow_loader.py:40).
- A jit/pjit-compiled FlowEngine with static-shape bucketing, tile-mode
  batching (vmap over tiles instead of the reference's Python loop,
  videoflow_processor.py:258), and lax.scan streaming that carries
  MemFlow memory state and TAA history across frames.
- On-TPU flow post-processing: encoders (HSV / gamedev RG / RG8 / RGB8 /
  color wheel), TAA warp+blend, quality maps, turbulence maps, LOD
  pyramids (reference: encoding/flow_encoders.py, effects/taa_processor.py,
  storage/cache_manager.py).
- Byte-compatible .flo/.npz caches and identical cache-directory naming
  (reference: storage/filename_generator.py:151-213).
- A flag-compatible CLI (reference: flow_processor.py:1271-1332).
"""

__version__ = "0.1.0"

# Public API (lazy: importing tpuflow must not pull jax/cv2 until used).
__all__ = [
    "FlowEngine",
    "FlowPipeline",
    "PipelineConfig",
    "ModelConfig",
    "VideoFlowInference",
    "MemFlowInference",
]


def __getattr__(name):
    if name in ("PipelineConfig", "ModelConfig"):
        from . import config

        return getattr(config, name)
    if name == "FlowEngine":
        from .runtime.engine import FlowEngine

        return FlowEngine
    if name == "FlowPipeline":
        from .tools.pipeline import FlowPipeline

        return FlowPipeline
    if name in ("VideoFlowInference", "MemFlowInference"):
        from . import compat

        return getattr(compat, name)
    raise AttributeError(f"module 'tpuflow' has no attribute {name!r}")
