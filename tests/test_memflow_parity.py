"""Cross-framework parity: torch mirror of upstream MemFlow -> converter
-> flax MemFlowNet, numerical agreement on the same input + memory state.

Validates the exact pipeline a real `MemFlowNet_*.pth` will take
(memflow_loader.py:43-53 / memflow_inference_isolated.py:60-105):
upstream tensor names/layouts -> name table (runtime/convert_memflow.py)
-> flax params -> forward.  Covers the memory loop: frame 0 (empty
memory), a written memory slot, and the RoPE-gated readout
(add_pe=cfg.rope, memflow_inference_isolated.py:105).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tpuflow.core.memflownet import MemFlowNet, init_memory
from tpuflow.runtime.convert import flatten_params, map_state_dict_to_params
from tpuflow.runtime.convert_memflow import MEMFLOW_IGNORE, memflow_name_map
from tests.mirrors.memflow_torch import MemFlowNetMirror


CFG = dict(corr_levels=2, corr_radius=2, decoder_depth=2, memory_capacity=3)


def _build(use_rope: bool):
    torch.manual_seed(0)
    mirror = MemFlowNetMirror(use_rope=use_rope, **CFG).eval()
    state = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}

    model = MemFlowNet(
        encoder="twins", use_rope=use_rope, dtype=jnp.float32,
        scan_iters=False, **CFG,
    )
    x0 = jnp.zeros((1, 2, 64, 96, 3), jnp.float32)
    mem0 = model.empty_memory(1, 64, 96)
    params = model.init(jax.random.PRNGKey(0), x0, mem0)
    new_params, report = map_state_dict_to_params(state, params, memflow_name_map)
    return mirror, model, new_params, report, state, params


@pytest.fixture(scope="module")
def built():
    return _build(use_rope=False)


def test_conversion_is_total(built):
    _, _, _, report, state, _ = built
    assert report["unmatched"] == [], report["unmatched"][:8]
    assert report["matched"] == len(state)
    assert report["matched"] == report["total_flax"], (
        report["matched"], report["total_flax"],
    )


@pytest.mark.parametrize("use_rope", [False, True])
def test_forward_parity_streaming(use_rope):
    """Two streamed frames: frame 0 reads empty memory (zeros), frame 1
    reads the slot frame 0 wrote — both must agree with the mirror."""
    mirror, model, params, report, _, _ = _build(use_rope)
    assert report["unmatched"] == []
    rng = np.random.default_rng(1)
    frames = rng.random((1, 3, 64, 96, 3), np.float32)

    tmem = mirror.empty_memory(1, 64, 96)
    jmem = model.empty_memory(1, 64, 96)
    for t in range(2):
        pair = frames[:, t : t + 2]
        with torch.no_grad():
            tflow, tmem, tlow = mirror(
                torch.from_numpy(pair).permute(0, 1, 4, 2, 3), tmem
            )
        jflow, jmem, jlow = model.apply(params, jnp.asarray(pair), jmem)

        tf = tflow.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC
        np.testing.assert_allclose(np.asarray(jflow), tf, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(jmem.valid), tmem["valid"].numpy(), atol=0
        )
        np.testing.assert_allclose(
            np.asarray(jmem.keys), tmem["keys"].numpy(), rtol=1e-4, atol=1e-4
        )


def test_ignore_patterns_compile():
    import re

    for pat in MEMFLOW_IGNORE:
        re.compile(pat)


def test_scan_matches_unroll():
    """The production scan_iters=True path is numerically the unrolled
    path (same params, same input)."""
    rng = np.random.default_rng(3)
    pair = jnp.asarray(rng.random((1, 2, 32, 48, 3), np.float32))
    kw = dict(encoder="cnn", dtype=jnp.float32, **CFG)
    m_scan = MemFlowNet(scan_iters=True, **kw)
    m_unroll = MemFlowNet(scan_iters=False, **kw)
    mem = m_scan.empty_memory(1, 32, 48)
    params = m_scan.init(jax.random.PRNGKey(0), pair, mem)
    a, _, _ = m_scan.apply(params, pair, mem)
    b, _, _ = m_unroll.apply(params, pair, mem)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_stage_cfg_sets_rope_in_product_path():
    """PipelineConfig -> ModelConfig applies the per-stage MemFlow cfg
    (rope gate, memflow_inference_isolated.py:105) — the flag is live in
    the product path, not a dead default."""
    from tpuflow.config import MEMFLOW_STAGE_CFG, PipelineConfig

    for stage in ("sintel", "things", "kitti"):
        mc = PipelineConfig(model="memflow", stage=stage).model_config()
        assert mc.use_rope == MEMFLOW_STAGE_CFG[stage]["use_rope"]
    # VideoFlow path untouched by the table.
    assert PipelineConfig(model="videoflow").model_config().use_rope is False

    import pytest

    with pytest.raises(ValueError):
        PipelineConfig(model="memflow", stage="nope").model_config()
