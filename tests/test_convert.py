"""Weight-converter machinery tests: layout transforms + tree round-trip."""

import numpy as np
import pytest

from tpuflow.runtime.convert import (
    flatten_params,
    flax_conv_to_torch,
    map_state_dict_to_params,
    params_to_torch_style,
    torch_conv_to_flax,
    torch_linear_to_flax,
    unflatten_params,
)


def test_conv_layout_roundtrip(rng):
    w = rng.normal(size=(8, 4, 3, 3)).astype(np.float32)  # OIHW
    back = flax_conv_to_torch(torch_conv_to_flax(w))
    np.testing.assert_array_equal(w, back)
    # HWIO shape check
    assert torch_conv_to_flax(w).shape == (3, 3, 4, 8)


def test_linear_layout(rng):
    w = rng.normal(size=(16, 8)).astype(np.float32)  # [out, in]
    assert torch_linear_to_flax(w).shape == (8, 16)


def test_flatten_unflatten():
    tree = {"a": {"b": np.ones(3), "c": {"d": np.zeros(2)}}}
    flat = flatten_params(tree)
    assert set(flat) == {"a/b", "a/c/d"}
    back = unflatten_params(flat)
    np.testing.assert_array_equal(back["a"]["c"]["d"], np.zeros(2))


def test_state_dict_roundtrip_through_real_model(rng):
    """params -> torch-style dict -> params must be the identity, proving
    the layout transforms and name plumbing are mutually consistent."""
    import jax
    import jax.numpy as jnp

    from tpuflow.core.mofnet import MOFNet

    model = MOFNet(
        corr_levels=2, corr_radius=2, decoder_depth=1,
        feature_dim=32, hidden_dim=16, context_dim=16,
    )
    frames = jnp.zeros((1, 3, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), frames)

    # Perturb so we can tell converted-from-init apart.
    flat = flatten_params(params)
    perturbed = {k: v + 1.0 for k, v in flat.items()}
    perturbed_tree = unflatten_params(perturbed)

    torch_style = params_to_torch_style(perturbed_tree)
    recovered, report = map_state_dict_to_params(torch_style, params)

    assert report["matched"] == report["total_torch"], report["unmatched"][:5]
    rec_flat = flatten_params(recovered)
    for k in flat:
        np.testing.assert_allclose(rec_flat[k], perturbed[k], err_msg=k)


def test_scope_free_state_dict_maps_into_init_tree(rng):
    """A real torch state dict has no 'params.' scope; mapping into a
    model.init() tree (rooted at 'params/') must still match (the round-1
    silent-zero-match bug: ADVICE.md high)."""
    import jax
    import jax.numpy as jnp

    from tpuflow.core.mofnet import MOFNet
    from tpuflow.runtime.convert import params_to_torch_style

    model = MOFNet(
        corr_levels=2, corr_radius=2, decoder_depth=1,
        feature_dim=32, hidden_dim=16, context_dim=16,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32, 3)))
    flat = flatten_params(params)
    assert all(k.startswith("params/") for k in flat)

    torch_style = params_to_torch_style(params)
    # Strip the scope like a real checkpoint would.
    scope_free = {k[len("params."):]: v + 1.0 for k, v in torch_style.items()}
    recovered, report = map_state_dict_to_params(scope_free, params)
    assert report["matched"] == report["total_torch"], report["unmatched"][:5]
    rec_flat = flatten_params(recovered)
    for k in flat:
        np.testing.assert_allclose(rec_flat[k], flat[k] + 1.0, err_msg=k)


def test_low_match_rate_hard_fails(tmp_path):
    """load_torch_checkpoint_as_params refuses to 'load' a checkpoint that
    mostly fails to map (ADVICE.md: no silent random-weight inference)."""
    torch = pytest.importorskip("torch")
    from tpuflow.config import ModelConfig
    from tpuflow.runtime.convert import load_torch_checkpoint_as_params
    from tpuflow.runtime.engine import FlowEngine

    path = str(tmp_path / "bogus.pth")
    torch.save({"nothing.weight": torch.ones(3, 3)}, path)
    cfg = ModelConfig(sequence_length=3, encoder="cnn")
    for k, v in dict(decoder_depth=1, corr_levels=2, corr_radius=2,
                     feature_dim=32, hidden_dim=16, context_dim=16).items():
        object.__setattr__(cfg, k, v)
    engine = FlowEngine(cfg)
    with pytest.raises(ValueError, match="matched only"):
        load_torch_checkpoint_as_params(path, engine)


def test_missing_checkpoint_raises(tmp_path):
    """Reference parity: missing checkpoint is a hard error
    (videoflow_core.py:97-98), not silent random init."""
    from tpuflow.config import ModelConfig
    from tpuflow.runtime.engine import FlowEngine

    engine = FlowEngine(ModelConfig(sequence_length=3))
    with pytest.raises(FileNotFoundError):
        engine.load_model(str(tmp_path / "nope.pth"))


def test_unmatched_keys_reported():
    params = {"layer": {"kernel": np.zeros((3, 3, 4, 8), np.float32)}}
    sd = {
        "layer.weight": np.zeros((8, 4, 3, 3), np.float32),
        "ghost.weight": np.zeros((2, 2), np.float32),
    }
    new_params, report = map_state_dict_to_params(sd, params)
    assert report["matched"] == 1
    assert len(report["unmatched"]) == 1
    assert report["unmatched"][0][0] == "ghost.weight"


def test_describe_state_dict():
    from tpuflow.runtime.convert import describe_state_dict

    sd = {
        "fnet.conv1.weight": np.zeros((64, 3, 7, 7), np.float32),
        "fnet.conv1.bias": np.zeros(64, np.float32),
        "update.gru.weight": np.zeros((128, 256), np.float32),
    }
    report = describe_state_dict(sd)
    assert "[fnet]" in report and "[update]" in report
    assert "(64, 3, 7, 7)" in report
    assert "TOTAL" in report


def test_suggest_mapping_by_shape_and_name():
    from tpuflow.runtime.convert import suggest_mapping

    params = {
        "encoder": {"conv1": {"kernel": np.zeros((7, 7, 3, 64), np.float32),
                              "bias": np.zeros(64, np.float32)}},
        "head": {"dense": {"kernel": np.zeros((256, 128), np.float32)}},
    }
    sd = {
        "encoder.conv1.weight": np.zeros((64, 3, 7, 7), np.float32),
        "encoder.conv1.bias": np.zeros(64, np.float32),
        "head.dense.weight": np.zeros((128, 256), np.float32),
        "orphan.weight": np.zeros((5, 5), np.float32),
    }
    mapping = suggest_mapping(sd, params)
    assert mapping["encoder.conv1.weight"] == "encoder/conv1/kernel"
    assert mapping["encoder.conv1.bias"] == "encoder/conv1/bias"
    assert mapping["head.dense.weight"] == "head/dense/kernel"
    assert mapping["orphan.weight"] is None


def test_module_prefix_stripping(tmp_path):
    torch = pytest.importorskip("torch")
    from tpuflow.runtime.convert import load_torch_state_dict

    sd = {"module.conv.weight": torch.ones(2, 2), "module.conv.bias": torch.zeros(2)}
    path = str(tmp_path / "ckpt.pth")
    torch.save(sd, path)
    loaded = load_torch_state_dict(path)
    assert set(loaded) == {"conv.weight", "conv.bias"}


def test_real_checkpoint_conversion_smoke():
    """If real checkpoints are present (VideoFlow_ckpt/ / MemFlow_ckpt/ —
    the reference's naming contract, videoflow_core.py:79-85), run the
    introspection path over each so a mismatch surfaces as a readable
    report instead of a crash at load time (VERDICT r2 #8)."""
    import glob

    from tpuflow.runtime.convert import (
        describe_state_dict,
        load_torch_state_dict,
        suggest_mapping,
    )

    paths = sorted(
        glob.glob("VideoFlow_ckpt/*.pth") + glob.glob("MemFlow_ckpt/*.pth")
    )
    if not paths:
        pytest.skip("no real checkpoints under VideoFlow_ckpt/ or MemFlow_ckpt/")
    pytest.importorskip("torch")
    for path in paths:
        sd = load_torch_state_dict(path)
        assert sd, f"{path}: empty state dict"
        report = describe_state_dict(sd)
        assert "TOTAL" in report
        print(f"\n=== {path} ===\n{report}")
